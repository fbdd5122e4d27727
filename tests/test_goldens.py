"""Golden-file equivalence tests against the reference FAMSA outputs.

Mirrors the reference CI strategy (SURVEY.md section 4): outputs must be
byte-identical.  Fast cases run by default; the full matrix (complete
alignments, hemopexin medoid trees) is marked slow."""

import filecmp
import pathlib
import subprocess
import sys

import pytest

REF = pathlib.Path("/root/reference/test")
REPO = pathlib.Path(__file__).resolve().parent.parent


def run_cli(args, tmp_path):
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
           "JAX_PLATFORM_NAME": "cpu", "HOME": "/root"}
    subprocess.run([sys.executable, "-m", "famsa_tpu"] + [str(a) for a in args],
                   check=True, cwd=tmp_path, env=env)


@pytest.mark.parametrize("name", ["one-seq", "two-seq", "many-seq"])
def test_dummy(tmp_path, name):
    out = tmp_path / "out.fasta"
    run_cli([REF / "dummy" / name, out], tmp_path)
    assert filecmp.cmp(out, REF / "dummy" / f"{name}.aln", shallow=False)


@pytest.mark.parametrize("name", ["two-seq", "many-seq"])
def test_dummy_keep_duplicates(tmp_path, name):
    out = tmp_path / "out.fasta"
    run_cli(["-keep-duplicates", REF / "dummy" / name, out], tmp_path)
    assert filecmp.cmp(out, REF / "dummy" / f"{name}.aln", shallow=False)


@pytest.mark.parametrize("tree", ["sl", "upgma", "slink"])
def test_adeno_tree_export(tmp_path, tree):
    out = tmp_path / "out.dnd"
    run_cli(["-gt", tree, "-gt_export", REF / "adeno_fiber" / "adeno_fiber", out],
            tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber" / f"{tree}.dnd", shallow=False)


def test_adeno_no_refine_from_tree(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli(["-gt", "import", REF / "adeno_fiber" / "upgma.dnd",
             "-refine_mode", "off", REF / "adeno_fiber" / "adeno_fiber", out],
            tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber" / "upgma.no_refine.fasta",
                       shallow=False)


def test_profile_profile(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli(["-refine_mode", "off",
             REF / "adeno_fiber" / "upgma.no_refine.part1.fasta",
             REF / "adeno_fiber" / "upgma.no_refine.part2.fasta", out], tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber" / "upgma.pp.fasta", shallow=False)


@pytest.mark.parametrize("flags,golden", [
    ([], "dist.csv"),
    (["-square_matrix"], "dist_sq.csv"),
    (["-pid"], "pid.csv"),
    (["-square_matrix", "-pid"], "pid_sq.csv"),
])
def test_distance_export(tmp_path, flags, golden):
    out = tmp_path / "out.csv"
    run_cli(["-dist_export"] + flags + [REF / "adeno_fiber" / "adeno_fiber", out],
            tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber" / golden, shallow=False)


@pytest.mark.slow
@pytest.mark.parametrize("tree", ["sl", "upgma"])
def test_adeno_full_alignment(tmp_path, tree):
    out = tmp_path / "out.fasta"
    run_cli(["-gt", tree, REF / "adeno_fiber" / "adeno_fiber", out], tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber" / f"{tree}.fasta", shallow=False)


@pytest.mark.slow
def test_adeno_gaps(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli(["-go", "10", "-ge", "2", "-tgo", "0.5", "-tge", "1.0",
             "-gsd", "3", "-gsl", "30", REF / "adeno_fiber" / "adeno_fiber", out],
            tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber" / "gaps.fasta", shallow=False)


@pytest.mark.slow
@pytest.mark.parametrize("tree", ["sl", "upgma", "nj"])
def test_hemopexin_medoid_tree(tmp_path, tree):
    out = tmp_path / "out.dnd"
    run_cli(["-medoidtree", "-gt", tree, "-gt_export",
             REF / "hemopexin" / "hemopexin", out], tmp_path)
    assert filecmp.cmp(out, REF / "hemopexin" / f"medoid-{tree}.dnd", shallow=False)


def test_dummy_one_seq_keep_duplicates(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli(["-keep-duplicates", REF / "dummy" / "one-seq", out], tmp_path)
    assert filecmp.cmp(out, REF / "dummy" / "one-seq.aln", shallow=False)


# ---------------------------------------------------------------------------
# adeno_fiber_duplicates (reference CI full-tree-duplicates,
# self-hosted.yml:198-231): 726 sequences with duplicates
# ---------------------------------------------------------------------------
def test_adeno_duplicates_tree(tmp_path):
    out = tmp_path / "out.dnd"
    run_cli(["-gt", "sl", "-gt_export",
             REF / "adeno_fiber_duplicates" / "adeno_fiber_duplicates", out],
            tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber_duplicates" / "sl.dnd",
                       shallow=False)


@pytest.mark.slow
def test_adeno_duplicates_alignment(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli(["-gt", "sl",
             REF / "adeno_fiber_duplicates" / "adeno_fiber_duplicates", out],
            tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber_duplicates" / "sl.fasta",
                       shallow=False)


@pytest.mark.slow
def test_adeno_duplicates_alignment_from_tree(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli(["-gt", "import", REF / "adeno_fiber_duplicates" / "sl.dnd",
             REF / "adeno_fiber_duplicates" / "adeno_fiber_duplicates", out],
            tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber_duplicates" / "sl.fasta",
                       shallow=False)


# ---------------------------------------------------------------------------
# non-standard residues (self-hosted.yml:395-398)
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_adeno_extra_symbols_alignment(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli([REF / "adeno_fiber_extra" / "adeno_fiber_extra", out], tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber_extra" / "ref.fasta",
                       shallow=False)


# ---------------------------------------------------------------------------
# re-align an existing alignment (gap stripping, self-hosted.yml:390-393)
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_adeno_align_the_alignment(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli([REF / "adeno_fiber" / "upgma.fasta", out], tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber" / "sl.fasta", shallow=False)


# ---------------------------------------------------------------------------
# hemopexin medoid trees: slink variant, non-default medoid params, and the
# complete alignments (main.yml:97-139, self-hosted.yml:236-277)
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_hemopexin_medoid_slink_tree(tmp_path):
    out = tmp_path / "out.dnd"
    run_cli(["-medoidtree", "-gt", "slink", "-gt_export",
             REF / "hemopexin" / "hemopexin", out], tmp_path)
    assert filecmp.cmp(out, REF / "hemopexin" / "medoid-slink.dnd",
                       shallow=False)


@pytest.mark.slow
@pytest.mark.parametrize("tree", ["sl", "slink", "upgma", "nj"])
def test_hemopexin_medoid_tree_params(tmp_path, tree):
    out = tmp_path / "out.dnd"
    run_cli(["-medoidtree", "-gt", tree, "-gt_export",
             "-subtree_size", "10", "-sample_size", "100",
             "-medoid_threshold", "100", "-cluster_fraction", "0.2",
             "-cluster_iters", "1",
             REF / "hemopexin" / "hemopexin", out], tmp_path)
    assert filecmp.cmp(out, REF / "hemopexin" / f"medoid-{tree}-params.dnd",
                       shallow=False)


@pytest.mark.slow
@pytest.mark.parametrize("tree", ["sl", "upgma", "nj"])
def test_hemopexin_medoid_alignment(tmp_path, tree):
    out = tmp_path / "out.fasta"
    run_cli(["-medoidtree", "-gt", tree,
             REF / "hemopexin" / "hemopexin", out], tmp_path)
    assert filecmp.cmp(out, REF / "hemopexin" / f"medoid-{tree}.fasta",
                       shallow=False)


# ---------------------------------------------------------------------------
# hemopexin_duplicates (self-hosted.yml:280-329): 8376 sequences,
# medoid-sl with and without duplicate removal
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_hemopexin_duplicates_tree(tmp_path):
    out = tmp_path / "out.dnd"
    run_cli(["-medoidtree", "-gt", "sl", "-gt_export",
             REF / "hemopexin_duplicates" / "hemopexin_duplicates", out],
            tmp_path)
    assert filecmp.cmp(out, REF / "hemopexin_duplicates" / "medoid-sl.dnd",
                       shallow=False)


@pytest.mark.slow
def test_hemopexin_duplicates_alignment(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli(["-medoidtree", "-gt", "sl",
             REF / "hemopexin_duplicates" / "hemopexin_duplicates", out],
            tmp_path)
    assert filecmp.cmp(out, REF / "hemopexin_duplicates" / "medoid-sl.fasta",
                       shallow=False)


@pytest.mark.slow
def test_hemopexin_duplicates_kept_tree(tmp_path):
    out = tmp_path / "out.dnd"
    run_cli(["-keep-duplicates", "-medoidtree", "-gt", "sl", "-gt_export",
             REF / "hemopexin_duplicates" / "hemopexin_duplicates", out],
            tmp_path)
    assert filecmp.cmp(out,
                       REF / "hemopexin_duplicates" / "medoid-sl-dups.dnd",
                       shallow=False)


@pytest.mark.slow
def test_hemopexin_duplicates_kept_alignment(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli(["-keep-duplicates", "-medoidtree", "-gt", "sl",
             REF / "hemopexin_duplicates" / "hemopexin_duplicates", out],
            tmp_path)
    assert filecmp.cmp(out,
                       REF / "hemopexin_duplicates" / "medoid-sl-dups.fasta",
                       shallow=False)
