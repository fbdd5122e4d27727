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
