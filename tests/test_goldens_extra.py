"""Extra golden tests beyond the reference repo's committed set.

Fixtures in goldens_extra/ were generated with a local build of the
reference FAMSA 2.5.0 binary (see BASELINE.md) to cover paths the bundled
test data misses: PartTree heuristic, upgma_modified, internal refinement
(-ri), alternative scoring matrices and the indel_div_lcs measure."""

import filecmp
import pathlib

import pytest

from test_goldens import REF, run_cli

G = pathlib.Path(__file__).resolve().parent / "goldens_extra"
ADENO = REF / "adeno_fiber" / "adeno_fiber"
HEMO = REF / "hemopexin" / "hemopexin"


@pytest.mark.parametrize("args,golden", [
    (["-gt", "upgma_modified", "-gt_export", ADENO], "upgma_mod.dnd"),
    (["-dist", "indel_div_lcs", "-gt_export", ADENO], "indel_div.dnd"),
    (["-refine_mode", "on", REF / "dummy" / "many-seq"], "dummy-ref-on.fasta"),
])
def test_extra_fast(tmp_path, args, golden):
    out = tmp_path / "out"
    run_cli(args + [out], tmp_path)
    assert filecmp.cmp(out, G / golden, shallow=False)


@pytest.mark.slow
@pytest.mark.parametrize("args,golden", [
    (["-gt", "upgma_modified", ADENO], "upgma_mod.fasta"),
    (["-sm", "MIQS", ADENO], "miqs.fasta"),
    (["-sm", "PFASUM60", "-gt", "upgma", ADENO], "pfasum60.fasta"),
    (["-r", "20", "-rt", "500", ADENO], "r20.fasta"),
    (["-ri", "50", ADENO], "ri50.fasta"),
    (["-parttree", "-gt", "sl", "-gt_export", HEMO], "parttree-sl.dnd"),
    (["-parttree", "-gt", "upgma", "-gt_export", HEMO], "parttree-upgma.dnd"),
])
def test_extra_slow(tmp_path, args, golden):
    out = tmp_path / "out"
    run_cli(args + [out], tmp_path)
    assert filecmp.cmp(out, G / golden, shallow=False)
