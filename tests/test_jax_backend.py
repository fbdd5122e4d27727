"""End-to-end coverage of the -backend jax production paths on CPU.

The golden suite runs the host backend; these tests drive the SAME CLI
flows through the jax backend (on the 8-device CPU mesh the conftest sets
up, so the sharded distance/Prim paths are exercised) and through the
pallas interpret-mode dispatch pipeline (the production TPU scheduler:
CSC/dense upload choice, single-word auto-detect, async resolve,
ready-queue ordering).  Outputs must equal the reference goldens / the
host backend byte-for-byte."""

import filecmp
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/test")
REPO = pathlib.Path(__file__).resolve().parent.parent


def run_cli_jax(args, tmp_path, devices=8):
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
           "JAX_PLATFORM_NAME": "cpu", "JAX_PLATFORMS": "cpu",
           "HOME": "/root", "FAMSA_TPU_JAX_CACHE": "0",
           "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices}"}
    subprocess.run([sys.executable, "-m", "famsa_tpu", "-backend", "jax"]
                   + [str(a) for a in args],
                   check=True, cwd=tmp_path, env=env)


@pytest.mark.parametrize("tree", ["sl", "upgma"])
def test_jax_tree_export_golden(tmp_path, tree):
    out = tmp_path / "out.dnd"
    run_cli_jax(["-gt", tree, "-gt_export",
                 REF / "adeno_fiber" / "adeno_fiber", out], tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber" / f"{tree}.dnd",
                       shallow=False)


def test_jax_dist_export_golden(tmp_path):
    out = tmp_path / "out.csv"
    run_cli_jax(["-dist_export", REF / "adeno_fiber" / "adeno_fiber", out],
                tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber" / "dist.csv", shallow=False)


def test_jax_dummy_alignments_golden(tmp_path):
    for name in ("two-seq", "many-seq"):
        out = tmp_path / f"{name}.fasta"
        run_cli_jax([REF / "dummy" / name, out], tmp_path)
        assert filecmp.cmp(out, REF / "dummy" / f"{name}.aln", shallow=False)


@pytest.mark.slow
def test_jax_full_alignment_golden(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli_jax([REF / "adeno_fiber" / "adeno_fiber", out], tmp_path)
    assert filecmp.cmp(out, REF / "adeno_fiber" / "sl.fasta", shallow=False)


@pytest.mark.slow
def test_pipeline_pallas_interpret(monkeypatch):
    """The production pallas dispatch pipeline (level scheduler ->
    dp_profile_pallas_paths_async: stage0 on device, CSC/dense upload
    choice, single-word auto-detect, async resolve, ready-queue release)
    through the interpreter on CPU, vs the host backend."""
    import famsa_tpu.core.aligner as aligner
    import famsa_tpu.ops.dp_pallas as dpp
    from famsa_tpu.core.params import Params
    from famsa_tpu.core.sequence import Sequence
    from famsa_tpu.ops.dp_jax import _bucket
    from famsa_tpu.pipeline import compute_msa

    monkeypatch.setenv("FAMSA_TPU_DP_PALLAS", "interpret")
    monkeypatch.setenv("FAMSA_TPU_SHARD", "0")
    monkeypatch.setattr(aligner, "_JAX_MIN_CELLS", 500)
    monkeypatch.setattr(dpp, "_pallas_bucket",
                        lambda w: 32 if w <= 32 else _bucket(w))

    aa = "ARNDCQEGHILKMFPSTWYV"

    def make_seqs():
        rng = np.random.default_rng(33)
        return [Sequence(f">s{k}",
                         "".join(aa[rng.integers(0, 20)]
                                 for _ in range(int(rng.integers(25, 45)))),
                         k)
                for k in range(12)]

    def run(backend):
        params = Params()
        params.backend = backend
        res = compute_msa(params, make_seqs())
        return [gs.decode() for gs in res.alignment]

    assert run("jax") == run("numpy")
