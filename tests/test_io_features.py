"""gzip output/input, STDIN/STDOUT, trim_columns."""

import gzip
import pathlib
import subprocess
import sys

import pytest

REF = pathlib.Path("/root/reference/test")
REPO = pathlib.Path(__file__).resolve().parent.parent


def run_cli(args, tmp_path, stdin=None, capture=False):
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
           "JAX_PLATFORM_NAME": "cpu", "HOME": "/root"}
    return subprocess.run(
        [sys.executable, "-m", "famsa_tpu"] + [str(a) for a in args],
        check=True, cwd=tmp_path, env=env, input=stdin,
        capture_output=capture)


def test_gzip_output_roundtrip(tmp_path):
    out_gz = tmp_path / "out.fasta.gz"
    out = tmp_path / "out.fasta"
    run_cli(["-gz", REF / "dummy" / "many-seq", out_gz], tmp_path)
    run_cli([REF / "dummy" / "many-seq", out], tmp_path)
    assert gzip.decompress(out_gz.read_bytes()) == out.read_bytes()


def test_gzip_input(tmp_path):
    src = (REF / "dummy" / "many-seq").read_bytes()
    gz_in = tmp_path / "in.fasta.gz"
    gz_in.write_bytes(gzip.compress(src))
    out = tmp_path / "out.fasta"
    run_cli([gz_in, out], tmp_path)
    assert out.read_bytes() == (REF / "dummy" / "many-seq.aln").read_bytes()


def test_stdin_stdout(tmp_path):
    src = (REF / "dummy" / "many-seq").read_bytes()
    r = run_cli(["STDIN", "STDOUT"], tmp_path, stdin=src, capture=True)
    assert r.stdout == (REF / "dummy" / "many-seq.aln").read_bytes()


def test_trim_columns(tmp_path):
    out = tmp_path / "out.fasta"
    run_cli(["-trim_columns", "0.9", REF / "dummy" / "many-seq", out], tmp_path)
    # every column in many-seq.aln has 3/3 symbols except none; with 0.9
    # threshold nothing is removed
    assert out.read_bytes() == (REF / "dummy" / "many-seq.aln").read_bytes()
