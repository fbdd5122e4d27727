"""gzip output/input, STDIN/STDOUT, trim_columns."""

import gzip
import pathlib
import subprocess
import sys

import numpy as np
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


def test_fasta_parser_edge_cases(tmp_path):
    """Multi-line sequences, CRLF line endings, blank lines, id-only
    records, and '>' characters inside ids - same records as the
    reference's line-by-line parser."""
    from famsa_tpu.core.io_service import load_fasta_records

    raw = (b">s1 desc with > char\r\n"
           b"ACDE\r\n"
           b"FGHI\r\n"
           b"\r\n"
           b">empty-record\r\n"
           b">s2\n"
           b"KLMN\n\n"
           b"PQRS\n")
    f = tmp_path / "in.fasta"
    f.write_bytes(raw)
    recs = load_fasta_records(str(f))
    assert recs == [(">s1 desc with > char", "ACDEFGHI"), (">s2", "KLMNPQRS")]


def test_fasta_parser_matches_large_wrap(tmp_path):
    """Wrapped 60-char output re-parses to the identical sequences."""
    from famsa_tpu.core.io_service import load_fasta_records, save_alignment
    from famsa_tpu.core.sequence import encode_gapped

    rng = np.random.default_rng(3)
    aa = "ARNDCQEGHILKMFPSTWYV"
    gs = []
    for k in range(5):
        s = "".join(aa[rng.integers(0, 20)] if rng.random() > 0.2 else "-"
                    for _ in range(137))
        gs.append(encode_gapped(f">w{k}", s, k))
    f = tmp_path / "o.fasta"
    save_alignment(str(f), gs)
    recs = load_fasta_records(str(f))
    assert [r[0] for r in recs] == [g.id for g in gs]
    assert [r[1] for r in recs] == [g.decode() for g in gs]


def test_fasta_streaming_chunk_invariance(tmp_path, monkeypatch):
    """The streaming reader (iter_fasta_records) must parse identically
    for ANY chunk granularity, incl. boundaries inside ids/records, and
    for multi-member gzip input (reference streams via
    stream_decompression, io_service.h:84-127)."""
    import gzip as _gz

    from famsa_tpu.core import io_service

    rng = np.random.default_rng(7)
    aa = "ARNDCQEGHILKMFPSTWYV"
    raw = bytearray(b"junk before first record\n")
    want = []
    for k in range(37):
        ln = int(rng.integers(1, 200))
        seq = "".join(aa[rng.integers(0, 20)] for _ in range(ln))
        raw += f">rec{k} desc\n".encode()
        for i in range(0, ln, 17):
            raw += seq[i:i + 17].encode() + b"\n"
        want.append((f">rec{k} desc", seq))
    f = tmp_path / "in.fasta"
    f.write_bytes(bytes(raw))

    base = io_service.load_fasta_records(str(f))
    assert base == want
    for chunk in (1, 3, 64, 1000):
        monkeypatch.setattr(io_service, "READ_CHUNK", chunk)
        assert list(io_service.iter_fasta_records(str(f))) == want
    monkeypatch.undo()

    # multi-member gzip (like the writer's per-pack members)
    gz = tmp_path / "in.fasta.gz"
    half = len(raw) // 2
    gz.write_bytes(_gz.compress(bytes(raw[:half]))
                   + _gz.compress(bytes(raw[half:])))
    assert io_service.load_fasta_records(str(gz)) == want
    monkeypatch.setattr(io_service, "READ_CHUNK", 11)
    assert list(io_service.iter_fasta_records(str(gz))) == want


def test_cli_error_handling(tmp_path, capsys):
    """Reference famsa.cpp:160-163: runtime errors print one
    "[ERROR] ..." line and exit -1 - never a traceback."""
    from famsa_tpu.cli import main as cli_main
    rc = cli_main([str(tmp_path / "no_such_input.fasta"),
                   str(tmp_path / "out.fasta")])
    assert rc == -1
    err = capsys.readouterr().err
    assert "[ERROR]" in err
    assert "Traceback" not in err
