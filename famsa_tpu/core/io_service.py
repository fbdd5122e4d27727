"""FASTA I/O (port of /root/reference/src/core/io_service.{h,cpp}).

Reads plain or gzipped FASTA (STDIN supported); writes the alignment with
60-char wrapping, optional gzip and rare-column trimming (-trim_columns),
byte-identical to the reference for uncompressed output.

Scale design (the reference streams packs through worker threads +
an ordered merge, io_service.cpp:122-254): parsing is vectorized -
one C-level split on record boundaries and a bytes.translate per record
instead of a Python loop over lines; the writer wraps lines with one
NumPy scatter per sequence and streams ~8 MB chunks to the output
(constant memory; gzip via a streaming GzipFile), so multi-million-
sequence alignments never materialize twice in RAM.
"""

import gzip
import sys

import numpy as np

_WS_DELETE = b"\r\n\t "


def _open_input(file_name):
    if file_name == "STDIN":
        data = sys.stdin.buffer.read()
    else:
        with open(file_name, "rb") as f:
            data = f.read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return data


def load_fasta_records(file_name):
    """Returns [(id_line, sequence_string)] like the reference parser
    (io_service.h:84-127): id includes the leading '>'; sequence lines
    are concatenated with all whitespace removed."""
    data = _open_input(file_name)
    start = data.find(b">")
    if start < 0:
        return []
    chunks = data[start + 1:].split(b"\n>")
    records = []
    for chunk in chunks:
        nl = chunk.find(b"\n")
        if nl < 0:
            continue
        rid = b">" + chunk[:nl].rstrip(b"\r")
        seq = chunk[nl + 1:].translate(None, _WS_DELETE)
        if seq:
            records.append((rid.decode("utf-8", errors="replace"),
                            seq.decode("utf-8", errors="replace")))
    return records


def _wrap60(arr):
    """[n] uint8 sequence chars -> wrapped bytes with '\\n' after every
    60-char line (incl. the final partial line), one vectorized scatter."""
    n = arr.shape[0]
    if n == 0:
        return b""
    n_lines = -(-n // 60)
    out = np.full(n + n_lines, ord("\n"), dtype=np.uint8)
    idx = np.arange(n)
    out[idx + idx // 60] = arr
    return out.tobytes()


def save_alignment(file_name, gapped_sequences, gzip_level=-1,
                   rare_column_threshold=1.0):
    """Write alignment FASTA (io_service.cpp:28-254), streaming."""
    accepted = None
    if rare_column_threshold < 1.0 and gapped_sequences:
        width = gapped_sequences[0].gapped_size
        freq = np.zeros(width, dtype=np.int64)
        for gs in gapped_sequences:
            freq[gs.symbol_positions() - 1] += 1
        no_seqs = len(gapped_sequences)
        min_no_symbols = int(no_seqs * rare_column_threshold)
        accepted = freq >= min_no_symbols

    if file_name == "STDOUT":
        raw = sys.stdout.buffer
        close_raw = False
    else:
        raw = open(file_name, "wb")
        close_raw = True
    if gzip_level >= 0:
        if gzip_level > 9:
            # the reference's libdeflate supports levels 10-12
            # (io_service.cpp:131); zlib tops out at 9 - the output is
            # still valid gzip, just a slightly larger stream
            sys.stderr.write(
                f"Warning: -gz_lev {gzip_level} not available "
                "(zlib maximum is 9); compressing at level 9.\n")
        out = gzip.GzipFile(fileobj=raw, mode="wb",
                            compresslevel=min(gzip_level, 9), mtime=0)
    else:
        out = raw

    try:
        buf = []
        buf_bytes = 0
        for gs in gapped_sequences:
            arr = np.frombuffer(gs.decode().encode(), dtype=np.uint8)
            if accepted is not None:
                arr = arr[accepted]
            rec = gs.id.encode() + b"\n" + _wrap60(arr)
            buf.append(rec)
            buf_bytes += len(rec)
            if buf_bytes >= 8 << 20:
                out.write(b"".join(buf))
                buf = []
                buf_bytes = 0
        if buf:
            out.write(b"".join(buf))
    finally:
        if gzip_level >= 0:
            out.close()
        if close_raw:
            raw.close()
        else:
            raw.flush()
    return True
