"""FASTA I/O (port of /root/reference/src/core/io_service.{h,cpp}).

Reads plain or gzipped FASTA (STDIN supported); writes the alignment with
60-char wrapping, optional gzip and rare-column trimming (-trim_columns),
byte-identical to the reference for uncompressed output.
"""

import gzip
import io
import sys

import numpy as np


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
    """Yields (id_line, sequence_string) like the reference parser
    (io_service.h:84-127): id includes the leading '>'."""
    data = _open_input(file_name)
    text = data.decode("utf-8", errors="replace")
    records = []
    cur_id = None
    seq_parts = []
    for line in text.split("\n"):
        line = line.rstrip("\r\n")
        if not line:
            continue
        if line[0] == '>':
            if cur_id is not None and seq_parts:
                records.append((cur_id, "".join(seq_parts)))
                seq_parts = []
            cur_id = line
        else:
            seq_parts.append(line)
    if cur_id is not None and seq_parts:
        records.append((cur_id, "".join(seq_parts)))
    return records


def save_alignment(file_name, gapped_sequences, gzip_level=-1,
                   rare_column_threshold=1.0):
    """Write alignment FASTA (io_service.cpp:28-254)."""
    out = io.BytesIO()

    accepted = None
    if rare_column_threshold < 1.0 and gapped_sequences:
        width = gapped_sequences[0].gapped_size
        freq = np.zeros(width, dtype=np.int64)
        for gs in gapped_sequences:
            freq[gs.symbol_positions() - 1] += 1
        no_seqs = len(gapped_sequences)
        min_no_symbols = int(no_seqs * rare_column_threshold)
        accepted = freq >= min_no_symbols

    for gs in gapped_sequences:
        out.write(gs.id.encode())
        out.write(b"\n")
        seq = gs.decode()
        if accepted is not None:
            arr = np.frombuffer(seq.encode(), dtype=np.uint8)[accepted]
            seq = arr.tobytes().decode()
        for pos in range(0, len(seq), 60):
            out.write(seq[pos:pos + 60].encode())
            out.write(b"\n")

    payload = out.getvalue()
    if gzip_level >= 0:
        if gzip_level > 9:
            # the reference's libdeflate supports levels 10-12
            # (io_service.cpp:131); zlib tops out at 9 - the output is
            # still valid gzip, just a slightly larger stream
            sys.stderr.write(
                f"Warning: -gz_lev {gzip_level} not available "
                "(zlib maximum is 9); compressing at level 9.\n")
        payload = gzip.compress(payload, compresslevel=min(gzip_level, 9))

    if file_name == "STDOUT":
        sys.stdout.buffer.write(payload)
        sys.stdout.buffer.flush()
    else:
        with open(file_name, "wb") as f:
            f.write(payload)
    return True
