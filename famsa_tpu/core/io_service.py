"""FASTA I/O (port of /root/reference/src/core/io_service.{h,cpp}).

Reads plain or gzipped FASTA (STDIN supported); writes the alignment with
60-char wrapping, optional gzip and rare-column trimming (-trim_columns),
byte-identical to the reference for uncompressed output.

Scale design (the reference streams packs through worker threads +
an ordered merge, io_service.cpp:122-254): parsing is vectorized -
one C-level split on record boundaries and a bytes.translate per record
instead of a Python loop over lines; the writer mirrors the reference's
parallel output pipeline - sequences are decoded (and, under -gz,
compressed as independent gzip members, like the reference's per-pack
libdeflate streams) in packs on a thread pool, with a bounded in-flight
window and an ordered merge to the output stream, so multi-million-
sequence alignments never materialize twice in RAM.  The NumPy
decode/wrap and zlib compression release the GIL, so packs genuinely
overlap.
"""

import collections
import concurrent.futures
import gzip
import os
import sys

import numpy as np

WRITER_PACK = 256          # sequences per worker task (reference: 100)

_WS_DELETE = b"\r\n\t "


READ_CHUNK = 1 << 24       # streaming input granularity (16 MB)


class _PrefixReader:
    """Read-only stream replaying a sniffed prefix before the real file."""

    def __init__(self, prefix, f):
        self._prefix = prefix
        self._f = f

    def read(self, n=-1):
        if self._prefix:
            if n is None or n < 0:
                out = self._prefix + self._f.read(n)
                self._prefix = b""
                return out
            out = self._prefix[:n]
            self._prefix = self._prefix[len(out):]
            if len(out) < n:
                out += self._f.read(n - len(out))
            return out
        return self._f.read(n)


def _iter_input_chunks(file_name):
    """Yields raw chunks of the (transparently gunzipped) input without
    ever materializing the whole file - the reference streams via
    stream_decompression (io_service.h:84-127, file_wrapper.h:140-323);
    gzip.GzipFile handles multi-member streams the same way."""
    if file_name == "STDIN":
        f = sys.stdin.buffer
        close = False
    else:
        f = open(file_name, "rb")
        close = True
    try:
        head = f.read(2)
        src = _PrefixReader(head, f)
        if head == b"\x1f\x8b":
            src = gzip.GzipFile(fileobj=src)
        while True:
            chunk = src.read(READ_CHUNK)
            if not chunk:
                return
            yield chunk
    finally:
        if close:
            f.close()


def _parse_record(chunk):
    """One '>'-stripped record blob -> (id_line, sequence) or None."""
    nl = chunk.find(b"\n")
    if nl < 0:
        return None
    rid = b">" + chunk[:nl].rstrip(b"\r")
    seq = chunk[nl + 1:].translate(None, _WS_DELETE)
    if not seq:
        return None
    return (rid.decode("utf-8", errors="replace"),
            seq.decode("utf-8", errors="replace"))


def iter_fasta_records(file_name):
    """Streaming FASTA parser: yields (id_line, sequence_string) like the
    reference (io_service.h:84-127) - id includes the leading '>';
    sequence lines are concatenated with all whitespace removed.  Peak
    memory is one read chunk + one partial record, not 2x the file."""
    buf = b""
    started = False
    for chunk in _iter_input_chunks(file_name):
        buf += chunk
        if not started:
            start = buf.find(b">")
            if start < 0:
                buf = b""
                continue
            buf = buf[start + 1:]
            started = True
        parts = buf.split(b"\n>")
        buf = parts[-1]
        for blob in parts[:-1]:
            rec = _parse_record(blob)
            if rec is not None:
                yield rec
    if started and buf:
        rec = _parse_record(buf)
        if rec is not None:
            yield rec


def load_fasta_records(file_name):
    """[(id_line, sequence_string)]; see iter_fasta_records."""
    return list(iter_fasta_records(file_name))


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
    if gzip_level > 9:
        # the reference's libdeflate supports levels 10-12
        # (io_service.cpp:131); zlib tops out at 9 - the output is
        # still valid gzip, just a slightly larger stream
        sys.stderr.write(
            f"Warning: -gz_lev {gzip_level} not available "
            "(zlib maximum is 9); compressing at level 9.\n")
        gzip_level = 9

    def render_pack(lo):
        parts = []
        for gs in gapped_sequences[lo:lo + WRITER_PACK]:
            arr = np.frombuffer(gs.decode().encode(), dtype=np.uint8)
            if accepted is not None:
                arr = arr[accepted]
            parts.append(gs.id.encode() + b"\n" + _wrap60(arr))
        data = b"".join(parts)
        if gzip_level >= 0:
            # independent gzip member per pack, exactly like the
            # reference's per-pack libdeflate streams (io_service.cpp:131)
            data = gzip.compress(data, compresslevel=gzip_level, mtime=0)
        return data

    try:
        n_workers = min(8, os.cpu_count() or 1)
        starts = range(0, len(gapped_sequences), WRITER_PACK)
        if n_workers <= 1 or len(gapped_sequences) <= WRITER_PACK:
            for lo in starts:
                raw.write(render_pack(lo))
        else:
            # bounded in-flight window + ordered merge (the reference's
            # CLimitedPriorityQueue, io_service.cpp:122-254)
            with concurrent.futures.ThreadPoolExecutor(n_workers) as ex:
                window = collections.deque()
                for lo in starts:
                    window.append(ex.submit(render_pack, lo))
                    if len(window) >= 4 * n_workers:
                        raw.write(window.popleft().result())
                while window:
                    raw.write(window.popleft().result())
    finally:
        if close_raw:
            raw.close()
        else:
            raw.flush()
    return True
