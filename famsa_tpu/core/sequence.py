"""Sequence data model.

Ungapped sequences are padded i8 arrays; gapped sequences store run-length
gap counts next to a dense symbol array.  Mirrors the semantics of the
reference CSequence / CGappedSequence (/root/reference/src/core/sequence.{h,cpp})
but replaces the binary-indexed DPS tree with vectorized column-remapping:
alignment construction produces an old-column -> new-column map per profile
and every member sequence is rewritten with one cumsum + diff.
"""

import numpy as np

from .defs import (CHAR_TO_CODE, GAP, GUARD, MAPPING_TABLE, NO_VALID_AMINOACIDS,
                   UNKNOWN_SYMBOL, BV_SIZE, NO_SYMBOLS)


class Sequence:
    """Ungapped encoded sequence (reference CSequence, sequence.cpp:22-80)."""

    __slots__ = ("id", "length", "data", "data_size", "original_no",
                 "sequence_no", "uppercase", "extra_symbols")

    def __init__(self, id_, seq_str, sequence_no=-1):
        self.id = id_
        self.original_no = sequence_no
        self.sequence_no = sequence_no

        raw = seq_str.replace("-", "")
        self.length = len(raw)
        data = np.empty(self.length, dtype=np.int8)
        uppercase = np.empty(self.length, dtype=bool)
        extra = []
        for i, c in enumerate(raw):
            if c > 'Z':
                c = chr(ord(c) - 32)
                uppercase[i] = False
            else:
                uppercase[i] = True
            code = CHAR_TO_CODE.get(c)
            if code is None:
                extra.append((i, c))
                data[i] = UNKNOWN_SYMBOL
            else:
                data[i] = code
        self.data = data
        self.data_size = self.length
        self.uppercase = uppercase
        self.extra_symbols = extra

    def resize(self, new_size, fill=UNKNOWN_SYMBOL):
        """Pad data to new_size (reference DataResize, sequence.cpp:163-186)."""
        if new_size == self.data_size:
            return
        out = np.full(new_size, fill, dtype=np.int8)
        out[:min(self.data_size, new_size)] = self.data[:min(self.data_size, new_size)]
        self.data = out
        self.data_size = new_size

    def compute_bit_masks(self):
        """Per-symbol 64-bit occupancy masks for the bit-parallel LCS
        (reference ComputeBitMasks, sequence.cpp:190-201).

        Returns [NO_SYMBOLS, bv_len] uint64."""
        bv_len = (self.data_size + BV_SIZE - 1) // BV_SIZE
        masks = np.zeros((NO_SYMBOLS, bv_len), dtype=np.uint64)
        d = self.data[:self.length]
        valid = (d >= 0) & (d < NO_VALID_AMINOACIDS)
        idx = np.nonzero(valid)[0]
        words = idx // BV_SIZE
        bits = np.uint64(1) << (idx % BV_SIZE).astype(np.uint64)
        np.bitwise_or.at(masks, (d[idx].astype(np.int64), words), bits)
        return masks


def encode_gapped(id_, seq_str, sequence_no=-1):
    """Parse an aligned FASTA record into a GappedSequence
    (reference CGappedSequence string ctor, sequence.cpp:214-271)."""
    gapped_size = len(seq_str)
    n_symbols = sum(1 for c in seq_str if c != '-')
    symbols = np.empty(n_symbols, dtype=np.int8)
    n_gaps = np.zeros(n_symbols + 1, dtype=np.int64)
    uppercase = np.empty(n_symbols, dtype=bool)
    extra = []
    i_s = 0
    for c in seq_str:
        if c == '-':
            n_gaps[i_s] += 1
            continue
        if c > 'Z':
            c = chr(ord(c) - 32)
            uppercase[i_s] = False
        else:
            uppercase[i_s] = True
        code = CHAR_TO_CODE.get(c)
        if code is None:
            extra.append((i_s, c))
            symbols[i_s] = UNKNOWN_SYMBOL
        else:
            symbols[i_s] = code
        i_s += 1
    gs = GappedSequence(id_, symbols, n_gaps, uppercase, extra, sequence_no, sequence_no)
    assert gs.gapped_size == gapped_size
    return gs


class GappedSequence:
    """Gapped sequence: symbols[0..size-1] plus n_gaps[0..size] run lengths."""

    __slots__ = ("id", "symbols", "n_gaps", "uppercase", "extra_symbols",
                 "original_no", "sequence_no", "_cum")

    def __init__(self, id_, symbols, n_gaps, uppercase, extra_symbols,
                 original_no, sequence_no):
        self.id = id_
        self.symbols = symbols            # int8 [size]
        self.n_gaps = n_gaps              # int64 [size+1]
        self.uppercase = uppercase        # bool [size]
        self.extra_symbols = extra_symbols
        self.original_no = original_no
        self.sequence_no = sequence_no
        self._cum = None                  # cached cumsum(n_gaps+1), lazily built

    @classmethod
    def from_sequence(cls, seq: Sequence):
        """Move an ungapped Sequence into gapped form (no gaps).

        Mirrors CGappedSequence(CSequence&&): size becomes data_size (i.e.
        including UNKNOWN padding), sequence.cpp:274-294."""
        size = seq.data_size
        symbols = seq.data.copy()
        n_gaps = np.zeros(size + 1, dtype=np.int64)
        return cls(seq.id, symbols, n_gaps, seq.uppercase.copy(),
                   list(seq.extra_symbols), seq.original_no, seq.sequence_no)

    @property
    def size(self):
        return len(self.symbols)

    @property
    def gapped_size(self):
        return int(self.size + self.n_gaps.sum())

    def copy(self):
        return GappedSequence(self.id, self.symbols.copy(), self.n_gaps.copy(),
                              self.uppercase.copy(), list(self.extra_symbols),
                              self.original_no, self.sequence_no)

    # ------------------------------------------------------------------
    def symbol_positions(self):
        """1-based gapped positions of the symbols ([size] int64)."""
        return np.cumsum(self.n_gaps[:-1] + 1)

    def apply_column_inserts(self, idxs, deltas, trail):
        """Add all-gap-column runs: deltas[k] gap columns inserted just
        before OLD column idxs[k] (ascending), plus `trail` trailing gap
        columns.  Equivalent to remap_columns with the induced column map
        (new_gaps[j] = old_gaps[j] + sum of deltas landing in unit j) but
        costs O(R log size) instead of O(size) - and the construct caller
        skips sequences entirely when a side received no gap runs, which
        is the common case on chained guide trees (the reference applies
        only v_gaps_prof events the same way, profile.cpp:1052-1106)."""
        if self.size == 0:
            self.n_gaps[0] += int(deltas.sum()) + trail
            self._cum = None
            return
        if len(idxs):
            pos = self.symbol_positions()
            ks = np.searchsorted(pos, idxs, side="left")
            np.add.at(self.n_gaps, ks, deltas)
        if trail:
            self.n_gaps[self.size] += trail
        self._cum = None

    def remap_columns(self, colmap, new_width):
        """Rewrite gap runs given old-column -> new-column map.

        colmap: int64 array of length old_gapped_size+1 (index 0 unused);
        strictly increasing on symbol columns."""
        pos = self.symbol_positions()
        newpos = colmap[pos]
        n_gaps = np.empty(self.size + 1, dtype=np.int64)
        if self.size:
            n_gaps[0] = newpos[0] - 1
            n_gaps[1:-1] = np.diff(newpos) - 1
            n_gaps[-1] = new_width - newpos[-1]
        else:
            n_gaps[0] = new_width
        self.n_gaps = n_gaps
        self._cum = None

    def _cumline(self):
        """Cached inclusive cumsum of (n_gaps+1) - the DPS query line.
        Built once per burst of edits; point edits update the suffix in
        place (one vectorized add), so probes are O(log n) searchsorted
        instead of the reference's explicit BIT walk (sequence.cpp:480-704)
        and nothing is recomputed per call."""
        if self._cum is None:
            self._cum = np.cumsum(self.n_gaps + 1)
        return self._cum

    def _unit_of(self, pos):
        """Index x of the gap run 'unit' containing gapped position pos:
        smallest x with pos <= cum(x), cum(x) = sum_{i<=x}(n_gaps[i]+1).
        Matches the reference DPS walks (sequence.cpp:480-704)."""
        return int(np.searchsorted(self._cumline(), pos, side="left"))

    def _bump(self, pos, n):
        x = self._unit_of(pos)
        self.n_gaps[x] += n
        self._cum[x:] += n

    def insert_gap(self, pos):
        self._bump(pos, 1)

    def insert_gaps(self, pos, n):
        self._bump(pos, n)

    def remove_gap(self, pos):
        self._bump(pos, -1)

    def remove_gaps(self, pos, n):
        self._bump(pos, -n)

    def get_symbol(self, pos):
        x = self._unit_of(pos)
        if x < self.size and pos == int(self._cumline()[x]):
            return int(self.symbols[x])
        return GAP

    # ------------------------------------------------------------------
    def decode(self):
        """FASTA string with case and non-standard symbols restored
        (reference Decode, sequence.cpp:425-457)."""
        chars = np.frombuffer(MAPPING_TABLE.encode(), dtype=np.uint8)
        out_syms = chars[self.symbols.astype(np.int64)]
        for p, c in self.extra_symbols:
            out_syms = out_syms.copy() if out_syms.base is not None else out_syms
            out_syms[p] = ord(c)
        out_syms = np.where(self.uppercase, out_syms, out_syms + 32).astype(np.uint8)

        total = self.gapped_size
        buf = np.full(total, ord('-'), dtype=np.uint8)
        buf[self.symbol_positions() - 1] = out_syms
        return buf.tobytes().decode("ascii")
