"""JAX/TPU batched bit-parallel LCS.

TPU-native layout: 32-bit words (TPU integer ALUs are 32-bit native), the
N query sequences ride the vector lanes, and the word-axis carry chain of
the Hyyro update runs as a short unrolled loop.  One device launch computes
a full (ref x N-queries) LCS batch; results are bit-identical to the scalar
reference kernel (famsa_tpu/ops/lcs.py) because the update is exact integer
arithmetic at any word size.

Symmetric-LCS layout flip: instead of building the REFERENCE's per-symbol
masks and streaming every query's symbols (which needs an [N]-vector gather
from the mask table at every position - pathologically slow on TPU), we
build the per-symbol masks of ALL QUERIES once as a [32, N, W] table and
stream the reference's symbols: each position then needs only table[sym],
a scalar-indexed slice.  LCS is symmetric, and symbols >= 20 are no-ops on
either side (zero mask rows / zero mask bits), so results are unchanged.

Reference semantics: /root/reference/src/lcs/lcsbp_classic.h:49-221.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.defs import NO_SYMBOLS, NO_VALID_AMINOACIDS

BV32 = 32


def build_bit_masks32(data: np.ndarray, data_size: int) -> np.ndarray:
    """[NO_SYMBOLS, bv_len] uint32 occupancy masks (host-side, O(L))."""
    bv_len = (data_size + BV32 - 1) // BV32
    masks = np.zeros((NO_SYMBOLS, bv_len), dtype=np.uint32)
    valid = (data >= 0) & (data < NO_VALID_AMINOACIDS)
    idx = np.nonzero(valid)[0]
    if len(idx):
        words = idx // BV32
        bits = (np.uint32(1) << (idx % BV32).astype(np.uint32))
        np.bitwise_or.at(masks, (data[idx].astype(np.int64), words), bits)
    return masks


def build_query_mask_table(padded: np.ndarray) -> np.ndarray:
    """[NO_SYMBOLS, N, W] uint32 per-symbol occupancy masks of all rows of
    `padded` ([N, L] int8, pad symbol >= 20); rows >= 20 stay zero."""
    n, lmax = padded.shape
    w = (lmax + BV32 - 1) // BV32
    table = np.zeros((NO_SYMBOLS, n, w), dtype=np.uint32)
    sym = padded.astype(np.int64)
    t = np.arange(lmax)
    words = t // BV32
    bits = (np.uint32(1) << (t % BV32).astype(np.uint32))
    rows, cols = np.nonzero((sym >= 0) & (sym < NO_VALID_AMINOACIDS))
    np.bitwise_or.at(table, (sym[rows, cols], rows, words[cols]), bits[cols])
    return table


def hyyro_step(x, sb, n, w):
    """One position of the bit-parallel LCS update across N lanes."""
    carry = jnp.zeros((n,), jnp.uint32)
    cols = []
    for k in range(w):
        v = x[:, k]
        tb = v & sb[:, k]
        v2 = v + tb + carry
        carry = (v2 < v).astype(jnp.uint32)
        cols.append(v2 | (v - tb))
    return jnp.stack(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("unroll",))
def lcs_kernel(table, ref_syms, unroll=1):
    """table: [NO_SYMBOLS, N, W] uint32 query masks; ref_syms: [L] int32.

    Returns [N] int32 LCS lengths of the streamed reference sequence vs
    every query.  Pad/invalid symbols (>= 20) index zero mask rows and are
    no-ops by construction."""
    _, n, w = table.shape

    x0 = jnp.full((n, w), jnp.uint32(0xFFFFFFFF))

    def pos_step(x, sym):
        sb = table[sym]                         # [N, W] scalar-indexed slice
        return hyyro_step(x, sb, n, w), None

    x_final, _ = jax.lax.scan(pos_step, x0, ref_syms, unroll=unroll)
    return jax.lax.population_count(~x_final).astype(jnp.int32).sum(axis=1)


class JaxDistanceBackend:
    """Drop-in replacement for ops.distance.DistanceBackend: LCS batches on
    device, distance transforms on host (float64/float32 exactness)."""

    def __init__(self, sequences, measure, dtype):
        from .distance import transform_distances
        self._transform = transform_distances
        self.sequences = sequences
        self.measure = measure
        self.dtype = dtype
        n = len(sequences)
        self.n = n
        if n:
            lmax = max(s.data_size for s in sequences)
            padded = np.full((n, lmax), 22, dtype=np.int8)
            for k, s in enumerate(sequences):
                padded[k, :len(s.data)] = s.data
            self.table_dev = jnp.asarray(build_query_mask_table(padded))
            self.queries_dev = jnp.asarray(padded.astype(np.int32))
            self.lengths = np.array([s.length for s in sequences], dtype=np.int64)

    def _lcs_all(self, ref_idx):
        out = lcs_kernel(self.table_dev, self.queries_dev[ref_idx])
        return np.asarray(out).astype(np.int64)

    def row(self, ref_idx, query_ids=None):
        lcs = self._lcs_all(ref_idx)
        ref_len = int(self.sequences[ref_idx].length)
        if query_ids is None:
            return self._transform(self.measure, lcs, ref_len, self.lengths, self.dtype)
        return self._transform(self.measure, lcs[query_ids], ref_len,
                               self.lengths[query_ids], self.dtype)

    def row_prefix(self, ref_idx, count):
        if count == 0:
            return np.zeros(0, dtype=self.dtype)
        return self.row(ref_idx, np.arange(count))

    def rows_batch(self, ref_ids, query_ids=None):
        return np.stack([self.row(int(r), query_ids) for r in ref_ids])
