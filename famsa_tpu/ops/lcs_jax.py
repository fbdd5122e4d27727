"""JAX/TPU batched bit-parallel LCS.

TPU-native layout: 32-bit words (TPU integer ALUs are 32-bit native), the
N query sequences ride the vector lanes, and the word-axis carry chain of
the Hyyro update runs as a short lax.scan.  One device launch computes a
full (ref x N-queries) LCS batch; results are bit-identical to the scalar
reference kernel (famsa_tpu/ops/lcs.py) because the update is exact integer
arithmetic at any word size.

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


@functools.partial(jax.jit, static_argnames=("unroll",))
def lcs_kernel(masks, queries, unroll=1):
    """masks: [NO_SYMBOLS, W] uint32; queries: [N, L] int32.

    Returns [N] int32 LCS lengths.  Symbols without reference masks
    (codes >= 20, incl. UNKNOWN padding) are no-ops by construction.

    The word-axis carry ripple is a static Python loop (bv_len is small and
    known at trace time); the position axis is a lax.scan."""
    n, length = queries.shape
    w = masks.shape[1]

    x0 = jnp.full((n, w), jnp.uint32(0xFFFFFFFF))

    def pos_step(x, syms):
        sb = masks[syms]                        # [N, W] gather
        carry = jnp.zeros((n,), jnp.uint32)
        cols = []
        for k in range(w):
            v = x[:, k]
            tb = v & sb[:, k]
            v2 = v + tb + carry
            carry = (v2 < v).astype(jnp.uint32)
            cols.append(v2 | (v - tb))
        return jnp.stack(cols, axis=1), None

    x_final, _ = jax.lax.scan(pos_step, x0, queries.T, unroll=unroll)
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
            self.queries_dev = jnp.asarray(padded.astype(np.int32))
            self.lengths = np.array([s.length for s in sequences], dtype=np.int64)

    def _lcs_all(self, ref_idx):
        ref = self.sequences[ref_idx]
        masks = build_bit_masks32(ref.data, ref.data_size)
        out = lcs_kernel(jnp.asarray(masks), self.queries_dev)
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
