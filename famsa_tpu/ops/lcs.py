"""Bit-parallel LCS lengths (Hyyro algorithm) - NumPy reference backend.

Semantics match the reference scalar kernel
(/root/reference/src/lcs/lcsbp_classic.h:49-221): per query symbol, the
update V2 = V + (V & M) + carry; X = V2 | (V - (V & M)) runs over 64-bit
words with a sequential carry chain; LCS = popcount(~X).  Query symbols
without a reference mask (codes >= 20, incl. UNKNOWN padding) are no-ops,
so padded tails need no masking.

Here the N queries ride the vector lanes (one row each); the TPU backend
(famsa_tpu/ops/lcs_pallas.py) uses the same layout with 32-bit words on
the VPU's 8x128 lanes.
"""

import numpy as np

from ..core.defs import BV_SIZE, NO_SYMBOLS, NO_VALID_AMINOACIDS

_HAS_BITCOUNT = hasattr(np, "bitwise_count")


def popcount_u64(x):
    if _HAS_BITCOUNT:
        return np.bitwise_count(x).astype(np.int64)
    v = x.view(np.uint8)
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return lut[v].reshape(*x.shape, 8).sum(axis=-1).astype(np.int64)


def build_bit_masks(data: np.ndarray, data_size: int) -> np.ndarray:
    """Per-symbol occupancy masks [NO_SYMBOLS, bv_len] uint64 for one
    reference sequence (data: int8 encoded, true-length slice)."""
    bv_len = (data_size + BV_SIZE - 1) // BV_SIZE
    masks = np.zeros((NO_SYMBOLS, bv_len), dtype=np.uint64)
    d = data
    valid = (d >= 0) & (d < NO_VALID_AMINOACIDS)
    idx = np.nonzero(valid)[0]
    if len(idx):
        words = idx // BV_SIZE
        bits = (np.uint64(1) << (idx % BV_SIZE).astype(np.uint64))
        np.bitwise_or.at(masks, (d[idx].astype(np.int64), words), bits)
    return masks


def lcs_ref_vs_queries(ref_masks: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """LCS length of the reference vs each query.

    ref_masks: [NO_SYMBOLS, bv_len] uint64
    queries:   [N, L] int8 (padding symbols >= NO_VALID_AMINOACIDS are no-ops)
    returns:   [N] int64
    """
    n, length = queries.shape
    bv_len = ref_masks.shape[1]
    X = np.full((n, bv_len), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    q = queries.astype(np.int64)
    one = np.uint64(1)
    for t in range(length):
        sb = ref_masks[q[:, t]]                    # [N, bv_len]
        carry = np.zeros(n, dtype=np.uint64)
        for w in range(bv_len):
            v = X[:, w]
            tb = v & sb[:, w]
            v2 = v + tb + carry
            carry = (v2 < v).astype(np.uint64) * one
            X[:, w] = v2 | (v - tb)
    return popcount_u64(~X).sum(axis=1)
