"""Pallas/Mosaic bit-parallel LCS kernel: R reference rows x N queries
per device dispatch.

The XLA kernel (ops/lcs_jax.py) runs one lax.scan iteration per reference
position; on TPU each iteration costs ~1 us regardless of how little work
it does, capping the distance path far below the VPU's ALU rate.  This
kernel runs the ENTIRE position loop inside one Mosaic program:

 - queries ride both vector dims: a block is [8 sublanes, QL lanes]
   (QL a multiple of 128), so every update op runs on full (8, 128) vregs;
 - the per-symbol occupancy masks of ALL queries (the symmetric-LCS layout
   flip of ops/lcs_jax.py) sit in VMEM as [32*W, 8, QL] u32 words; each
   reference position needs only a scalar-indexed slab table[sym*W + w];
 - the W-word carry chain (reference semantics:
   /root/reference/src/lcs/lcsbp_classic.h:49-221, V2 = V + (V&M) + carry;
   X = V2 | (V - (V&M))) is a statically unrolled Python loop whose words
   live in vector registers across the whole fori_loop over positions;
 - grid = (query-block, ref): the minor (fastest) grid axis walks refs, so
   the big mask block stays VMEM-resident while only the 4*L-byte symbol
   row is re-fetched per step.

All arithmetic is int32 (Mosaic has no u32/s64 compares we need); unsigned
compares use the sign-bit-xor trick, wrap-around adds/subs are identical in
two's complement.  Bit-identical to ops/lcs.py (parity test
tests/test_lcs_pallas.py runs interpret mode on CPU).
"""

import functools

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.defs import NO_SYMBOLS
from .lcs_jax import BV32, build_query_mask_table

MIN32 = np.int32(-2147483648)

# VMEM budget for the resident query-mask block (bytes); the rest of VMEM
# holds the X words (registers/spill) and the tiny symbol/output blocks.
_TABLE_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_ql(w):
    """Lanes per query block: largest 128-multiple whose [32*W, 8, QL] u32
    mask block fits the VMEM budget.  Capped at 256 when two reference
    chains interleave (see _pick_nr): 2 chains x W words x 2 vregs stays
    inside the vector register file, and the independent chains hide the
    carry-chain latency the single-ref kernel stalls on."""
    ql = (_TABLE_VMEM_BUDGET // (NO_SYMBOLS * w * 8 * 4)) // 128 * 128
    cap = 256 if _pick_nr(w) == 2 else 512
    return int(max(128, min(cap, ql)))


def _pick_nr(w):
    """Interleaved reference chains per grid step.  Measured on v5e at
    len 300 / W=10: nr=2 @ ql=256 runs 104 ms per 256x4096 block vs
    89 ms for nr=1 @ ql=512 - the wider single-chain vregs already give
    the scheduler enough ILP, and halving ql doubles per-op overhead -
    so this stays 1 (the machinery is parity-tested and ready if a
    future geometry wins)."""
    return 1


def _popcount32(x):
    """SWAR popcount of an int32 word (logical shifts)."""
    def srl(v, k):
        return jax.lax.shift_right_logical(v, jnp.full(v.shape, k, v.dtype))
    x = x - (srl(x, 1) & jnp.int32(0x55555555))
    x = (x & jnp.int32(0x33333333)) + (srl(x, 2) & jnp.int32(0x33333333))
    x = (x + srl(x, 4)) & jnp.int32(0x0F0F0F0F)
    return srl(x * jnp.int32(0x01010101), 24)


# positions per fori_loop iteration: the loop-management overhead of one
# Mosaic fori iteration (~us) dwarfs the handful of vector ops per position,
# so the position loop is unrolled U-wide (symbols are padded with the no-op
# code 22 to a multiple of U, which leaves the update invariant)
UNROLL = 16


def _unroll_for(w):
    """Mosaic compile time scales with the statically-unrolled body size
    (UNROLL x W word updates); cap the product so long sequences (large W)
    don't blow up compilation - a 57-word kernel at UNROLL=16 compiles for
    >30 min through the remote AOT helper."""
    return int(max(1, min(UNROLL, 256 // max(w, 1))))


# word-update budget for the FULLY unrolled position loop: measured on
# v5e, the fori-loop variant runs ~4x below the unrolled one (the loop
# carry round-trips the X words through VMEM every iteration); full
# unroll is bounded by Mosaic compile time, which scales with body size
_FULL_UNROLL_BUDGET = 6144


def _make_kernel(w, length, ql, interpret=False, nr=1):
    unroll = _unroll_for(w)
    n_iter = length // unroll

    def kernel(syms_ref, table_ref, out_ref):
        def one_pos(t, xss):
            # nr INDEPENDENT reference chains per position: the word
            # updates of one chain form a serial dependency (latency
            # bound); interleaving fills the VPU pipeline
            outs = []
            for c in range(nr):
                sym = syms_ref[0, c, t]
                base = sym * np.int32(w)
                carry = jnp.zeros((8, ql), jnp.int32)
                new = []
                xs = xss[c]
                for k in range(w):
                    v = xs[k]
                    tb = v & table_ref[0, base + np.int32(k)]
                    v2 = v + tb + carry
                    carry = ((v2 ^ MIN32) < (v ^ MIN32)).astype(jnp.int32)
                    new.append(v2 | (v - tb))
                outs.append(tuple(new))
            return tuple(outs)

        x0 = tuple(tuple(jnp.full((8, ql), -1, jnp.int32)
                         for _ in range(w)) for _ in range(nr))
        if length * w * nr <= _FULL_UNROLL_BUDGET and not interpret:
            xss = x0
            for t in range(length):
                xss = one_pos(np.int32(t), xss)
        else:
            def block_step(it, state):
                # `it` is unused: under an x64-enabled outer jit the fori
                # counter traces as i64, and any i64<->i32 convert inside
                # a Mosaic kernel sends the lowering into infinite
                # recursion.  The counter is carried explicitly in i32.
                t0, xss = state
                for u in range(unroll):
                    xss = one_pos(t0 + np.int32(u), xss)
                return (t0 + np.int32(unroll), xss)

            _, xss = jax.lax.fori_loop(np.int32(0), np.int32(n_iter),
                                       block_step, (jnp.int32(0), x0))

        for c in range(nr):
            cnt = jnp.zeros((8, ql), jnp.int32)
            for k in range(w):
                cnt = cnt + _popcount32(~xss[c][k])
            out_ref[0, 0, c] = cnt
    return kernel


def _lcs_pallas_impl(table, syms, w, length, ql, interpret=False,
                     nb_run=None):
    """table: [NB, 32*W, 8, QL] int32 query masks; syms: [R, L] int32.

    Returns [NB, R, 8, QL] int32 LCS lengths.  Plain traceable function
    (call this from inside other jitted programs - a nested jit around a
    pallas_call inside lax.scan overflows the Python recursion limit
    during lowering).

    nb_run: optional TRACED number of query blocks to actually compute
    (dynamic grid dimension - one compiled program regardless of the
    value); output blocks >= nb_run are garbage.  Triangular sweeps
    (SLINK/UPGMA row prefixes) pass ceil((ref+block)/8QL) and skip the
    upper half of the all-pairs work the full grid would do."""
    nb = table.shape[0]
    r_orig = syms.shape[0]
    r = r_orig
    nr = _pick_nr(w)
    if r % nr:
        syms = jnp.concatenate(
            [syms, jnp.tile(syms[-1:], (nr - r % nr, 1))], axis=0)
        r = syms.shape[0]
    unroll = _unroll_for(w)
    lpad = ((length + unroll - 1) // unroll) * unroll
    if lpad != length:
        # pad with the no-op symbol (22: zero mask rows on every query)
        syms = jnp.concatenate(
            [syms, jnp.full((r, lpad - length), 22, syms.dtype)], axis=1)
        length = lpad
    syms3 = syms.reshape(r // nr, nr, length)
    z = np.int32(0)
    # minor axis = refs: mask block stays resident
    grid = (nb if nb_run is None else nb_run, r // nr)
    out = pl.pallas_call(
        _make_kernel(w, length, ql, interpret, nr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nr, length), lambda b, i: (i, z, z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NO_SYMBOLS * w, 8, ql),
                         lambda b, i: (b, z, z, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nr, 8, ql),
                               lambda b, i: (b, i, z, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, r // nr, nr, 8, ql), jnp.int32),
        interpret=interpret,
    )(syms3, table)
    return out.reshape(nb, r, 8, ql)[:, :r_orig]


_lcs_pallas = jax.jit(_lcs_pallas_impl,
                      static_argnames=("w", "length", "ql", "interpret"))


@functools.partial(jax.jit, static_argnames=("w", "length", "ql", "interpret"))
def _lcs_pallas_u16(table, syms, w, length, ql, interpret=False,
                    nb_run=None):
    """As _lcs_pallas, but returns uint16 (valid for length < 65536):
    halves the device->host pull."""
    return _lcs_pallas_impl(table, syms, w, length, ql, interpret=interpret,
                            nb_run=nb_run).astype(jnp.uint16)


def pack_query_table(padded: np.ndarray, ql: int):
    """[N, L] int8 padded queries -> ([NB, 32*W, 8, QL] int32 device layout,
    W, NB).  Query q lives at block q // (8*QL), sublane (q % (8*QL)) // QL,
    lane q % QL."""
    n, lmax = padded.shape
    w = (lmax + BV32 - 1) // BV32
    blk = 8 * ql
    nb = (n + blk - 1) // blk
    table = build_query_mask_table(padded)          # [32, N, W] u32
    full = np.zeros((NO_SYMBOLS, nb * blk, w), dtype=np.uint32)
    full[:, :n] = table
    # -> [NB, 32, W, 8, QL] -> [NB, 32*W, 8, QL]
    full = full.transpose(0, 2, 1).reshape(NO_SYMBOLS, w, nb, 8, ql)
    full = full.transpose(2, 0, 1, 3, 4).reshape(nb, NO_SYMBOLS * w, 8, ql)
    return full.view(np.int32), w, nb


def lcs_rows(table_dev, syms: np.ndarray, w: int, ql: int, n: int,
             interpret=False, n_queries=None) -> np.ndarray:
    """LCS of each of the R symbol rows vs all queries in table_dev.

    syms: [R, L] int32 (pad symbols >= 20 are no-ops).  Returns [R, n]
    int64.  Results cross the device boundary as u16 (LCS <= L < 65536)
    to halve the pull.  n_queries: only the first n_queries columns are
    needed - query blocks beyond them are skipped via the dynamic grid
    (the triangular-sweep half-work saving); columns n_queries..n of the
    result are garbage."""
    fn = _lcs_pallas_u16 if syms.shape[1] < 65536 else _lcs_pallas
    nb = table_dev.shape[0]
    nb_run = None
    if n_queries is not None:
        need = -(-n_queries // (8 * ql))
        if need < nb:
            nb_run = np.int32(need)
    out = fn(table_dev, jnp.asarray(syms), w, syms.shape[1], ql,
             interpret=interpret, nb_run=nb_run)
    r = syms.shape[0]
    res = np.asarray(out).astype(np.int64).transpose(1, 0, 2, 3).reshape(r, -1)
    return res[:, :n]


class PallasDistanceBackend:
    """Device distance backend: row BLOCKS per dispatch (amortizes the
    ~26 ms tunnel round trip over hundreds of rows), LCS on the VPU at
    full vreg occupancy, exact float64/float32 transforms on host."""

    def __init__(self, sequences, measure, dtype, block_rows=256):
        from .distance import transform_distances
        self._transform = transform_distances
        self.sequences = sequences
        self.measure = measure
        self.dtype = dtype
        self.block_rows = block_rows
        n = len(sequences)
        self.n = n
        self._cache_base = -1
        self._cache = None
        self._cache_cols = 0
        if n:
            lmax = max(s.data_size for s in sequences)
            padded = np.full((n, lmax), 22, dtype=np.int8)
            for k, s in enumerate(sequences):
                padded[k, :len(s.data)] = s.data
            self.padded = padded
            w = (lmax + BV32 - 1) // BV32
            self.ql = _pick_ql(w)
            tab, self.w, self.nb = pack_query_table(padded, self.ql)
            self.table_dev = jnp.asarray(tab)
            self.lengths = np.array([s.length for s in sequences],
                                    dtype=np.int64)

    def _lcs_block(self, ref_ids, pad_to=None, n_queries=None):
        syms = self.padded[ref_ids].astype(np.int32)
        if pad_to is not None and len(ref_ids) < pad_to:
            syms = np.vstack([syms,
                              np.tile(syms[-1:], (pad_to - len(syms), 1))])
        out = lcs_rows(self.table_dev, syms, self.w, self.ql, self.n,
                       n_queries=n_queries)
        return out[:len(ref_ids)]

    def _lcs_all(self, ref_idx, need_cols=None):
        need = self.n if need_cols is None else need_cols
        if self._cache is not None and \
                self._cache_base <= ref_idx < self._cache_base + len(self._cache) \
                and self._cache_cols >= need:
            return self._cache[ref_idx - self._cache_base]
        sequential = self._cache is None or \
            ref_idx == self._cache_base + len(self._cache)
        if sequential:
            # SLINK/UPGMA-style forward sweep: prefetch a whole row
            # block.  A prefix sweep (row_prefix: row i reads cols < i)
            # needs only cols < base + block_rows: the dynamic grid
            # skips the upper-triangle query blocks - the same
            # half-work saving as the reference's triangular loops
            ids = np.arange(ref_idx, min(ref_idx + self.block_rows, self.n))
            # the prefetched block must cover the CALLER's need too: row()
            # passes need_cols = max(query_ids)+1 for arbitrary query sets
            # (Prim queries all remaining ids from the first node), which
            # can exceed ref_idx + block_rows - truncating there would
            # return uninitialized columns from skipped query blocks
            ncq = self.n if need_cols is None \
                else min(self.n, max(need, ref_idx + self.block_rows))
            self._cache = self._lcs_block(ids, pad_to=self.block_rows,
                                          n_queries=ncq)
            self._cache_base = ref_idx
            self._cache_cols = ncq
            return self._cache[0]
        # random access (medoid seeds, CLARANS): one 8-row-padded call
        return self._lcs_block(np.array([ref_idx]), pad_to=8)[0]

    def row(self, ref_idx, query_ids=None):
        if query_ids is None:
            lcs = self._lcs_all(ref_idx)
        else:
            need = int(np.max(query_ids)) + 1 if len(query_ids) else 0
            lcs = self._lcs_all(ref_idx, need_cols=need)
        ref_len = int(self.sequences[ref_idx].length)
        if query_ids is None:
            return self._transform(self.measure, lcs, ref_len, self.lengths,
                                   self.dtype)
        return self._transform(self.measure, lcs[query_ids], ref_len,
                               self.lengths[query_ids], self.dtype)

    def row_prefix(self, ref_idx, count):
        if count == 0:
            return np.zeros(0, dtype=self.dtype)
        return self.row(ref_idx, np.arange(count))

    def rows_batch(self, ref_ids, query_ids=None):
        """[R, N] (or [R, len(query_ids)]) distance rows in block_rows-row
        device dispatches - FastTree's seed assignment pass and the CLARANS
        sample matrix ride the same batched kernel as the tree sweeps
        (reference FastTree.cpp:302-330, 385-436)."""
        ref_ids = np.asarray(ref_ids, dtype=np.int64)
        ncol = self.n if query_ids is None else len(query_ids)
        out = np.empty((len(ref_ids), ncol), dtype=self.dtype)
        for k0 in range(0, len(ref_ids), self.block_rows):
            ids = ref_ids[k0:k0 + self.block_rows]
            lcs = self._lcs_block(ids)
            for j, rid in enumerate(ids):
                lj = lcs[j] if query_ids is None else lcs[j][query_ids]
                ql = self.lengths if query_ids is None \
                    else self.lengths[query_ids]
                out[k0 + j] = self._transform(
                    self.measure, lj, int(self.sequences[rid].length), ql,
                    self.dtype)
        return out
