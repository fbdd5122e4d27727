"""Pallas/Mosaic profile-alignment DP kernel.

The lax.scan row loop of ops/dp_jax.py dispatches one XLA loop iteration
per DP row; on TPU each iteration costs ~0.6 ms regardless of width (the
x64 legalizer shreds the body into hundreds of unfused u32 micro-kernels),
capping the kernel at ~1e7 cells/s.  This module runs the ENTIRE row loop
inside one Mosaic kernel, and (since round 2) builds every per-cell cost
IN the kernel - no [G, w1p, sb, w2pe] cost matrices ever touch HBM:

 - the match-score term t[r, j] = sum_s counters1[r, s] * scores2[j, s]
   (reference profile_seq.cpp:698-712) is a 30-term multiply-accumulate
   per row over the VMEM-resident scores2 plane stack;
 - the tmH/tmV corrections and the rank<=4 gap matrices (gvs/gvc/ghs/ghc,
   reference profile.cpp:1223-1315) are per-row scalar x column-factor
   products;
 - the D/H/V rows live in VMEM scratch across sequential grid steps; the
   H channel's intra-row dependency is the max-plus prefix scan
   H = bc + cummax(m - bc) done log-depth in-kernel; packed 2-bit x3
   direction rows stream out.
 - all arithmetic is native i32 (Mosaic rejects s64): DP values are
   (hi, lo) i32 pairs; cost terms are single i32 words when the batch
   provably fits (see _single_word_ok) and (hi, lo) pairs otherwise.
 - sublane batching: SB=8 independent merges ride the sublane dimension
   so every VPU op runs on full (8, 128) vregs; SB=1 is the single-merge
   fallback (1/8 sublane utilization, still far faster than the scan).

Bit-exact vs core/dp.py (tests/test_dp_pallas.py runs this kernel in
interpreter mode on CPU).
"""

import functools

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.defs import (GAP, GAP_EXT, GAP_OPEN, GAP_TERM_EXT, GAP_TERM_OPEN,
                         INFTY, NO_AMINOACIDS, NO_AMINOACIDS_AND_GAPS)
from .dp_jax import JaxDPResult, _bucket, _prepare_inputs

NEG = np.int64(-INFTY)


def _lo32(x):
    v = int(np.int64(x)) & 0xFFFFFFFF
    return np.int32(v - (1 << 32) if v >= (1 << 31) else v)


NEG_HI = np.int32(np.int64(NEG) >> np.int64(32))
NEG_LO = _lo32(NEG)
MIN32 = np.int32(-2147483648)
_D, _H, _V = 0, 1, 2
COL0_PACK = _V | (_V << 2) | (_V << 4)          # 42
ROW0_PACK = _H | (_H << 2) | (_H << 4)          # 21

LANE_PAD = 128     # extra lanes so lane j == DP column j (lane 0 = col 0)

# colf plane indices (column factors, [G, P, sb, w2pe] i32).
# 0-3: (hi, lo) pairs of cumsum(p2e') and cumsum(p2te') for the bc trick;
# 4-9: g2so g2se g2sto g2ste g2ce g2cte gap-correction counts;
# single mode adds 10-13: p2o p2e p2to p2te, 14: gaps2_change (i32);
# pair mode adds 10-17: p2o..p2te as (hi, lo) pairs, 18-19: gaps2_change.
_COLF_P = {True: 15, False: 20}

# rowf plane indices (per-row factors, [G, w1p, sb, K] i32).
# common: 0 g1ce, 1 g1cte (bc-trick row counts).
# single: 2-5 s1go s1ge s1gto s1gte, 6-9 g1so g1se g1sto g1ste,
#         10 v0_cost, 11 n1c, 12 n1tc, 13 col1nng,
#         14 band_lo, 15 band_hi  (K=16).
# pair:   2-11 (hi, lo) pairs of s1go s1ge s1gto s1gte v0_cost,
#         12-15 g1so g1se g1sto g1ste, 16 n1c, 17 n1tc, 18 col1nng,
#         19 band_lo, 20 band_hi (K=24 padded).
# band_lo/band_hi: guided-alignment band per DP row (reference
# FindRowRanges, profile.cpp:1320-1365); read only when banded=True.
_ROWF_K = {True: 16, False: 24}
_BAND_PLANES = {True: (14, 15), False: (19, 20)}


def _pallas_bucket(w):
    return max(128, _bucket(w))


def _row_block(sb, w2pe, single=True):
    """Rows per grid step.  With all cost terms built in-kernel the only
    streamed blocks are dirs/fin/rowf/c1 - VMEM is no longer the binding
    constraint; the static row unroll's code size is (rows are unrolled
    in the kernel body; dynamic row indexing into VMEM lowers
    pathologically on Mosaic)."""
    fixed = ((30 if single else 60) + _COLF_P[single] + 3 + 12) \
        * sb * w2pe * 4
    per_row = (w2pe + 8 + 32 + _ROWF_K[single]) * sb * 4 * 2 \
        + (9 if single else 16) * w2pe * sb * 4 \
        + 6 * w2pe * sb * 4     # block cost temporaries + saved channels
    if single:
        budget = 24 * 1024 * 1024
    else:
        # pair mode doubles most live temporaries; the formula above
        # underestimates them (observed: 18.6 MB actual vs 9.6 modeled at
        # sb=1, w2pe=8320, blk=8 - over the 16 MB scoped-vmem limit), so
        # budget conservatively and scale the per-row share
        per_row = int(per_row * 2.5)
        budget = 10 * 1024 * 1024
    for blk in (8, 4, 2, 1):
        if fixed + blk * per_row <= budget:
            return blk
    return 1


# ---------------------------------------------------------------------------
# i64 as (hi:i32, lo:i32 holding the u32 bit pattern)
# ---------------------------------------------------------------------------
def _ult(a, b):
    return (a ^ MIN32) < (b ^ MIN32)


def p_add(x, y):
    lo = x[1] + y[1]
    carry = _ult(lo, x[1]).astype(jnp.int32)
    return (x[0] + y[0] + carry, lo)


def p_sub(x, y):
    lo = x[1] - y[1]
    borrow = _ult(x[1], y[1]).astype(jnp.int32)
    return (x[0] - y[0] - borrow, lo)


def p_gt(x, y):
    return (x[0] > y[0]) | ((x[0] == y[0]) & _ult(y[1], x[1]))


def p_where(c, x, y):
    return (jnp.where(c, x[0], y[0]), jnp.where(c, x[1], y[1]))


def p_max(x, y):
    return p_where(p_gt(x, y), x, y)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------
def _k_srl(x, k):
    return jax.lax.shift_right_logical(x, jnp.full(x.shape, k, x.dtype))


def _k_pmul_u32(c, x):
    """In-kernel exact (mod 2^64) product of a non-negative i32 count
    (broadcastable, < 2^31) with an (hi, lo) i32 pair."""
    hi, lo = x
    m16 = jnp.int32(0xFFFF)
    a0 = c & m16
    a1 = _k_srl(c, 16)
    b0 = lo & m16
    b1 = _k_srl(lo, 16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = _k_srl(p00, 16) + (p01 & m16) + (p10 & m16)
    lo_out = (mid << 16) | (p00 & m16)
    hi_mul = p11 + _k_srl(p01, 16) + _k_srl(p10, 16) + _k_srl(mid, 16)
    return (c * hi + hi_mul, lo_out)


def _k_pmul_u16(c, x):
    """_k_pmul_u32 specialized to 0 <= c < 2^16: the a1 partial products
    vanish (products still wrap mod 2^32 exactly like the generic path)."""
    hi, lo = x
    m16 = jnp.int32(0xFFFF)
    b0 = lo & m16
    b1 = _k_srl(lo, 16)
    p00 = c * b0
    p01 = c * b1
    mid = _k_srl(p00, 16) + (p01 & m16)
    lo_out = (mid << 16) | (p00 & m16)
    hi_mul = _k_srl(p01, 16) + _k_srl(mid, 16)
    return (c * hi + hi_mul, lo_out)


def _make_kernel(sb, blk, w2pe, single=False, banded=False, mxu=False,
                 fin0=0, smallc=False):
    """fin0: first grid step that computes last-column finals (statically
    known: finals are only read at row w1-1 per merge, so steps before
    (min(w1)-1)//blk skip the 6 masked lane reduces per row).  smallc:
    every in-kernel count factor < 2^16 (u16 pair multiplies)."""
    pm = _k_pmul_u16 if smallc else _k_pmul_u32

    def kernel(*refs):
        if mxu:
            # match-score matrix precomputed on the MXU (_mxu_tb): the
            # kernel streams tb row blocks instead of holding the s2
            # plane stack + c1 counters and re-deriving it on the VPU
            (w1m1_ref, h0hi_ref, h0lo_ref, lastm_ref, colf_ref, rowf_ref,
             tb_ref, dirs_ref, fin_ref, prev_ref) = refs
        else:
            (w1m1_ref, h0hi_ref, h0lo_ref, lastm_ref, colf_ref, rowf_ref,
             s2_ref, c1_ref, dirs_ref, fin_ref, prev_ref) = refs
        i = pl.program_id(1)
        # lane-cumsums of the ghc column factors (lane0-zeroed p2e / p2te):
        # bc_row = g1ce[r] * cumE + g1cte[r] * cumT replaces the log-depth
        # in-kernel p_cumsum (12 cross-lane rolls per row)
        cumE = (colf_ref[0, 0, :, :], colf_ref[0, 1, :, :])
        cumT = (colf_ref[0, 2, :, :], colf_ref[0, 3, :, :])
        (g2so_c, g2se_c, g2sto_c, g2ste_c, g2ce_c, g2cte_c) = (
            colf_ref[0, 4 + k, :, :] for k in range(6))
        if single:
            p2o_c, p2e_c, p2to_c, p2te_c, g2chg_c = (
                colf_ref[0, 10 + k, :, :] for k in range(5))
            dE_c = p2e_c - p2o_c
            dT_c = p2te_c - p2to_c
        else:
            def cp(k):
                return (colf_ref[0, k, :, :], colf_ref[0, k + 1, :, :])

            p2o_p, p2e_p = cp(10), cp(12)
            p2to_p, p2te_p = cp(14), cp(16)
            g2chg_p = cp(18)
            dE_p = p_sub(p2e_p, p2o_p)
            dT_p = p_sub(p2te_p, p2to_p)
        lane = jax.lax.broadcasted_iota(jnp.int32, (sb, w2pe), 1)
        c_D, c_H, c_V = jnp.int32(_D), jnp.int32(_H), jnp.int32(_V)
        neg = (jnp.full((sb, w2pe), NEG_HI, jnp.int32),
               jnp.full((sb, w2pe), NEG_LO, jnp.int32))
        fin_col = jax.lax.broadcasted_iota(jnp.int32, (sb, 8), 1)

        def shf(x):
            """lane j <- lane j-1; lane 0 <- -inf (the 'head' alignment)."""
            return (jnp.where(lane == 0, NEG_HI, jnp.roll(x[0], 1, axis=1)),
                    jnp.where(lane == 0, NEG_LO, jnp.roll(x[1], 1, axis=1)))

        def p_cummax(x):
            h, l = x
            k = 1
            while k < w2pe:
                hs = jnp.where(lane >= k, jnp.roll(h, k, axis=1), jnp.int32(NEG_HI))
                ls = jnp.where(lane >= k, jnp.roll(l, k, axis=1), jnp.int32(NEG_LO))
                h, l = p_max((h, l), (hs, ls))
                k *= 2
            return h, l

        @pl.when(i == 0)
        def _():
            z = jnp.zeros((sb, w2pe), jnp.int32)  # i32 everywhere: Mosaic has no s64
            pD0 = (jnp.where(lane == 0, z, neg[0]),
                   jnp.where(lane == 0, z, neg[1]))
            pH0 = (h0hi_ref[0, :, :], h0lo_ref[0, :, :])
            for ci, ch in enumerate((pD0, pH0, neg)):
                prev_ref[2 * ci * sb:(2 * ci + 1) * sb, :] = ch[0]
                prev_ref[(2 * ci + 1) * sb:(2 * ci + 2) * sb, :] = ch[1]
            # shifted halo planes (lane j <- j-1), carried alongside so
            # each row shifts D/H/V once instead of twice
            for ci, ch in enumerate((shf(pD0), shf(pH0), shf(neg))):
                base = (6 + 2 * ci) * sb
                prev_ref[base:base + sb, :] = ch[0]
                prev_ref[base + sb:base + 2 * sb, :] = ch[1]

        w1m1 = w1m1_ref[0, :, :].reshape(sb, 1)       # per-merge true w1-1
        lastm = lastm_ref[0, :, :] != 0

        def _ld(ci):
            return (prev_ref[2 * ci * sb:(2 * ci + 1) * sb, :],
                    prev_ref[(2 * ci + 1) * sb:(2 * ci + 2) * sb, :])

        carry0 = ((_ld(0), _ld(1), _ld(2)), (_ld(3), _ld(4), _ld(5)))

        # ---- block prologue: every per-cell cost term for this row block
        # as VMEM temporaries [blk, sb, w2pe] (one fused op set per block
        # instead of per row - 8x fewer vector issues, zero HBM traffic)
        lane3 = lane[None]
        lane0_3 = lane3 == 0

        def rb(k):
            return rowf_ref[0, :, :, k:k + 1]          # (blk, sb, 1)

        if banded:
            # guided band (reference row_ranges, profile.cpp:1320-1365):
            # cells outside [lo, hi] read as -inf, exactly the host DP's
            # clearing discipline (core/dp.py: the slice [min_j, max_j] +
            # the lo-1 / hi+1.. clears); lane 0 keeps its boundary V
            blo_b, bhi_b = (rb(k) for k in _BAND_PLANES[single])

        if single:
            if mxu:
                tb = tb_ref[0, :, :, :]
            else:
                tb = c1_ref[0, :, :, 0:1] * s2_ref[0, 0, :, :][None]
                for s in range(1, NO_AMINOACIDS_AND_GAPS):
                    tb = tb + c1_ref[0, :, :, s:s + 1] \
                        * s2_ref[0, s, :, :][None]
            tmHb1 = tb + rb(11) * dE_c[None] + rb(12) * dT_c[None]
            tmVb1 = tb + rb(13) * g2chg_c[None]
            gvsb1 = (rb(2) * g2so_c[None] + rb(3) * g2se_c[None]
                     + rb(4) * g2sto_c[None] + rb(5) * g2ste_c[None])
            gvcb1 = jnp.where(lane0_3, rb(10),
                              rb(3) * g2ce_c[None] + rb(5) * g2cte_c[None])
            ghsb1 = (rb(6) * p2o_c[None] + rb(7) * p2e_c[None]
                     + rb(8) * p2to_c[None] + rb(9) * p2te_c[None])
            ghcb1 = jnp.where(lane0_3, jnp.int32(0),
                              rb(0) * p2e_c[None] + rb(1) * p2te_c[None])
        else:
            def s2p(s):
                return (s2_ref[0, 2 * s, :, :][None],
                        s2_ref[0, 2 * s + 1, :, :][None])

            def rbp(k):
                return (rb(k), rb(k + 1))

            def colp3(x):
                return (x[0][None], x[1][None])

            tb = pm(c1_ref[0, :, :, 0:1], s2p(0))
            for s in range(1, NO_AMINOACIDS_AND_GAPS):
                tb = p_add(tb, pm(c1_ref[0, :, :, s:s + 1], s2p(s)))
            tmHb = p_add(tb, p_add(pm(rb(16), colp3(dE_p)),
                                   pm(rb(17), colp3(dT_p))))
            tmVb = p_add(tb, pm(rb(18), colp3(g2chg_p)))
            gvsb = p_add(
                p_add(pm(g2so_c[None], rbp(2)),
                      pm(g2se_c[None], rbp(4))),
                p_add(pm(g2sto_c[None], rbp(6)),
                      pm(g2ste_c[None], rbp(8))))
            gvcb0 = p_add(pm(g2ce_c[None], rbp(4)),
                          pm(g2cte_c[None], rbp(8)))
            gvcb = p_where(lane0_3, rbp(10), gvcb0)
            ghsb = p_add(p_add(pm(rb(12), colp3(p2o_p)),
                               pm(rb(13), colp3(p2e_p))),
                         p_add(pm(rb(14), colp3(p2to_p)),
                               pm(rb(15), colp3(p2te_p))))
            ghcb0 = p_add(pm(rb(0), colp3(p2e_p)),
                          pm(rb(1), colp3(p2te_p)))
            z3 = jnp.int32(0)
            ghcb = (jnp.where(lane0_3, z3, ghcb0[0]),
                    jnp.where(lane0_3, z3, ghcb0[1]))
        # bc rows for the H-channel scan trick, blockified
        bcb = p_add(pm(rb(0), (cumE[0][None], cumE[1][None])),
                    pm(rb(1), (cumT[0][None], cumT[1][None])))

        def row_body(r, carry):
            # r is a STATIC Python int: all VMEM indexing below is static
            # (dynamic sublane indexing lowers to selects on Mosaic).
            (pD, pH, pV), (pDs, pHs, pVs) = carry
            glob_r = i * np.int32(blk) + np.int32(r)

            def sx(lo):
                return (jax.lax.shift_right_arithmetic(
                    lo, jnp.full(lo.shape, 31, lo.dtype)), lo)

            if single:
                tmD = sx(tb[r])
                tmH = sx(tmHb1[r])
                tmV = sx(tmVb1[r])
                gvs = sx(gvsb1[r])
                gvc = sx(gvcb1[r])
                ghs = sx(ghsb1[r])
                ghc = sx(ghcb1[r])
            else:
                def at(p):
                    return (p[0][r], p[1][r])

                tmD, tmH, tmV = at(tb), at(tmHb), at(tmVb)
                gvs, gvc, ghs, ghc = at(gvsb), at(gvcb), at(ghsb), at(ghcb)

            # ---- D channel (previous row, col j-1: the carried shifted
            # halo planes - each channel is shifted ONCE, when produced) --
            tDd = p_add(pDs, tmD)
            tHd = p_add(pHs, tmH)
            tVd = p_add(pVs, tmV)
            pickD = p_gt(tDd, tHd) & p_gt(tDd, tVd)
            pickH = (~pickD) & p_gt(tHd, tVd)
            D = p_where(pickD, tDd, p_where(pickH, tHd, tVd))
            dD = jnp.where(pickD, c_D, jnp.where(pickH, c_H, c_V))
            D = p_where(lane == 0, neg, D)
            if banded:
                inb = (lane >= blo_b[r]) & (lane <= bhi_b[r])
                D = p_where(inb, D, neg)

            three = (glob_r >= 1) & (lane >= 2)

            # ---- V channel (previous row, same col).  The D-vs-H pick
            # runs on the post-add values (wrap semantics identical to the
            # host DP); max(tDv, tHv) then races tVv - decision-for-
            # decision the same tree as the old pickD3/pickH3 chain, one
            # p_gt cheaper, and the 2-dir region folds in via gDH2 (there
            # mDHv IS tDv, so the pickD2 compare comes out identical)
            tDv = p_add(pD, gvs)
            tHv = p_add(pH, gvs)
            tVv = p_add(pV, gvc)
            gDH = p_gt(tDv, tHv)
            gDH2 = gDH | (~three)
            mDHv = p_where(gDH2, tDv, tHv)
            gDV = p_gt(mDHv, tVv)
            V = p_where(gDV, mDHv, tVv)
            dV = jnp.where(gDV, jnp.where(gDH2, c_D, c_H), c_V)

            # col-0 boundary: V0 = max(pD0, pV0) + v0_cost while row+1 < w1
            # (v0_cost rides in lane 0 of gvc, which is dead otherwise)
            V0vec = p_add(p_max(pD, pV), gvc)
            von = glob_r < w1m1                                # [sb, 1]
            Vb = p_where(von, V0vec, neg)
            V = p_where(lane == 0, Vb, V)
            if banded:
                V = p_where(inb | (lane == 0), V, neg)

            # ---- H channel: max-plus prefix scan along the row ----
            Ds = shf(D)
            Vs = shf(V)
            mD = p_add(Ds, ghs)
            mV = p_add(Vs, ghs)
            m = p_where(three, p_max(mD, mV), mD)
            bc = (bcb[0][r], bcb[1][r])
            run = p_cummax(p_sub(m, bc))
            H = p_add(bc, p_max(run, neg))
            H = p_where(lane == 0, neg, H)
            if banded:
                H = p_where(inb, H, neg)
            Hs = shf(H)

            tHh2 = p_add(Hs, ghc)
            pickD3h = p_gt(mD, tHh2) & p_gt(mD, mV)
            pickV3h = (~pickD3h) & p_gt(mV, tHh2)
            h3 = jnp.where(pickD3h, c_D, jnp.where(pickV3h, c_V, c_H))
            dH = jnp.where(three, h3, jnp.where(p_gt(mD, tHh2), c_D, c_H))

            packed = dD | (dH << 2) | (dV << 4)
            packed = jnp.where(lane == 0, jnp.int32(COL0_PACK), packed)
            dirs_ref[0, r, :, :] = packed
            return ((D, H, V), (Ds, Hs, Vs))

        carry = carry0
        saved = []
        for r in range(blk):
            carry = row_body(r, carry)
            saved.append(carry[0])
        (D, H, V), (Ds, Hs, Vs) = carry
        for ci, ch in enumerate((D, H, V, Ds, Hs, Vs)):
            prev_ref[2 * ci * sb:(2 * ci + 1) * sb, :] = ch[0]
            prev_ref[(2 * ci + 1) * sb:(2 * ci + 2) * sb, :] = ch[1]

        # last-column (col w2 per merge) values, only on grid steps that
        # can contain some merge's final row (i >= fin0)
        def fin_rows():
            z32 = jnp.int32(0)
            for r in range(blk):
                Dr, Hr, Vr = saved[r]

                def pick(ch):
                    return (jnp.sum(jnp.where(lastm, ch[0], z32), axis=1,
                                    dtype=jnp.int32),
                            jnp.sum(jnp.where(lastm, ch[1], z32), axis=1,
                                    dtype=jnp.int32))

                fD, fH, fV = pick(Dr), pick(Hr), pick(Vr)
                fin = (jnp.where(fin_col == 0, fD[0][:, None], z32)
                       + jnp.where(fin_col == 1, fD[1][:, None], z32)
                       + jnp.where(fin_col == 2, fH[0][:, None], z32)
                       + jnp.where(fin_col == 3, fH[1][:, None], z32)
                       + jnp.where(fin_col == 4, fV[0][:, None], z32)
                       + jnp.where(fin_col == 5, fV[1][:, None], z32))
                fin_ref[0, r, :, :] = fin

        if fin0 > 0:
            @pl.when(i >= fin0)
            def _():
                fin_rows()
        else:
            fin_rows()

    return kernel


# ---------------------------------------------------------------------------
# input packing: stage-0 outputs -> kernel factor tensors (all O(W), no
# O(W^2) cost matrices)
# ---------------------------------------------------------------------------
def _split(x):
    return ((x >> np.int64(32)).astype(jnp.int32), x.astype(jnp.int32))


def _sx32(x):
    """Sign-extend an i32 array into an (hi, lo) pair."""
    return (jax.lax.shift_right_arithmetic(
        x, jnp.full(x.shape, 31, x.dtype)), x)


def _cumsum_pairs(p):
    """Inclusive add-scan of an (hi, lo) pair along the last axis,
    log-depth, pure i32 ops (exact mod 2^64).  Replaces s64 _cumsum_log
    in device programs - the XLA TPU x64 legalizer shreds s64 scans."""
    h, l = p
    n = h.shape[-1]
    pad = [(0, 0)] * (h.ndim - 1)
    k = 1
    while k < n:
        hs = jnp.pad(h[..., :-k], pad + [(k, 0)])
        ls = jnp.pad(l[..., :-k], pad + [(k, 0)])
        h, l = p_add((h, l), (hs, ls))
        k *= 2
    return h, l


def _pack_kernel_inputs(colp, xs, w1p, w2p, single):
    """colp/xs (leading dims [G, sb, ...], see _prepare_pallas/_stage0_one)
    -> (w1m1, h0hi, h0lo, lastm, colf, rowf, s2stk, c1stk).  The kernel
    rebuilds every per-cell cost from these O(W) factors in VMEM."""
    w2pe = w2p + LANE_PAD
    g, sb = colp["s2"].shape[0], colp["s2"].shape[1]

    # bc-trick cumsums: bc_row = g1ce[r]*cumE + g1cte[r]*cumT, built as
    # (hi, lo) pairs with i32 scan rounds (s64 scans get shredded)
    z0 = (jnp.arange(w2pe) == 0)[None, None, :]
    if single:
        p2g = colp["p2gaps"].astype(jnp.int32)          # [G, sb, w2pe, 4]
        eP = _sx32(jnp.where(z0, jnp.int32(0), p2g[..., 1]))
        tP = _sx32(jnp.where(z0, jnp.int32(0), p2g[..., 3]))
    else:
        p2g = colp["p2gaps"].astype(jnp.int64)
        eP = _split(jnp.where(z0, jnp.int64(0), p2g[..., 1]))
        tP = _split(jnp.where(z0, jnp.int64(0), p2g[..., 3]))
    eh, el = _cumsum_pairs(eP)
    th, tl = _cumsum_pairs(tP)
    cf = [eh, el, th, tl]
    for name in ("g2so", "g2se", "g2sto", "g2ste", "g2ce", "g2cte"):
        cf.append(colp[name].astype(jnp.int32))
    if single:
        for k in range(4):
            cf.append(p2g[..., k])
        cf.append(colp["gaps2_change"].astype(jnp.int32))
        s2stk = colp["s2"].astype(jnp.int32).transpose(0, 3, 1, 2)
    else:
        for k in range(4):
            hi, lo = _split(p2g[..., k])
            cf += [hi, lo]
        hi, lo = _split(colp["gaps2_change"].astype(jnp.int64))
        cf += [hi, lo]
        s2h, s2l = _split(colp["s2"].astype(jnp.int64))
        # interleave on the plane axis: plane 2s = hi, 2s+1 = lo
        s2stk = jnp.stack([s2h, s2l], axis=4).reshape(
            g, sb, w2pe, 2 * NO_AMINOACIDS_AND_GAPS).transpose(0, 3, 1, 2)
    colf = jnp.stack(cf, axis=1)                        # [G, P, sb, w2pe]

    def rw(name):
        return xs[name].astype(jnp.int32).transpose(0, 2, 1)

    rf = [rw("g1ce"), rw("g1cte")]
    if single:
        for name in ("s1go", "s1ge", "s1gto", "s1gte",
                     "g1so", "g1se", "g1sto", "g1ste", "v0_cost"):
            rf.append(rw(name))
        for name in ("n1c", "n1tc", "col1nng", "blo", "bhi"):
            rf.append(rw(name))
        rf += [jnp.zeros_like(rf[0])] * (_ROWF_K[True] - len(rf))
    else:
        for name in ("s1go", "s1ge", "s1gto", "s1gte", "v0_cost"):
            hi, lo = _split(xs[name].astype(jnp.int64).transpose(0, 2, 1))
            rf += [hi, lo]
        for name in ("g1so", "g1se", "g1sto", "g1ste",
                     "n1c", "n1tc", "col1nng", "blo", "bhi"):
            rf.append(rw(name))
        rf += [jnp.zeros_like(rf[0])] * (_ROWF_K[False] - len(rf))
    rowf = jnp.stack(rf, axis=3)                        # [G, w1p, sb, K]

    c1 = xs["c1"].astype(jnp.int32).transpose(0, 2, 1, 3)   # [G, w1p, sb, 30]
    c1stk = jnp.concatenate(
        [c1, jnp.zeros(c1.shape[:3] + (32 - c1.shape[3],), jnp.int32)],
        axis=3)

    if "h0hi" in colp:                                  # device stage 0
        h0hi, h0lo = colp["h0hi"], colp["h0lo"]
    else:                                               # host _prepare_pallas
        h0hi, h0lo = _split(colp["h0"].astype(jnp.int64))
    lastm = colp["last_col_mask"].astype(jnp.int32)
    w1m1 = xs["w1m1"].astype(jnp.int32)[:, None, :]     # [G, 1, sb]
    return w1m1, h0hi, h0lo, lastm, colf, rowf, s2stk, c1stk


def _run_kernel(w1m1, h0hi, h0lo, lastm, colf, rowf, mats, sb, blk,
                w1p, w2p, interpret=False, single=False, banded=False,
                mxu=False, fin0=0, smallc=False):
    """The Mosaic row-loop kernel over O(W) factor tensors.  mats is
    (s2stk, c1stk) in MAC mode or (tbstk,) in MXU mode."""
    w2pe = w2p + LANE_PAD
    g = h0hi.shape[0]
    grid = (g, w1p // blk)

    def bm(bs, im):
        return pl.BlockSpec(bs, im, memory_space=pltpu.VMEM)

    z0 = np.int32(0)   # index maps must stay i32: x64 literals break Mosaic
    in_specs = [
        bm((1, 1, sb), lambda b, i: (b, z0, z0)),     # w1m1
        bm((1, sb, w2pe), lambda b, i: (b, z0, z0)),  # h0hi
        bm((1, sb, w2pe), lambda b, i: (b, z0, z0)),  # h0lo
        bm((1, sb, w2pe), lambda b, i: (b, z0, z0)),  # lastm
        bm((1, colf.shape[1], sb, w2pe),
           lambda b, i: (b, z0, z0, z0)),                      # colf
        bm((1, blk, sb, rowf.shape[3]),
           lambda b, i: (b, i, z0, z0)),                       # rowf
    ]
    if mxu:
        in_specs.append(
            bm((1, blk, sb, w2pe), lambda b, i: (b, i, z0, z0)))  # tbstk
    else:
        in_specs += [
            bm((1, mats[0].shape[1], sb, w2pe),
               lambda b, i: (b, z0, z0, z0)),                     # s2stk
            bm((1, blk, sb, mats[1].shape[3]),
               lambda b, i: (b, i, z0, z0)),                      # c1stk
        ]

    out_shape = [
        jax.ShapeDtypeStruct((g, w1p, sb, w2pe), jnp.int32),   # dirs
        jax.ShapeDtypeStruct((g, w1p, sb, 8), jnp.int32),      # finals
    ]
    out_specs = [
        bm((1, blk, sb, w2pe), lambda b, i: (b, i, z0, z0)),
        bm((1, blk, sb, 8), lambda b, i: (b, i, z0, z0)),
    ]

    dirs_i32, fins = pl.pallas_call(
        _make_kernel(sb, blk, w2pe, single=single, banded=banded, mxu=mxu,
                     fin0=fin0, smallc=smallc),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((12 * sb, w2pe), jnp.int32)],
        interpret=interpret,
    )(w1m1, h0hi, h0lo, lastm, colf, rowf, *mats)
    return dirs_i32, fins


def _mxu_tb(c1, s2, cfg):
    """Match-score matrix on the MXU: tb[b, r, j] = sum_s c1[b, r+1, s] *
    s2[b, j, s] (the reference inner loop, profile_seq.cpp:698-712),
    as batched int8 limb matmuls.

    cfg = (l1, l2, b2log), static: counts decompose into l1 7-bit limbs
    (card < 2^(7*l1)); scores are biased non-negative by B2 = 2^b2log
    (valid when |s2| < B2) and decompose into l2 limbs.  Every partial
    dot is <= 30 * 127 * 127 < 2^19 (exact in i32 - and exact even if the
    backend runs the contraction in f32: < 2^24); shifts/adds wrap mod
    2^32; the bias correction B2 * rowsum(c1) restores the true value,
    which the single-word bound guarantees fits i32.

    c1 [B, w1p, S] i32 (stage-0 masked counters, rows 1..w1p),
    s2 [B, w2pe, S] i32 score planes.  Returns [B, w1p, w2pe] i32."""
    l1, l2, b2log = cfg
    b2 = 1 << b2log
    rowsum = c1.sum(axis=2, dtype=jnp.int32)            # card per true row
    # canonical batched-matmul layout [B, S, w2pe]; the contraction runs
    # as bf16 x bf16 -> f32 on the MXU: limb values < 128 are exact in
    # bf16, every partial sum <= 30 * 127 * 127 < 2^24 is exact in the
    # f32 accumulator, so the i32 round-trip is lossless
    s2b = jnp.swapaxes(s2, 1, 2).astype(jnp.int32) + jnp.int32(b2)
    c1 = c1.astype(jnp.int32)

    def limbs(x, n):
        return [((x >> (7 * k)) & 127).astype(jnp.bfloat16)
                for k in range(n)]

    a = limbs(c1, l1)
    b = limbs(s2b, l2)
    tb = None
    for i in range(l1):
        for j in range(l2):
            sh = 7 * (i + j)
            if sh >= 32:
                continue
            d = jax.lax.dot_general(
                a[i], b[j],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # [B, w1p, w2pe]
            d = d.astype(jnp.int32) << sh
            tb = d if tb is None else tb + d
    return tb - rowsum[:, :, None] * jnp.int32(b2)


def _dp_pallas_raw(colp, xs, sb, blk, w1p, w2p, interpret=False,
                   single=False, banded=False, tb=None, fin0=0,
                   smallc=False):
    """Input packing + kernel; returns the raw kernel outputs
    (dirs i32 [G, w1p, sb, w2pe], finals i32 [G, w1p, sb, 8]).
    Traced inside the jitted wrappers below.  tb: optional MXU-computed
    match-score stack [G, w1p, sb, w2pe] i32 (replaces the in-kernel
    30-term MAC; the unused s2/c1 stacks are dead code the compiler
    drops)."""
    w1m1, h0hi, h0lo, lastm, colf, rowf, s2stk, c1stk = \
        _pack_kernel_inputs(colp, xs, w1p, w2p, single)
    mats = (tb,) if tb is not None else (s2stk, c1stk)
    return _run_kernel(w1m1, h0hi, h0lo, lastm, colf, rowf, mats,
                       sb, blk, w1p, w2p, interpret=interpret,
                       single=single, banded=banded, mxu=tb is not None,
                       fin0=fin0, smallc=smallc)


@functools.partial(jax.jit,
                   static_argnames=("sb", "blk", "w1p", "w2p", "interpret",
                                    "single"))
def _dp_pallas(colp, xs, sb, blk, w1p, w2p, interpret=False, single=False):
    """colp/xs: stacked arrays with leading dims [G, sb, ...] (G groups of
    sb merges).  Returns (dirs u8 [G*sb, w1p+1, w2p+1],
    finals i32 [G, w1p, sb, 8])."""
    w2pe = w2p + LANE_PAD
    g = colp["s2"].shape[0]
    dirs_i32, fins = _dp_pallas_raw(colp, xs, sb, blk, w1p, w2p, interpret,
                                    single)

    # [G, w1p, sb, w2pe] -> [G*sb, w1p+1, w2p+1] u8 with the constant row 0
    dirs = dirs_i32[..., :w2p + 1].astype(jnp.uint8)
    dirs = dirs.transpose(0, 2, 1, 3).reshape(g * sb, w1p, w2p + 1)
    jj = jnp.arange(w2p + 1)
    row0 = jnp.where(jj >= 1, jnp.uint8(ROW0_PACK), jnp.uint8(0))
    row0 = jnp.broadcast_to(row0, (g * sb, 1, w2p + 1))
    dirs = jnp.concatenate([row0, dirs], axis=1)
    return dirs, fins


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------
def _shrink(a):
    """Smallest safe signed dtype for the host->device upload (the device
    tunnel moves ~15-50 MB/s; i64 operands quadruple the transfer)."""
    if a.dtype != np.int64:
        return a
    if a.size == 0:
        return a.astype(np.int16)
    m = abs(int(a.max(initial=0))) | abs(int(a.min(initial=0)))
    if m < 2 ** 7:
        return a.astype(np.int8)
    if m < 2 ** 15:
        return a.astype(np.int16)
    if m < 2 ** 31:
        return a.astype(np.int32)
    return a


def _prepare_pallas(params, p1, p2, w1p, w2p):
    """numpy dicts for one merge: colp (column-shaped, lane j == col j) and
    xs (per-row, padded to w1p)."""
    col, xs = _prepare_inputs(params, p1, p2, w1p, w2p)
    w2pe = w2p + LANE_PAD

    def padc(a, fill=0):
        out = np.full((w2pe,) + a.shape[1:], fill, dtype=a.dtype)
        out[:a.shape[0]] = a
        return out

    def shift1(a):
        out = np.zeros(w2pe, dtype=a.dtype)
        out[1:1 + a.shape[0]] = a
        return out

    colp = dict(
        s2=padc(col["s2_sym"]),                      # [w2pe, 30]
        p2gaps=padc(col["p2gaps"].T.copy()),         # [w2pe, 4]
        gaps2_change=padc(col["gaps2_change"]),
        h0=padc(col["h0_row"], fill=NEG),
        last_col_mask=padc(col["last_col_mask"]).astype(np.int64),
        g2so=shift1(col["g2so"]), g2se=shift1(col["g2se"]),
        g2sto=shift1(col["g2sto"]), g2ste=shift1(col["g2ste"]),
        g2ce=shift1(col["g2ce"]), g2cte=shift1(col["g2cte"]),
    )
    xsp = dict(
        c1=xs["c1"], col1nng=xs["col1nng"], n1c=xs["n1c"], n1tc=xs["n1tc"],
        s1go=xs["s1go"], s1ge=xs["s1ge"], s1gto=xs["s1gto"],
        s1gte=xs["s1gte"],
        g1so=xs["g1so"], g1se=xs["g1se"], g1sto=xs["g1sto"],
        g1ste=xs["g1ste"], g1ce=xs["g1ce"], g1cte=xs["g1cte"],
        v0_cost=xs["v0_cost"],
        w1m1=np.int64(p1.width - 1),
        blo=np.zeros(w1p, np.int32),
        bhi=np.full(w1p, p2.width, np.int32),
    )
    return colp, xsp


# ---------------------------------------------------------------------------
# device-side stage 0: derive ALL DP cost inputs from the raw profile
# counters, so the host uploads only [W+1, 32] i8/i16 counter tensors per
# merge (~4x less than the precomputed cost arrays).  Mirrors
# core/profile.py:_calculate_scores and ops/dp_jax.py:_prepare_inputs /
# _gap_correction_arrays exactly (integer arithmetic, bit-identical).
# ---------------------------------------------------------------------------
def _scores_from_counters(c, card, w, sm, gp, it=jnp.int64):
    """[Wp+1, 32] counters -> [Wp+1, 32] scores (profile.cpp:162-217).
    c/card in dtype `it` (i32 when the single-word bound holds - avoids
    the s64 legalizer), w traced scalar, sm [24, 24], gp static ints."""
    go, ge, gto, gte = (it(x) for x in gp)
    wp = c.shape[0] - 1
    cc = c[1:]
    gap_cost = (cc[:, GAP_OPEN] * go + cc[:, GAP_TERM_OPEN] * gto
                + cc[:, GAP_EXT] * ge + cc[:, GAP_TERM_EXT] * gte)
    sym = jnp.zeros((wp, NO_AMINOACIDS), it)
    for s in range(NO_AMINOACIDS):
        sym = sym + cc[:, s:s + 1] * sm[s][None, :]
    tot = cc[:, :NO_AMINOACIDS].sum(axis=1, dtype=it)

    scores = jnp.zeros((wp + 1, 32), it)
    scores = scores.at[1:, :NO_AMINOACIDS].set(sym + gap_cost[:, None])
    scores = scores.at[1:, GAP_OPEN].set(tot * go)
    scores = scores.at[1:, GAP_TERM_OPEN].set(tot * gto)
    scores = scores.at[1:, GAP_EXT].set(tot * ge)
    scores = scores.at[1:, GAP_TERM_EXT].set(tot * gte)
    row0 = jnp.zeros(32, it)
    row0 = row0.at[GAP_OPEN].set(card * go)
    row0 = row0.at[GAP_EXT].set(card * ge)
    row0 = row0.at[GAP_TERM_EXT].set(card * gte)
    row0 = row0.at[GAP_TERM_OPEN].set(card * gto)
    return scores.at[0].set(row0)


def _gap_corrections_device(c, w, card, it=jnp.int64):
    """ops/dp_jax.py:_gap_correction_arrays, traced (w/card scalars)."""
    wp = c.shape[0] - 1
    j = np.arange(wp + 1)
    nxt = np.minimum(j + 1, wp)
    internal = (j >= 1) & (j < w)
    at_end = j == w
    z = it(0)

    st_to = jnp.where(internal, c[nxt, GAP_TERM_OPEN], z)
    st_te = jnp.where(internal, c[j, GAP_TERM_OPEN] + c[j, GAP_TERM_EXT], z)
    st_ext = jnp.where(internal, c[j, GAP_OPEN] + c[j, GAP_EXT], z)
    cnt_end = c[j, GAP_TERM_OPEN] + c[j, GAP_TERM_EXT]
    st_te = jnp.where(at_end, cnt_end, st_te)
    st_to = jnp.where(at_end, card - cnt_end, st_to)
    st_open = jnp.where(internal, card - st_ext - st_to - st_te, z)

    ct_te = jnp.where(internal, c[nxt, GAP_TERM_OPEN] + c[j, GAP_TERM_OPEN]
                      + c[j, GAP_TERM_EXT], z)
    ct_te = jnp.where(at_end, card, ct_te)
    ct_ext = jnp.where(internal | at_end, card - ct_te, z)
    ct_te = jnp.where(~(internal | at_end), z, ct_te)
    return st_open, st_ext, st_to, st_te, ct_ext, ct_te


def _stage0_one(c1, c2, w1, w2, card1, card2, sm, gp, w1p, w2p,
                it=jnp.int64):
    """Device equivalent of _prepare_inputs + _prepare_pallas for ONE merge.
    c1 [w1p+1, 32], c2 [w2p+1, 32]; w1/w2/card1/card2 scalars.  All score
    arithmetic runs in dtype `it` - i32 when the single-word bound holds
    (no s64 ops for the legalizer to shred), i64 otherwise.  The h0
    boundary row is computed as an (hi, lo) i32 pair in BOTH modes (its
    cumsum can exceed i32).  Returns (colp, xs) dicts in the pallas
    layout; colp carries h0hi/h0lo."""
    go, ge, gto, gte = gp
    w2pe = w2p + LANE_PAD
    jjd = jnp.arange(w2p + 1)

    c1 = c1.astype(it)
    c2 = c2.astype(it)
    w1 = w1.astype(it)
    w2 = w2.astype(it)
    card1 = card1.astype(it)
    card2 = card2.astype(it)
    smt = sm.astype(it)

    s1 = _scores_from_counters(c1, card1, w1, smt, gp, it)
    s2 = _scores_from_counters(c2, card2, w2, smt, gp, it)
    # padded rows (beyond the true width) must be zero like the host pad()
    rows1 = jnp.arange(w1p + 1)
    rows2 = jnp.arange(w2p + 1)
    s1 = jnp.where(rows1[:, None] <= w1, s1, it(0))
    s2 = jnp.where(rows2[:, None] <= w2, s2, it(0))
    c1m = jnp.where(rows1[:, None] <= w1, c1, it(0))
    c2m = jnp.where(rows2[:, None] <= w2, c2, it(0))

    g1 = _gap_corrections_device(c1m, w1, card1, it)
    g2 = _gap_corrections_device(c2m, w2, card2, it)

    p2o, p2e = s2[:, GAP_OPEN], s2[:, GAP_EXT]
    p2to, p2te = s2[:, GAP_TERM_OPEN], s2[:, GAP_TERM_EXT]
    gaps2_change = (c2m[:, GAP_OPEN] * it(ge - go)
                    + c2m[:, GAP_TERM_OPEN] * it(gte - gto))

    # h0 boundary: cumsum of per-column term-gap costs x card1 - values
    # can exceed i32, so build it as an (hi, lo) pair in both modes
    inc = jnp.where(jjd == 1, p2to[1], p2te)
    if it is jnp.int32:
        incp = _k_pmul_u32(jnp.broadcast_to(card1, inc.shape), _sx32(inc))
    else:
        incp = _split(inc * card1)
    z1 = jnp.zeros(1, jnp.int32)
    h0h, h0l = _cumsum_pairs((incp[0][1:], incp[1][1:]))
    h0h = jnp.concatenate([z1, h0h])
    h0l = jnp.concatenate([z1, h0l])
    bnd = (jjd == 0) | (jjd == w2)
    h0h = jnp.where(bnd, NEG_HI, h0h)
    h0l = jnp.where(bnd, NEG_LO, h0l)

    def padc(a, fill=0):
        pad_shape = (w2pe - a.shape[0],) + a.shape[1:]
        return jnp.concatenate(
            [a, jnp.full(pad_shape, fill, a.dtype)], axis=0)

    def shift1(a):
        out = jnp.zeros(w2pe, a.dtype)
        return out.at[1:1 + a.shape[0]].set(a)

    colp = dict(
        s2=padc(s2[:, :NO_AMINOACIDS_AND_GAPS]),
        p2gaps=padc(jnp.stack([p2o, p2e, p2to, p2te], axis=1)),
        gaps2_change=padc(gaps2_change),
        h0hi=padc(h0h, fill=NEG_HI),
        h0lo=padc(h0l, fill=NEG_LO),
        last_col_mask=padc((jjd == w2).astype(jnp.int32)),
        g2so=shift1(g2[0][1:]), g2se=shift1(g2[1][1:]),
        g2sto=shift1(g2[2][1:]), g2ste=shift1(g2[3][1:]),
        g2ce=shift1(g2[4][1:]), g2cte=shift1(g2[5][1:]),
    )
    ii = jnp.arange(1, w1p + 1)
    s1gto = s1[1:, GAP_TERM_OPEN]
    s1gte = s1[1:, GAP_TERM_EXT]
    xs = dict(
        c1=c1m[1:, :NO_AMINOACIDS_AND_GAPS],
        col1nng=c1m[1:, :NO_AMINOACIDS].sum(axis=1, dtype=it),
        n1c=c1m[1:, GAP_OPEN], n1tc=c1m[1:, GAP_TERM_OPEN],
        s1go=s1[1:, GAP_OPEN], s1ge=s1[1:, GAP_EXT],
        s1gto=s1gto, s1gte=s1gte,
        g1so=g1[0][1:], g1se=g1[1][1:], g1sto=g1[2][1:],
        g1ste=g1[3][1:], g1ce=g1[4][1:], g1cte=g1[5][1:],
        v0_cost=jnp.where(ii == 1, s1gto * card2, s1gte * card2),
        w1m1=(w1 - 1).astype(jnp.int32),
        # default (unguided) band: full row range [0, w2]
        blo=jnp.zeros(w1p, jnp.int32),
        bhi=jnp.broadcast_to(w2, (w1p,)).astype(jnp.int32),
    )
    return colp, xs


# ---------------------------------------------------------------------------
# on-device traceback: pull only the O(W) path, never the O(W^2) matrices
# (the axon tunnel moves ~15 MB/s; a 2 MB direction-matrix pull costs more
# than the whole DP kernel)
# ---------------------------------------------------------------------------
import os as _os

_TB_T = int(_os.environ.get("FAMSA_TPU_TB_T", "32"))  # traceback window


def _traceback_one(dirs_m, w1, w2, dir0, nsteps):
    """Tiled traceback walk.  dirs_m: [w1p, w2pe] packed i32, row r = DP
    row r+1 (DP row 0 is the constant ROW0_PACK boundary).  Walks from
    (w1, w2) with initial channel dir0; returns emits [~nsteps] i32 with
    sentinel 3 after done.  Mirrors core/construct.py:_trace_path.

    Each lax.scan iteration loads ONE [T, T] window around the cursor and
    walks T-1 steps inside it (every step moves up and/or left by one, so
    T-1 steps cannot leave the window) - (T-1)x fewer gather round trips
    than a per-step walk.  Boundary cells are analytic: DP row 0 reads
    ROW0_PACK (every channel -> H) and DP col 0 cells are stored as
    COL0_PACK (every channel -> V), so windows never straddle the virtual
    row."""
    T = _TB_T
    iters = -(-nsteps // (T - 1))

    def outer(carry, _):
        i, j, d, done = carry
        r0 = jnp.maximum(i - T, 0)
        c0 = jnp.maximum(j - T + 1, 0)
        win = jax.lax.dynamic_slice(dirs_m, (r0, c0), (T, T)).reshape(T * T)
        li = i - 1 - r0
        lj = j - c0

        emits = []
        for _s in range(T - 1):
            at_i0 = (i == 0) & (j > 0)
            at_j0 = (j == 0) & (i > 0)
            flat = jnp.maximum(li * T + lj, 0)
            cell = jax.lax.dynamic_slice(win, (flat,), (1,))[0]
            nd = jax.lax.shift_right_logical(
                cell, (2 * d).astype(jnp.int32)) & jnp.int32(3)
            nd = jnp.where(at_i0, jnp.int32(_H), nd)
            nd = jnp.where(at_j0, jnp.int32(_V), nd)
            emit = jnp.where(done, jnp.int32(3), nd)
            di = ((d == _D) | (d == _V)).astype(jnp.int32)
            dj = ((d == _D) | (d == _H)).astype(jnp.int32)
            act = (~done).astype(jnp.int32)
            i = i - di * act
            j = j - dj * act
            li = li - di * act
            lj = lj - dj * act
            d = jnp.where(done, d, nd)
            done = (i == 0) & (j == 0)
            emits.append(emit)
        return (i, j, d, done), jnp.stack(emits)

    init = (w1.astype(jnp.int32), w2.astype(jnp.int32),
            dir0.astype(jnp.int32), (w1 == 0) & (w2 == 0))
    _, em = jax.lax.scan(outer, init, None, length=iters)
    return em.reshape(iters * (T - 1))


def _rj_maxr(w1p, w2pe, tw):
    """RLE SLOT bound for _traceback_runs (every active step writes a
    2-slot stride).  Valid-path census: single steps S1 <= w1 (each
    consumes one i-decrement); stop-pairs P <= S1 + 1 (a stop hands d to
    D/V, so a single step follows); window-edge (nostop) runs N <= S1 +
    P + w2/tw + 2 (consecutive nostops each consume a full tw-wide
    window).  Active steps <= S1 + P + N + tails <= 4*w1 + w2/tw + c."""
    return 2 * (4 * w1p + w2pe // tw + 16)


def _traceback_runs(dirs_m, w1, w2, dir0, nsteps, tr=8, tw=512):
    """Run-jumping traceback: same emits contract as _traceback_one
    (emits [nsteps] i32, 2-bit codes then sentinel 3), but whole
    H-channel runs collapse into ONE masked-reduce step instead of
    per-cell walks.  The serial per-cell walk costs ~1.2 us/step on TPU
    (~11 ms for a chain-shaped giant merge, measured scripts/
    giant_profile.py); chain paths are H-dominant (w2 >> w1), so jumping
    H-runs bounds the serial work by the D/V step count (~w1) instead of
    the path length (~w2).

    The walk writes (code, len) RLE entries; a vectorized interval-
    membership pass expands them to the dense emits array.  Exact only
    for dirs matrices produced by the DP kernels (valid traceback paths
    never step outside the [0..w1]x[0..w2] grid)."""
    w1p, w2pe = dirs_m.shape
    tr = min(tr, w1p)
    tw = min(tw, w2pe)
    maxr = _rj_maxr(w1p, w2pe, tw)
    riota = jnp.arange(tr, dtype=jnp.int32)[:, None]
    liota = jnp.arange(tw, dtype=jnp.int32)
    cH, cV = jnp.int32(_H), jnp.int32(_V)

    def body(st):
        i, j, d, done, nr, codes, lens = st
        r0 = jnp.clip(i - tr, 0, w1p - tr)
        c0 = jnp.clip(j - tw + 1, 0, w2pe - tw)
        win = jax.lax.dynamic_slice(dirs_m, (r0, c0), (tr, tw))
        li = i - 1 - r0
        lj = j - c0

        for _u in range(8):
            act = ~done & ((li >= 0) & (lj >= 0) | (i == 0) | (j == 0))
            tailH = (i == 0) & (j > 0) & (d == _H)
            tailV = (j == 0) & (i > 0) & (d == _V)
            rowv = jnp.sum(jnp.where(riota == li, win, 0), axis=0,
                           dtype=jnp.int32)                      # [tw]
            cell = jnp.sum(jnp.where(liota == lj, rowv, 0),
                           dtype=jnp.int32)
            # --- exact single-step (the _traceback_one formulas) ---
            at_i0 = (i == 0) & (j > 0)
            at_j0 = (j == 0) & (i > 0)
            nd1 = jax.lax.shift_right_logical(
                cell, (2 * d).astype(jnp.int32)) & jnp.int32(3)
            nd1 = jnp.where(at_i0, cH, nd1)
            nd1 = jnp.where(at_j0, cV, nd1)
            di = ((d == _D) | (d == _V)).astype(jnp.int32)
            dj = ((d == _D) | (d == _H)).astype(jnp.int32)
            # --- H-run jump (d == H, i >= 1, j >= 1) ---
            fH = jax.lax.shift_right_logical(rowv, jnp.full(
                rowv.shape, 2, rowv.dtype)) & jnp.int32(3)
            stopm = (fH != _H) & (liota <= lj)
            spos = jnp.max(jnp.where(stopm, liota, -1))
            xcode = jnp.sum(jnp.where(liota == spos, fH, 0),
                            dtype=jnp.int32)
            nostop = spos < 0
            run = jnp.where(nostop, lj + 1, lj - spos)
            hrun = act & (d == _H) & (i > 0) & (j > 0)

            # entry selection (two slots per active step)
            e1c = jnp.where(tailH, cH,
                            jnp.where(tailV, cV,
                                      jnp.where(hrun, cH, nd1)))
            e1l = jnp.where(tailH, j,
                            jnp.where(tailV, i,
                                      jnp.where(hrun, run, jnp.int32(1))))
            e2c = jnp.where(hrun & ~nostop, xcode, jnp.int32(3))
            e2l = jnp.where(hrun & ~nostop, jnp.int32(1), jnp.int32(0))

            ni = jnp.where(tailH | tailV, jnp.int32(0),
                           jnp.where(hrun, i, i - di))
            nj = jnp.where(tailH, jnp.int32(0),
                           jnp.where(tailV, j,
                                     jnp.where(hrun,
                                               jnp.where(nostop, j - lj - 1,
                                                         j - run - 1),
                                               j - dj)))
            nli = jnp.where(hrun, li, li - di)
            nlj = jnp.where(hrun,
                            jnp.where(nostop, jnp.int32(-1), spos - 1),
                            lj - dj)
            ndn = jnp.where(tailH | tailV, d,
                            jnp.where(hrun,
                                      jnp.where(nostop, cH, xcode), nd1))

            codes = jax.lax.dynamic_update_slice(
                codes, jnp.stack([e1c, e2c]), (nr,))
            lens = jax.lax.dynamic_update_slice(
                lens, jnp.stack([jnp.where(act, e1l, 0),
                                 jnp.where(act, e2l, 0)]), (nr,))
            nr = jnp.where(act, nr + 2, nr)
            i = jnp.where(act, ni, i)
            j = jnp.where(act, nj, j)
            li = jnp.where(act, nli, li)
            lj = jnp.where(act, nlj, lj)
            d = jnp.where(act, ndn, d)
            # i/j < 0 is unreachable on valid DP paths; stop rather than
            # spin (invalid inputs produce different junk than
            # _traceback_one, which keeps walking - acceptable)
            done = done | tailH | tailV | ((i == 0) & (j == 0)) \
                | (i < 0) | (j < 0)
        return (i, j, d, done, nr, codes, lens)

    def cond(st):
        return (~st[3]) & (st[4] < maxr - 2)

    init = (w1.astype(jnp.int32), w2.astype(jnp.int32),
            dir0.astype(jnp.int32), (w1 == 0) & (w2 == 0),
            jnp.int32(0),
            jnp.full((maxr,), 3, jnp.int32), jnp.zeros((maxr,), jnp.int32))
    _, _, _, _, _, codes, lens = jax.lax.while_loop(cond, body, init)

    # RLE -> dense emits: interval membership, BLOCKED - a step block of
    # B covers at most 2B+4 RLE slots (every active step writes a 2-slot
    # stride and consumes >= 1 path step), so each block compares
    # against a dynamic slice of the entry arrays instead of all maxr
    # (the full [nsteps, maxr] compare tensor dominates at giant shapes).
    # A codes[idx] gather would lower to a serial loop on TPU.
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lens, dtype=jnp.int32)])
    total = starts[maxr]
    B = 512
    nb = -(-nsteps // B)
    me = 2 * B + 8
    starts_pad = jnp.concatenate(
        [starts, jnp.full((me,), jnp.int32(0x7FFFFFFF))])
    codes_pad = jnp.concatenate([codes, jnp.full((me,), 3, jnp.int32)])
    # first slot whose interval can intersect block b: the last slot
    # with start <= b*B (cumulative starts are non-decreasing)
    bidx = jnp.arange(nb, dtype=jnp.int32) * B
    r0 = jnp.sum((starts[None, :maxr] <= bidx[:, None]).astype(jnp.int32),
                 axis=1) - 1
    r0 = jnp.clip(r0, 0, maxr - 1)
    pb = jnp.arange(B, dtype=jnp.int32)

    def blk(_, inp):
        b0, rr = inp
        st = jax.lax.dynamic_slice(starts_pad, (rr,), (me + 1,))
        cd = jax.lax.dynamic_slice(codes_pad, (rr,), (me,))
        p = (b0 + pb)[:, None]
        inside = (p >= st[None, :me]) & (p < st[None, 1:])
        return _, jnp.sum(jnp.where(inside, cd[None], 0), axis=1,
                          dtype=jnp.int32)

    _, eb = jax.lax.scan(blk, 0, (bidx, r0))
    emits = eb.reshape(nb * B)[:nsteps]
    p = jnp.arange(nsteps, dtype=jnp.int32)
    return jnp.where(p < total, emits, jnp.int32(3))


def _tb_impl(colp, xs, w1v, w2v, sb, blk, w1p, w2p, banded=False,
             interpret=False,
             single=False, tb=None, fin0=0, smallc=False):
    """DP kernel + on-device traceback in ONE program.  w1v/w2v: [G*sb] i32
    true widths.  Returns a packed i32 array [B, S/16 + 3]
    (emit words..., dir0, total_hi, total_lo).  Direction matrices never
    leave the device."""
    w2pe = w2p + LANE_PAD
    g = colp["s2"].shape[0]
    b = g * sb

    dirs_i32, fins = _dp_pallas_raw(colp, xs, sb, blk, w1p, w2p, interpret,
                                    single, banded=banded, tb=tb,
                                    fin0=fin0, smallc=smallc)
    # [G, w1p, sb, w2pe] -> [B, w1p, w2pe]
    dirs_m = dirs_i32.transpose(0, 2, 1, 3).reshape(b, w1p, w2pe)

    # final-row (hi, lo) triples per merge: fins[g, w1-1, s, :] - a masked
    # reduce instead of take_along_axis (TPU gathers serialize)
    fins_b = fins.transpose(0, 2, 1, 3).reshape(b, w1p, 8)
    idx = jnp.maximum(w1v.astype(jnp.int32) - 1, 0)
    rsel = (jnp.arange(w1p, dtype=jnp.int32)[None, :] == idx[:, None])
    f = jnp.sum(jnp.where(rsel[:, :, None], fins_b, 0), axis=1,
                dtype=jnp.int32)                 # [B, 8]

    def join(hi, lo):
        return (hi.astype(jnp.int64) << np.int64(32)) | \
               (lo.astype(jnp.int64) & np.int64(0xFFFFFFFF))

    d0 = join(f[:, 0], f[:, 1])
    h0 = join(f[:, 2], f[:, 3])
    v0 = join(f[:, 4], f[:, 5])
    pick_d = (d0 >= h0) & (d0 >= v0)
    pick_h = (~pick_d) & (h0 > v0)
    dir0 = jnp.where(pick_d, jnp.int32(_D),
                     jnp.where(pick_h, jnp.int32(_H), jnp.int32(_V)))
    total = jnp.where(pick_d, d0, jnp.where(pick_h, h0, v0))

    emits = jax.vmap(_traceback_one, in_axes=(0, 0, 0, 0, None))(
        dirs_m, w1v, w2v, dir0, w1p + w2p)
    # ONE packed i32 output: every device->host pull costs a ~26 ms tunnel
    # round trip and ~40 MB/s, so emits (2-bit codes incl. the '3' done
    # sentinel) are packed 16-per-word and ride with dir0/total in a single
    # array [B, S/16 + 3]: words..., dir0, total_hi, total_lo
    s = emits.shape[1]
    sp = -(-s // 16) * 16
    if sp > s:
        emits = jnp.concatenate(
            [emits, jnp.full((b, sp - s), 3, jnp.int32)], axis=1)
    ew = emits.reshape(emits.shape[0], sp // 16, 16)
    shifts = (2 * jnp.arange(16, dtype=jnp.int32))[None, None, :]
    packed_e = jnp.sum(ew << shifts, axis=2, dtype=jnp.int32)
    tot_hi = (total >> np.int64(32)).astype(jnp.int32)
    tot_lo = total.astype(jnp.int32)
    packed = jnp.concatenate(
        [packed_e, dir0[:, None], tot_hi[:, None], tot_lo[:, None]], axis=1)
    return packed, emits, dir0


def _forward_paths(emits, dir0):
    """Reversed walk emits [B, S] (sentinel 3 beyond the path) + initial
    channel dir0 [B] -> forward path codes [B, S] (construct's move list:
    emits reversed, boundary cut dropped, dir0 appended; sentinel 3
    beyond).  The reversal is ONE dynamic slice of the flipped array
    (rev[k] = e[m-2-k] = flip(e)[S+1-m+k]) - the index-vector gather it
    replaces lowers to a serial loop on TPU."""
    S = emits.shape[1]
    k = jnp.arange(S, dtype=jnp.int32)

    def one(e, d0):
        m = jnp.sum((e != 3).astype(jnp.int32))
        ext = jnp.concatenate([jnp.flip(e), jnp.full((S,), 3, jnp.int32)])
        rev = jax.lax.dynamic_slice(ext, (jnp.clip(S + 1 - m, 0, S),), (S,))
        return jnp.where(k == m - 1, d0,
                         jnp.where(k < m - 1, rev, jnp.int32(3)))

    return jax.vmap(one)(emits, dir0)


def _tb_counters_impl(c1s, c2s, w1v, w2v, card1v, card2v, sm, gp,
                      sb, blk, w1p, w2p, interpret, single, merged=False,
                      blo=None, bhi=None, mxu=None, nl=4, fin0=0,
                      smallc=False):
    b = c1s.shape[0]
    g = b // sb

    it = jnp.int32 if single else jnp.int64

    def one(c1, c2, w1, w2, k1, k2):
        return _stage0_one(c1, c2, w1, w2, k1, k2, sm, gp, w1p, w2p, it)

    colp, xs = jax.vmap(one)(c1s, c2s, w1v, w2v, card1v, card2v)
    tb = None
    if mxu is not None:
        tb_b = _mxu_tb(xs["c1"], colp["s2"], mxu)       # [B, w1p, w2pe]
        tb = tb_b.reshape(g, sb, w1p, tb_b.shape[2]).transpose(0, 2, 1, 3)
    banded = blo is not None
    if banded:
        # host-provided guided bands override stage 0's full-range default
        xs["blo"] = blo.astype(jnp.int32)
        xs["bhi"] = bhi.astype(jnp.int32)
    colp = {k: v.reshape((g, sb) + v.shape[1:]) for k, v in colp.items()}
    xs = {k: v.reshape((g, sb) + v.shape[1:]) for k, v in xs.items()}
    packed, emits, dir0 = _tb_impl(colp, xs, w1v, w2v, sb, blk, w1p, w2p,
                                   banded=banded, interpret=interpret,
                                   single=single, tb=tb, fin0=fin0,
                                   smallc=smallc)
    if not merged:
        return packed
    # device-resident result: merged counters from parents + forward path
    fwd = _forward_paths(emits, dir0)
    mc = jax.vmap(functools.partial(merged_counters_device, nl=nl),
                  in_axes=(0, 0, 0, 0, 0, 0, 0))(
        c1s, c2s, fwd, w1v, w2v, card1v, card2v)
    return packed, mc


@functools.partial(jax.jit, static_argnames=("gp", "sb", "blk", "w1p", "w2p",
                                             "interpret", "single", "merged",
                                             "mxu", "nl", "fin0", "smallc"))
def _dp_pallas_tb_counters(c1s, c2s, w1v, w2v, card1v, card2v, sm, gp,
                           sb, blk, w1p, w2p, interpret=False, single=False,
                           merged=False, blo=None, bhi=None, mxu=None, nl=4,
                           fin0=0, smallc=False):
    """Counters-in variant: c1s [B, w1p+1, 32], c2s [B, w2p+1, 32] (any int
    dtype, host OR device-resident), w1v/w2v/card1v/card2v [B] i32,
    sm [24,24] i64, gp static gap costs.  Stage 0 (scores, gap corrections,
    boundaries) runs on device.  merged=True additionally returns the
    merged profile counters [B, S+1, 32] i32 (device-resident: the next
    merge reads them without any host upload); nl = 7-bit limb count
    covering max(card1, card2) for the one-hot matmuls."""
    return _tb_counters_impl(c1s, c2s, w1v, w2v, card1v, card2v, sm, gp,
                             sb, blk, w1p, w2p, interpret, single, merged,
                             blo=blo, bhi=bhi, mxu=mxu, nl=nl, fin0=fin0,
                             smallc=smallc)


def _csc_dense(counts, syms, vals, wp, nl=4):
    """Reconstruct dense [B, wp+1, 32] i32 counters from the compact
    per-column encoding: counts [B, wp+1] (nonzeros per column), syms
    [B, nnzb] (symbol of each nonzero, column-major), vals [B, nnzb]
    (its count).  Padding entries have val 0 and contribute nothing.

    The scatter runs as an exact one-hot limb contraction on the MXU
    (out[c, s] = sum_k val[k] * [col_of[k]==c] * [syms[k]==s]; every f32
    partial sum < nnzb * 127 < 2^24) - XLA's scatter-add lowers to a
    serial loop on TPU.  searchsorted is likewise replaced by the dense
    rank count sum_c [cum[c] <= k]."""
    b, nnzb = syms.shape
    cum = jnp.cumsum(counts.astype(jnp.int32), axis=1)      # [B, wp+1]
    ks = jnp.arange(nnzb, dtype=jnp.int32)
    col_of = jnp.sum((cum[:, None, :] <= ks[None, :, None])
                     .astype(jnp.int32), axis=2)            # [B, nnzb]
    col_of = jnp.minimum(col_of, wp)
    oh_col = (col_of[..., None]
              == jnp.arange(wp + 1, dtype=jnp.int32)).astype(jnp.bfloat16)
    oh_sym = (syms.astype(jnp.int32)[..., None]
              == jnp.arange(32, dtype=jnp.int32)).astype(jnp.bfloat16)
    v = vals.astype(jnp.int32)
    out = None
    for l in range(nl):
        limb = ((v >> (7 * l)) & 127).astype(jnp.bfloat16)
        d = jax.lax.dot_general(
            oh_col * limb[..., None], oh_sym,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.int32) << (7 * l)
        out = d if out is None else out + d
    return out


@functools.partial(jax.jit, static_argnames=("gp", "sb", "blk", "w1p", "w2p",
                                             "interpret", "single", "merged",
                                             "mxu", "nl", "fin0", "smallc"))
def _dp_pallas_tb_csc(cnt1, sym1, val1, cnt2, sym2, val2, w1v, w2v,
                      card1v, card2v, sm, gp, sb, blk, w1p, w2p,
                      interpret=False, single=False, merged=False,
                      blo=None, bhi=None, mxu=None, nl=4, fin0=0,
                      smallc=False):
    """Compact-upload variant: a profile column holds a handful of distinct
    symbols, so the host ships per-column nonzero counts (i8) + symbol ids
    (i8) + count values (i8/i16) instead of the dense [w, 32] tensor - the
    dominant cost of a dispatch through the tunnel is the host->device
    transfer (~26 ms + bytes/40 MB/s)."""
    c1s = _csc_dense(cnt1, sym1, val1, w1p, nl=nl)
    c2s = _csc_dense(cnt2, sym2, val2, w2p, nl=nl)
    return _tb_counters_impl(c1s, c2s, w1v, w2v, card1v, card2v, sm, gp,
                             sb, blk, w1p, w2p, interpret, single, merged,
                             blo=blo, bhi=bhi, mxu=mxu, nl=nl, fin0=fin0,
                             smallc=smallc)


def _csc_pack(pairs, n, b, side, wp):
    """Compact counter upload for profile side 0/1: (counts [B, wp+1] i8,
    syms [B, nnzb] i8, vals [B, nnzb] smallest-int) in column-major
    nonzero order (np.nonzero is row-major over [w, 32] = column-major in
    DP-column terms, matching _csc_dense's searchsorted assignment)."""
    cnt = np.zeros((b, wp + 1), dtype=np.int8)
    nzs = []
    for k in range(b):
        p = pairs[min(k, n - 1)][side]
        ii, ss = np.nonzero(p.counters)
        np.add.at(cnt[k], ii, 1)
        nzs.append((ss, p.counters[ii, ss]))
    nnz_max = max(len(ss) for ss, _ in nzs)
    nnzb = 256
    while nnzb < nnz_max:
        nnzb *= 2
    syms = np.zeros((b, nnzb), dtype=np.int8)
    vals = np.zeros((b, nnzb), dtype=np.int64)
    for k, (ss, v) in enumerate(nzs):
        syms[k, :len(ss)] = ss
        vals[k, :len(v)] = v
    return cnt, syms, _shrink(vals)


class MergedRef:
    """Lazy view of ONE merge's counters inside a batched device tensor
    mc [B, S+1, 32] i32 (merged_counters_device output; rows beyond the
    true width are zero).  resolve() hands these out instead of eager
    per-merge slices: through the axon tunnel every device op dispatch
    costs ~1-2 ms even without a pull, so the slice is deferred until
    _assemble_side, which cuts straight to the consumer's bucket width
    in a single op (usually zero ops: mc rows >= wp+1, one slice)."""
    __slots__ = ("batch", "k", "rows")

    def __init__(self, batch, k, rows):
        self.batch = batch          # [B, S+1, 32] i32, on device
        self.k = k                  # merge index within the batch
        self.rows = rows            # true width + 1 (valid row count)

    def tensor(self):
        """[rows, 32] i32 device array of the true-width counters."""
        return self.batch[self.k, :self.rows]

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self.tensor())
        return a if dtype is None else a.astype(dtype)


class JaxPathResult:
    """DP result carrying the traceback path directly (device traceback);
    construct's _trace_path short-circuits on .path.  merged_dev, when
    present, is the merged profile's counter tensor [width+1, 32] i32
    LIVING ON DEVICE (feeds the children's next merge without an
    upload)."""
    __slots__ = ("path", "total", "merged_dev")

    def __init__(self, path, total, merged_dev=None):
        self.path = path
        self.total = total
        self.merged_dev = merged_dev


def _profile_bound_stats(p):
    """Per-profile magnitude statistics for _merge_i32_bound / _mxu_cfg,
    cached on the Profile (keyed by counters identity): the bound used to
    recompute them per PAIR per DISPATCH - ~35 ms of host time per
    32-merge batch, serial with the device."""
    cached = getattr(p, "_dp_stats", None)
    if cached is not None and cached[0] is p.counters:
        return cached[1]
    from .dp_jax import _gap_correction_arrays
    params = p.params
    card = len(p.data)
    c = p.counters.astype(np.int64)
    s = p.scores

    def mx(a):
        return int(np.abs(a).max(initial=0))

    g = _gap_correction_arrays(c, p.width, card)
    m2s = np.abs(s[:, :NO_AMINOACIDS_AND_GAPS]).max(axis=0)
    g2chg = (c[:, GAP_OPEN] * (params.gap_ext - params.gap_open)
             + c[:, GAP_TERM_OPEN]
             * (params.gap_term_ext - params.gap_term_open))
    st = dict(
        card=card,
        g_abs=tuple(mx(x) for x in g),
        m2s=m2s, m2s_max=int(m2s.max(initial=0)),
        sgo=mx(s[:, GAP_OPEN]), sge=mx(s[:, GAP_EXT]),
        sgto=mx(s[:, GAP_TERM_OPEN]), sgte=mx(s[:, GAP_TERM_EXT]),
        dE=mx(s[:, GAP_EXT] - s[:, GAP_OPEN]),
        dT=mx(s[:, GAP_TERM_EXT] - s[:, GAP_TERM_OPEN]),
        g2chg=mx(g2chg),
        c_go=int(c[:, GAP_OPEN].max(initial=0)),
        c_gto=int(c[:, GAP_TERM_OPEN].max(initial=0)),
        colnng=int(c[:, :NO_AMINOACIDS].sum(axis=1).max(initial=0)),
    )
    try:
        p._dp_stats = (p.counters, st)
    except AttributeError:
        pass                        # non-Profile stand-ins in tests
    return st


def _merge_i32_bound(params, p1, p2):
    """Upper bound on |any i32 cost value or partial sum| the single-word
    kernel computes for this merge, from the ACTUAL score magnitudes (not
    the worst-case 3*card1*card2*C): match-score prefix sums, tmH/tmV
    corrections, and the rank<=4 gap matrices gvs/gvc/ghs/ghc.  Value-
    identical to the pre-cache formulation (same maxima, same terms)."""
    st1 = _profile_bound_stats(p1)
    st2 = _profile_bound_stats(p2)
    card1, card2 = st1["card"], st2["card"]

    # t prefix sums: sum_s c1[r, s] * max_j |s2[j, s]|, maxed over rows -
    # the only cross-profile term that needs the counter matrix
    c1s = p1.counters[:, :NO_AMINOACIDS_AND_GAPS]
    if c1s.dtype != np.int64:
        c1s = c1s.astype(np.int64)
    t_b = int((c1s @ st2["m2s"]).max(initial=0))

    tmH_b = t_b + st1["c_go"] * st2["dE"] + st1["c_gto"] * st2["dT"]
    tmV_b = t_b + st1["colnng"] * st2["g2chg"]
    gvs_b = (st1["sgo"] * st2["g_abs"][0] + st1["sge"] * st2["g_abs"][1]
             + st1["sgto"] * st2["g_abs"][2] + st1["sgte"] * st2["g_abs"][3])
    v0_b = card2 * max(st1["sgto"], st1["sgte"])
    gvc_b = max(st1["sge"] * st2["g_abs"][4] + st1["sgte"] * st2["g_abs"][5],
                v0_b)
    ghs_b = (st1["g_abs"][0] * st2["sgo"] + st1["g_abs"][1] * st2["sge"]
             + st1["g_abs"][2] * st2["sgto"] + st1["g_abs"][3] * st2["sgte"])
    ghc_b = st1["g_abs"][4] * st2["sge"] + st1["g_abs"][5] * st2["sgte"]
    # raw factors stored as single i32 words must themselves fit, even
    # when every product they enter is small (e.g. a gapless profile2)
    raw_b = max(st2["m2s_max"],
                st1["sgo"], st1["sge"], st1["sgto"], st1["sgte"],
                st2["sgo"], st2["sge"], st2["sgto"], st2["sgte"],
                st2["g2chg"])
    # stage-0 recomputes the score columns in i32 in single mode: its
    # partial sums are bounded by card * (max |SM entry| + sum |gap cost|)
    # even when the final scores cancel to small values
    stage0_b = max(card1, card2) * (
        int(np.abs(params.score_matrix).max())
        + sum(abs(int(x)) for x in (params.gap_open, params.gap_ext,
                                    params.gap_term_open,
                                    params.gap_term_ext)))
    return max(t_b, tmH_b, tmV_b, gvs_b, gvc_b, ghs_b, ghc_b, raw_b,
               stage0_b)


def _single_word_ok(params, pairs):
    """True iff every i32 cost value/partial sum of every merge provably
    fits i32 (data-driven per-merge bounds; see _merge_i32_bound)."""
    return all(_merge_i32_bound(params, p1, p2) < 2 ** 31
               for p1, p2 in pairs)


_MXU_OFF = _os.environ.get("FAMSA_TPU_DP_MXU", "1") != "1"


def _mxu_cfg(pairs):
    """Static (l1, l2, b2log) for _mxu_tb, or None when the limb budget
    doesn't cover the batch: counts need l1 <= 2 7-bit limbs (card <
    16384), biased scores l2 <= 3 (|s2| < 2^20).  b2log is quantized to
    {6, 13, 20} to bound the number of compiled variants.  Beyond 3 score
    limbs the XLA limb-combine epilogue (4x convert/shift/add passes over
    the [B, w1p, w2pe] tb tensor) costs more than the in-kernel 30-term
    MAC it replaces (measured: 43.3 ms MAC vs 49.3 ms 4-limb MXU for a
    32 x 2048^2 batch), so those configs stay on the VPU MAC."""
    if _MXU_OFF:
        return None
    maxcard = max(len(p1.data) for p1, _ in pairs)
    l1 = 1 if maxcard < 128 else 2 if maxcard < 16384 else None
    if l1 is None:
        return None
    m2s = max(_profile_bound_stats(p2)["m2s_max"] for _, p2 in pairs)
    for b2log in (6, 13, 20):
        if m2s < (1 << b2log):
            return (l1, (b2log + 1) // 7, b2log)
    return None


class PendingPaths:
    """In-flight batched DP dispatch: a single packed device array
    [B, S/16+3] (emits..., dir0, total_hi, total_lo) not yet pulled, plus
    (optionally) the merged counter tensor that STAYS on device.
    resolve() blocks, pulls the O(W) paths in ONE transfer and returns
    [JaxPathResult].  Dispatching several batches before resolving
    pipelines host packing + uploads against device compute."""

    def __init__(self, packed, n, merged=None):
        self._packed = packed
        self._n = n
        self._merged = merged

    def resolve(self):
        arr = np.asarray(self._packed)
        words = arr[:, :-3].astype(np.uint32)
        emits = ((words[:, :, None] >> (2 * np.arange(16, dtype=np.uint32)))
                 & np.uint32(3)).reshape(arr.shape[0], -1).astype(np.int32)
        dir0 = arr[:, -3]
        total = (arr[:, -2].astype(np.int64) << np.int64(32)) | \
            (arr[:, -1].astype(np.int64) & np.int64(0xFFFFFFFF))
        out = []
        for k in range(self._n):
            e = emits[k]
            stop = np.argmax(e == 3) if (e == 3).any() else len(e)
            full = [int(dir0[k])] + [int(x) for x in e[:stop]]
            full.reverse()
            md = None
            if self._merged is not None and stop + 1 <= self._merged.shape[1]:
                # lazy device-side view (no slice op, no pull); giant
                # results are truncated to a fixed row count, so a wider
                # merge than that hands out no device counters
                md = MergedRef(self._merged, k, stop + 1)
            out.append(JaxPathResult(full[1:], int(total[k]), md))
        return out


@functools.partial(jax.jit, static_argnames=("wp",))
def _leaf_counters_dev_b(syms, wp):
    """Batched ungapped-leaf profile counters from symbol bytes: the leaf
    upload is [B, wp] i8 instead of [B, wp+1, 32] (32x less through the
    tunnel); counters[k, 1+j, syms[k, j]] = 1.  Symbols are padded with
    the GUARD code 31 - the bogus one-hots land beyond the true width,
    where no consumer reads (stage 0 masks rows > w, the merged-counter
    gathers stop at w)."""
    oh = (syms[:, :, None].astype(jnp.int32)
          == jnp.arange(32, dtype=jnp.int32)[None, None]).astype(jnp.int32)
    out = jnp.zeros((syms.shape[0], wp + 1, 32), jnp.int32)
    return out.at[:, 1:wp + 1].set(oh)


@jax.jit
def _stack_rows(rows):
    """Stack a list of [wp+1, 32] device arrays in ONE jitted dispatch -
    the eager jnp.stack costs ~13 ms through the axon tunnel."""
    return jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("wp",))
def _assemble_combine(host_c, leaf_syms, leaf_mask, groups, wp):
    """Fused side assembly (one dispatch): dense host upload (or zeros),
    leaf one-hots, and per-source-batch gathers of device-resident
    counters.  host_c/leaf_* may be None (pytree structure selects the
    trace); groups is a list of (batch, src_ids, mask)."""
    if host_c is not None:
        out = host_c.astype(jnp.int32)
    else:
        b = (leaf_mask.shape[0] if leaf_mask is not None
             else groups[0][2].shape[0])
        out = jnp.zeros((b, wp + 1, 32), jnp.int32)
    if leaf_syms is not None:
        out = jnp.where(leaf_mask[:, None, None],
                        _leaf_counters_dev_b(leaf_syms, wp=wp), out)
    for batch, src, mask in groups:
        got = batch[src, :wp + 1]
        out = jnp.where(mask[:, None, None], got, out)
    return out


def _assemble_side(pairs, dev_pairs, n, b, side, wp):
    """[B, wp+1, 32] i32 device tensor for one merge side, in O(1) device
    DISPATCHES (every eager op through the axon tunnel costs ~1-2 ms even
    without a pull, and a bare eager stack ~13 ms): device-resident
    parent counters are gathered once per source batch (MergedRefs from
    one resolved dispatch share their tensor) and masked in; ungapped
    leaves upload only their symbol bytes, one-hotted on device in one
    batched op; other host-only profiles ride a single dense upload - all
    fused into one jitted program (_assemble_combine)."""
    host_c = None                    # lazily-allocated dense upload
    leaf_syms = None                 # [b, wp] i8 symbol upload
    leaf_mask = np.zeros(b, dtype=bool)
    groups = {}                      # id(batch) -> [batch, src_ids, mask]
    misc = []                        # rare: (k, oddly-shaped device array)
    for k in range(b):
        d = dev_pairs[min(k, n - 1)][side]
        if isinstance(d, MergedRef):
            if d.batch.shape[1] >= wp + 1:
                g = groups.setdefault(
                    id(d.batch),
                    [d.batch, np.zeros(b, np.int32), np.zeros(b, bool)])
                g[1][k] = d.k
                g[2][k] = True
                continue
            d = d.tensor()           # narrower than the target bucket
        if d is None:
            p = pairs[min(k, n - 1)][side]
            gs = p.data[0] if len(p.data) == 1 else None
            if gs is not None and int(gs.n_gaps.sum()) == 0 \
                    and gs.size <= wp:
                if leaf_syms is None:
                    leaf_syms = np.full((b, wp), 31, dtype=np.int8)
                leaf_syms[k, :gs.size] = gs.symbols
                leaf_mask[k] = True
                continue
            if host_c is None:
                host_c = np.zeros((b, wp + 1, 32), dtype=np.int8)
            if len(p.data) >= 128 and host_c.dtype == np.int8:
                host_c = host_c.astype(np.int32)
            host_c[k, :p.width + 1] = p.counters
        elif d.shape[0] > wp + 1:
            misc.append((k, d[:wp + 1]))
        elif d.shape[0] < wp + 1:
            misc.append((k, jnp.zeros((wp + 1, 32), jnp.int32)
                         .at[:d.shape[0]].set(d)))
        else:
            misc.append((k, d))

    if misc and len(misc) == b:
        # all sides are plain resident arrays (e.g. bench steady state):
        # one jitted stack, no base tensor
        return _stack_rows([row for _, row in misc])
    out = _assemble_combine(
        host_c, leaf_syms if leaf_syms is None else jnp.asarray(leaf_syms),
        None if leaf_syms is None else jnp.asarray(leaf_mask),
        [(batch, jnp.asarray(src), jnp.asarray(mask))
         for batch, src, mask in groups.values()],
        wp=wp)
    if misc:
        # rare mixed case: oddly-shaped resident arrays patched in eagerly
        idx = np.array([k for k, _ in misc])
        out = out.at[idx].set(jnp.stack([row for _, row in misc]))
    return out


def dp_profile_pallas_paths_async(params, pairs, sb=None, interpret=False,
                                  single=None, force_dense=False,
                                  dev_pairs=None, want_merged=False,
                                  bands=None):
    """Batched DP + device traceback, dispatched without blocking: returns
    a PendingPaths.  The host uploads only the nonzero counter entries
    (per-column compact encoding, see _csc_pack) or narrow dense counters
    and pulls only the O(W) paths, 2-bit packed.

    dev_pairs: optional [(dev1|None, dev2|None)] aligned with pairs -
    device-resident counter tensors for sides whose profiles were merged
    on device (see merged_counters_device); those sides upload NOTHING.
    want_merged=True computes each merge's counters on device and hands
    them back in the results' .merged_dev (still on device).

    bands: optional [(lo, hi)|None] aligned with pairs - guided-alignment
    row ranges (find_row_ranges output, DP-row indexed arrays [w1+2]);
    cells outside the band read -inf exactly like the host's banded DP
    (reference profile_seq.cpp:540-545)."""
    n = len(pairs)
    if sb is None:
        sb = 8 if n >= 5 else 1
    if single is None:
        single = _single_word_ok(params, pairs)
    w1p = max(_pallas_bucket(p1.width) for p1, _ in pairs)
    w2p = max(_pallas_bucket(p2.width) for _, p2 in pairs)
    blk = _row_block(sb, w2p + LANE_PAD, single=single)

    g = (n + sb - 1) // sb
    b = g * sb

    mxu = _mxu_cfg(pairs) if single else None

    blo = bhi = None
    if bands is not None and any(bd is not None for bd in bands):
        blo_np = np.zeros((b, w1p), np.int32)
        bhi_np = np.empty((b, w1p), np.int32)
        for k in range(b):
            p1, p2 = pairs[min(k, n - 1)]
            bhi_np[k] = p2.width
            bd = bands[min(k, n - 1)]
            if bd is not None:
                lo, hi = bd
                # kernel row r computes DP row r+1
                blo_np[k, :p1.width] = lo[1:p1.width + 1]
                bhi_np[k, :p1.width] = hi[1:p1.width + 1]
        blo, bhi = jnp.asarray(blo_np), jnp.asarray(bhi_np)
    w1v = np.empty(b, dtype=np.int32)
    w2v = np.empty(b, dtype=np.int32)
    k1v = np.empty(b, dtype=np.int32)
    k2v = np.empty(b, dtype=np.int32)
    for k in range(b):
        p1, p2 = pairs[min(k, n - 1)]
        w1v[k], w2v[k] = p1.width, p2.width
        k1v[k], k2v[k] = len(p1.data), len(p2.data)

    gp = (int(params.gap_open), int(params.gap_ext),
          int(params.gap_term_open), int(params.gap_term_ext))
    sm = jnp.asarray(np.asarray(params.score_matrix, dtype=np.int64))
    common = (jnp.asarray(w1v), jnp.asarray(w2v),
              jnp.asarray(k1v), jnp.asarray(k2v), sm)

    # 7-bit limb count covering every parent counter value (static) for
    # the one-hot matmuls in _csc_dense / merged_counters_device
    nl = 1
    maxcard = int(max(k1v.max(), k2v.max()))
    while (1 << (7 * nl)) <= maxcard:
        nl += 1
    smallc = maxcard < 65536
    # first grid step that can hold some merge's final DP row: only the
    # uniform-width case (all w1 == w1p, e.g. the bench's steady-state
    # batches) skips the per-row last-column reduces - finer quantization
    # multiplied compiled kernel variants per bucket shape, and each
    # fresh Mosaic compile costs minutes through the tunnel
    nsteps = w1p // blk
    fin0 = nsteps - 1 if int(w1v.min()) == w1p else 0

    have_dev = dev_pairs is not None and any(
        d1 is not None or d2 is not None for d1, d2 in dev_pairs)
    if have_dev:
        c1s = _assemble_side(pairs, dev_pairs, n, b, 0, w1p)
        c2s = _assemble_side(pairs, dev_pairs, n, b, 1, w2p)
        packed = _dp_pallas_tb_counters(
            c1s, c2s, *common, gp=gp, sb=sb, blk=blk, w1p=w1p, w2p=w2p,
            interpret=interpret, single=single, merged=want_merged,
            blo=blo, bhi=bhi, mxu=mxu, nl=nl, fin0=fin0, smallc=smallc)
        if want_merged:
            packed, mc = packed
            return PendingPaths(packed, n, mc)
        return PendingPaths(packed, n)

    cnt1, sym1, val1 = _csc_pack(pairs, n, b, 0, w1p)
    cnt2, sym2, val2 = _csc_pack(pairs, n, b, 1, w2p)
    csc_bytes = (cnt1.nbytes + sym1.nbytes + val1.nbytes
                 + cnt2.nbytes + sym2.nbytes + val2.nbytes)
    dense_itemsize = _shrink(np.array([max(k1v.max(), k2v.max())],
                                      dtype=np.int64)).itemsize
    dense_bytes = b * (w1p + w2p + 2) * 32 * dense_itemsize

    if csc_bytes < 0.8 * dense_bytes and not force_dense:
        out = _dp_pallas_tb_csc(
            jnp.asarray(cnt1), jnp.asarray(sym1), jnp.asarray(val1),
            jnp.asarray(cnt2), jnp.asarray(sym2), jnp.asarray(val2),
            *common,
            gp=gp, sb=sb, blk=blk, w1p=w1p, w2p=w2p,
            interpret=interpret, single=single, merged=want_merged,
            blo=blo, bhi=bhi, mxu=mxu, nl=nl, fin0=fin0, smallc=smallc)
    else:
        # pack straight into the upload dtype (counts <= card)
        maxc = int(max(k1v.max(), k2v.max()))
        cdt = (np.int8 if maxc < 2 ** 7 else
               np.int16 if maxc < 2 ** 15 else
               np.int32 if maxc < 2 ** 31 else np.int64)
        c1s = np.zeros((b, w1p + 1, 32), dtype=cdt)
        c2s = np.zeros((b, w2p + 1, 32), dtype=cdt)
        for k in range(b):
            p1, p2 = pairs[min(k, n - 1)]
            c1s[k, :p1.width + 1] = p1.counters
            c2s[k, :p2.width + 1] = p2.counters
        out = _dp_pallas_tb_counters(
            jnp.asarray(c1s), jnp.asarray(c2s), *common,
            gp=gp, sb=sb, blk=blk, w1p=w1p, w2p=w2p,
            interpret=interpret, single=single, merged=want_merged,
            blo=blo, bhi=bhi, mxu=mxu, nl=nl, fin0=fin0, smallc=smallc)
    if want_merged:
        packed, mc = out
        return PendingPaths(packed, n, mc)
    return PendingPaths(out, n)


def dp_profile_pallas_paths(params, pairs, sb=None, interpret=False,
                            single=None, force_dense=False, bands=None):
    """Blocking variant: dispatch one batch and pull its paths."""
    return dp_profile_pallas_paths_async(
        params, pairs, sb=sb, interpret=interpret, single=single,
        force_dense=force_dense, bands=bands).resolve()


def dp_profile_pallas_batched(params, pairs, sb=None, interpret=False,
                              single=False):
    """pairs: list of (p1, p2); same contract as dp_profile_jax_batched."""
    n = len(pairs)
    if sb is None:
        sb = 8 if n >= 5 else 1
    w1p = max(_pallas_bucket(p1.width) for p1, _ in pairs)
    w2p = max(_pallas_bucket(p2.width) for _, p2 in pairs)
    w2pe = w2p + LANE_PAD
    blk = _row_block(sb, w2pe, single=single)

    g = (n + sb - 1) // sb
    colps, xsps = [], []
    for k in range(g * sb):
        p1, p2 = pairs[min(k, n - 1)]
        c, x = _prepare_pallas(params, p1, p2, w1p, w2p)
        colps.append(c)
        xsps.append(x)

    def stack(ds):
        return {k: jnp.asarray(_shrink(
            np.stack([d[k] for d in ds]).reshape((g, sb) + np.shape(ds[0][k]))))
            for k in ds[0]}

    dirs, fins = _dp_pallas(stack(colps), stack(xsps), sb, blk, w1p, w2p,
                            interpret=interpret, single=single)
    dirs = np.asarray(dirs)
    fins = np.asarray(fins)

    out = []
    for k, (p1, p2) in enumerate(pairs):
        gi, si = k // sb, k % sb
        res = JaxDPResult()
        d = dirs[k]
        res.dirs_D = (d & 3).astype(np.uint8)
        res.dirs_H = ((d >> 2) & 3).astype(np.uint8)
        res.dirs_V = ((d >> 4) & 3).astype(np.uint8)
        f = fins[gi, p1.width - 1, si].astype(np.int64)

        def join(hi, lo):
            return int((hi << np.int64(32)) | (lo & np.int64(0xFFFFFFFF)))

        res.last = (join(f[0], f[1]), join(f[2], f[3]), join(f[4], f[5]))
        out.append(res)
    return out


# ---------------------------------------------------------------------------
# device-resident profiles: merged counters computed ON DEVICE from the
# parent counters and the traceback path, so progressive merges never
# re-upload counter tensors (the host->device tunnel is the production
# bottleneck: a dense counter batch is ~8 MB vs ~40 MB/s).
# Mirrors core/construct.py:construct_profile's counter merging exactly
# (reference ConstructProfile, profile.cpp:694-1002): gap-category columns
# via the start/continue rules and the open->ext transfer corrections.
# ---------------------------------------------------------------------------
def _onehot_rows(oh, mat, nl):
    """Exact row gather as a one-hot MXU matmul: oh [S, W] bf16 one-hot
    (all-zero rows allowed), mat [W, C] i32 with 0 <= value < 2^(7*nl).
    Values are split into 7-bit limbs (exact in bf16; every f32 partial
    sum gathers at most one product < 128) - the same limb discipline as
    _mxu_tb.  Plain jnp.take over a traced row-index vector lowers to a
    serial gather loop on TPU (measured ~2.7 ms per 4096-row gather
    through XLA); this runs on the MXU instead."""
    out = None
    for l in range(nl):
        limb = ((mat >> (7 * l)) & 127).astype(jnp.bfloat16)
        d = jax.lax.dot_general(
            oh, limb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32) << (7 * l)
        out = d if out is None else out + d
    return out


def _gather_rows_monotone(c, pos, nl, B=512):
    """c[pos] and c[pos+1] for MONOTONE pos with per-step increments
    <= 1, via per-block local one-hots: a block of B steps spans <= B+2
    parent rows, so each one-hot is [B, B+2] against a dynamic slice of
    c.  The full [S, W] one-hot this replaces is ~570 MB of bf16 HBM
    traffic per gather at chain shapes (S ~ 17e3, W ~ 16e3) - measured
    as the dominant per-merge cost of the chain dispatcher."""
    S = pos.shape[0]
    C = c.shape[1]
    nb = -(-S // B)
    sp = nb * B
    posp = pos if sp == S else jnp.concatenate(
        [pos, jnp.broadcast_to(pos[-1:], (sp - S,))])
    posb = posp.reshape(nb, B)
    starts = posb[:, 0]
    cpad = jnp.concatenate(
        [c.astype(jnp.int32), jnp.zeros((B + 2, C), jnp.int32)])
    cols = jnp.arange(B + 2, dtype=jnp.int32)

    def blk(_, inp):
        pb, start = inp
        sl = jax.lax.dynamic_slice(cpad, (start, jnp.int32(0)), (B + 2, C))
        loc = pb - start
        ohc = (loc[:, None] == cols).astype(jnp.bfloat16)
        ohn = (loc[:, None] + 1 == cols).astype(jnp.bfloat16)
        return _, (_onehot_rows(ohc, sl, nl), _onehot_rows(ohn, sl, nl))

    _, (curb, nxtb) = jax.lax.scan(blk, 0, (posb, starts))
    return (curb.reshape(sp, C)[:S], nxtb.reshape(sp, C)[:S])


def merged_counters_device(c1, c2, emits, w1, w2, card1, card2, nl=4,
                           blocked=False):
    """c1 [w1p+1, 32], c2 [w2p+1, 32] (any int dtype), emits [S] i32 path
    codes (0=D 1=H 2=V, 3=done sentinel), w1/w2/card1/card2 i32 scalars.
    nl (static): 7-bit limbs covering every parent counter value
    (max(card1, card2) < 2^(7*nl)).  Returns merged counters [S+1, 32]
    i32 (row 0 zero, rows 1..width the merged columns, rows beyond the
    path zero).

    All row gathers along the path and the transfer scatter run as exact
    one-hot limb matmuls on the MXU (_onehot_rows): the
    XLA gather/scatter lowerings they replace executed serially on TPU
    and cost ~2.7 ms per merge - 2/3 of the whole DP dispatch.

    Key identities that make this vectorizable:
      - profile scores are a fixed linear function of counters, so only
        counters need to live on device (stage 0 re-derives scores);
      - the open->ext transfer (profile.cpp:840-975) reads only
        transfer-invariant sums of the ORIGINAL parent counters, and each
        parent column receives at most one transfer;
      - within a gap run the start/continue category counts reach a fixed
        point after two columns (closed form below);
      - the parent position is CONSTANT across a gap run (only the other
        parent advances), so per-step gathered values already equal their
        run-start values - no forward-fill gather is needed."""
    S = emits.shape[0]
    it = jnp.int32
    c1 = c1.astype(it)
    c2 = c2.astype(it)
    e = emits.astype(it)
    valid = e != 3
    k = jnp.arange(S, dtype=it)

    adv1 = valid & (e != _H)
    adv2 = valid & (e != _V)
    i_k = jnp.cumsum(adv1.astype(it))      # i AFTER step k
    j_k = jnp.cumsum(adv2.astype(it))

    prev_e = jnp.concatenate([jnp.array([_D], it), e[:-1]])
    sH = valid & (e == _H) & (prev_e != _H)
    sV = valid & (e == _V) & (prev_e != _V)
    isH = valid & (e == _H)
    isV = valid & (e == _V)

    def side(c, w, size, start_mask, run_mask, pos, adv):
        """One parent's contribution: (advance rows with the open->ext
        transfers applied [S, 32], gap-run category counts [S] x4)."""
        if blocked:
            # chain/giant shapes: the [S, W] one-hots below are the
            # dominant per-merge cost; blocked monotone gathers instead
            cur, nxt = _gather_rows_monotone(c, pos, nl)
        else:
            W = c.shape[0]
            cols = jnp.arange(W, dtype=it)[None, :]
            oh_cur = (pos[:, None] == cols).astype(jnp.bfloat16)
            oh_nxt = (pos[:, None] + 1 == cols).astype(jnp.bfloat16)
            cur = _onehot_rows(oh_cur, c, nl)    # rows c[pos]
            nxt = _onehot_rows(oh_nxt, c, nl)    # c[pos+1] (zero at ==W;
            # the old clipped gather read row W-1 there, but every
            # consumer masks that case: transfers need pos < w, run_vals
            # overrides with the at-end closed form when pos >= w)

        # ---- transfers (profile.cpp:840-975): one per gap-run start,
        # applied to parent column pos+1.  That target column's
        # consumption step is ALWAYS the advance step immediately after
        # the run (this side advances on every non-run code, and pos is
        # strictly monotone across advances), so the old scatter
        # (_onehot_reduce) + re-gather collapses to an elementwise form:
        # the consuming step reads its OWN cur row (= c[run pos + 1])
        prev_run = jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_), run_mask[:-1]])
        hit = adv & prev_run
        dg_t = jnp.where(hit & (pos > 1), cur[:, GAP_OPEN], it(0))
        dg_tt = jnp.where(hit, cur[:, GAP_TERM_OPEN], it(0))

        curt = cur.at[:, GAP_EXT].add(dg_t)
        curt = curt.at[:, GAP_OPEN].add(-dg_t)
        curt = curt.at[:, GAP_TERM_EXT].add(dg_tt)
        curt = curt.at[:, GAP_TERM_OPEN].add(-dg_tt)

        # ---- gap-run category counts (SolveGapsProblemWhenStarting /
        # Continuing, profile.cpp:1116-1220) from ORIGINAL counters.  pos
        # is constant across a run (only the other parent advances), so
        # cur/nxt at every in-run step already equal the run-start rows -
        # the old forward-fill gather ([seg_c]) was a no-op by identity.
        to1 = nxt[:, GAP_TERM_OPEN]
        te1 = cur[:, GAP_TERM_OPEN] + cur[:, GAP_TERM_EXT]
        e1 = cur[:, GAP_OPEN] + cur[:, GAP_EXT]
        o1 = size - e1 - to1 - te1
        at0 = pos == 0
        atw = pos >= w
        cnt_end = cur[:, GAP_TERM_OPEN] + cur[:, GAP_TERM_EXT]
        o1 = jnp.where(at0 | atw, it(0), o1)
        e1 = jnp.where(at0 | atw, it(0), e1)
        to1 = jnp.where(at0, size, jnp.where(atw, size - cnt_end, to1))
        te1 = jnp.where(at0, it(0), jnp.where(atw, cnt_end, te1))

        seg = jax.lax.cummax(jnp.where(start_mask, k, it(-1)))
        p = k - jnp.clip(seg, 0, S - 1) + 1  # position within the run
        bnd = at0 | atw                      # constant within the run

        e2 = o1 + e1
        te2 = to1 + te1
        o2 = size - e2 - te2
        o = jnp.where(p == 1, o1, jnp.where(p == 2, o2, it(0)))
        ee = jnp.where(p == 1, e1, jnp.where(p == 2, e2, size - te2))
        to = jnp.where(p == 1, to1, it(0))
        te = jnp.where(p == 1, te1, te2)
        # boundary runs: every continuing column is pure terminal ext
        o = jnp.where(bnd & (p > 1), it(0), o)
        ee = jnp.where(bnd & (p > 1), it(0), ee)
        to = jnp.where(bnd & (p > 1), it(0), to)
        te = jnp.where(bnd & (p > 1), size, te)
        z = it(0)
        return curt, (jnp.where(run_mask, o, z), jnp.where(run_mask, ee, z),
                      jnp.where(run_mask, to, z), jnp.where(run_mask, te, z))

    curt1, gv1 = side(c1, w1, card1, sH, isH, i_k, adv1)
    curt2, gv2 = side(c2, w2, card2, sV, isV, j_k, adv2)

    # ---- assemble merged columns: step k -> column k+1
    r1 = jnp.where(adv1[:, None], curt1, it(0))
    r2 = jnp.where(adv2[:, None], curt2, it(0))
    rows = r1 + r2
    gapcat = jnp.zeros((S, 32), it)
    gapcat = gapcat.at[:, GAP_OPEN].add(gv1[0] + gv2[0])
    gapcat = gapcat.at[:, GAP_EXT].add(gv1[1] + gv2[1])
    gapcat = gapcat.at[:, GAP_TERM_OPEN].add(gv1[2] + gv2[2])
    gapcat = gapcat.at[:, GAP_TERM_EXT].add(gv1[3] + gv2[3])
    gapcat = gapcat.at[:, GAP].add(
        jnp.where(isH, card1, it(0)) + jnp.where(isV, card2, it(0)))
    rows = rows + gapcat
    return jnp.concatenate([jnp.zeros((1, 32), it), rows], axis=0)
