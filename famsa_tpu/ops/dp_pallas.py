"""Pallas/Mosaic profile-alignment DP kernel.

The lax.scan row loop of ops/dp_jax.py dispatches one XLA loop iteration
per DP row; on TPU each iteration costs ~0.6 ms regardless of width (the
x64 legalizer shreds the body into hundreds of unfused u32 micro-kernels),
capping the kernel at ~1e7 cells/s.  This module runs the ENTIRE row loop
inside one Mosaic kernel:

 - stage 1 (XLA, fused, outside the loop): the seven per-cell cost
   matrices exactly as _dp_kernel_pairs builds them (match scores via the
   30-symbol contraction, gap-correction outer products - reference
   profile_seq.cpp:495-892, profile.cpp:1223-1315), split into
   (hi:int32, lo:int32-bits-of-u32) pairs;
 - stage 2 (Pallas): grid over (merge-group, row-block); the D/H/V rows
   live in VMEM scratch across sequential grid steps; the H channel's
   intra-row dependency is the max-plus prefix scan H = bc + cummax(m-bc)
   done log-depth in-kernel; packed 2-bit x3 direction rows stream out.
   All arithmetic is native i32 pairs (Mosaic rejects s64); unsigned lo
   compares use the sign-bit-xor trick.
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

from ..core.defs import (GAP_EXT, GAP_OPEN, GAP_TERM_EXT, GAP_TERM_OPEN,
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


def _pallas_bucket(w):
    return max(128, _bucket(w))


def _row_block(sb, w2pe, n_mats=14):
    """Rows per grid step: small enough that double-buffered matrix blocks
    fit VMEM AND the statically-unrolled row loop keeps code size sane
    (rows are unrolled in the kernel body; dynamic row indexing into VMEM
    lowers pathologically on Mosaic)."""
    for blk in (8, 4, 2, 1):
        if n_mats * blk * sb * w2pe * 4 * 2 <= 9 * 1024 * 1024:
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
    (broadcastable, < 2^31) with an (hi, lo) i32 pair (see _pmul_u32)."""
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


def _make_kernel(sb, blk, w2pe, single=False):
    def kernel(w1m1_ref, h0hi_ref, h0lo_ref, lastm_ref, colf_ref, rowf_ref,
               *rest):
        if single:
            # 3 single-word mats: hi = sign extension (values < 2^31);
            # the rank<=4 gap matrices (gvs/gvc/ghs/ghc) are computed
            # per row from column factors x per-row scalars (1 i32 mul
            # per feature - the single-word bound covers every term)
            tmDl, tmHl, tmVl, dirs_ref, fin_ref, prev_ref = rest
            tmDh = tmHh = tmVh = None
        else:
            (tmDh, tmDl, tmHh, tmHl, tmVh, tmVl,
             gvsh, gvsl, gvch, gvcl, ghsh, ghsl, ghch, ghcl,
             dirs_ref, fin_ref, prev_ref) = rest
        i = pl.program_id(1)
        # lane-cumsums of the ghc column factors (lane0-zeroed p2e / p2te):
        # bc_row = g1ce[r] * cumE + g1cte[r] * cumT replaces the log-depth
        # in-kernel p_cumsum (12 cross-lane rolls per row)
        cumE = (colf_ref[0, 0, :, :], colf_ref[0, 1, :, :])
        cumT = (colf_ref[0, 2, :, :], colf_ref[0, 3, :, :])
        if single:
            (g2so_c, g2se_c, g2sto_c, g2ste_c, g2ce_c, g2cte_c,
             p2o_c, p2e_c, p2to_c, p2te_c) = (
                colf_ref[0, 4 + k, :, :] for k in range(10))
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
            prev_ref[0:sb, :] = jnp.where(lane == 0, z, neg[0])
            prev_ref[sb:2 * sb, :] = jnp.where(lane == 0, z, neg[1])
            prev_ref[2 * sb:3 * sb, :] = h0hi_ref[0, :, :]
            prev_ref[3 * sb:4 * sb, :] = h0lo_ref[0, :, :]
            prev_ref[4 * sb:5 * sb, :] = neg[0]
            prev_ref[5 * sb:6 * sb, :] = neg[1]

        w1m1 = w1m1_ref[0, :, :].reshape(sb, 1)       # per-merge true w1-1
        lastm = lastm_ref[0, :, :] != 0

        carry0 = ((prev_ref[0:sb, :], prev_ref[sb:2 * sb, :]),
                  (prev_ref[2 * sb:3 * sb, :], prev_ref[3 * sb:4 * sb, :]),
                  (prev_ref[4 * sb:5 * sb, :], prev_ref[5 * sb:6 * sb, :]))

        def row_body(r, carry):
            # r is a STATIC Python int: all VMEM indexing below is static
            # (dynamic sublane indexing lowers to selects on Mosaic).
            pD, pH, pV = carry
            glob_r = i * np.int32(blk) + np.int32(r)

            def sx(lo):
                return (jax.lax.shift_right_arithmetic(
                    lo, jnp.full(lo.shape, 31, lo.dtype)), lo)

            if single:
                def mrow2(_, ref_lo):
                    return sx(ref_lo[0, r, :, :])     # [sb, w2pe]
            else:
                def mrow2(ref_hi, ref_lo):
                    return (ref_hi[0, r, :, :], ref_lo[0, r, :, :])

            tmD = mrow2(tmDh, tmDl)
            tmH = mrow2(tmHh, tmHl)
            tmV = mrow2(tmVh, tmVl)
            if single:
                def rf(k):
                    return rowf_ref[0, r, :, k:k + 1]  # (sb, 1)

                s1go_r, s1ge_r, s1gto_r, s1gte_r = rf(2), rf(3), rf(4), rf(5)
                g1so_r, g1se_r, g1sto_r, g1ste_r = rf(6), rf(7), rf(8), rf(9)
                gvs = sx(s1go_r * g2so_c + s1ge_r * g2se_c
                         + s1gto_r * g2sto_c + s1gte_r * g2ste_c)
                gvc_lo = s1ge_r * g2ce_c + s1gte_r * g2cte_c
                gvc = sx(jnp.where(lane == 0, rf(10), gvc_lo))
                ghs = sx(g1so_r * p2o_c + g1se_r * p2e_c
                         + g1sto_r * p2to_c + g1ste_r * p2te_c)
                ghc_lo = rf(0) * p2e_c + rf(1) * p2te_c
                ghc = sx(jnp.where(lane == 0, jnp.int32(0), ghc_lo))
            else:
                gvs = mrow2(gvsh, gvsl)
                gvc = mrow2(gvch, gvcl)
                ghs = mrow2(ghsh, ghsl)
                ghc = mrow2(ghch, ghcl)

            # ---- D channel (previous row, col j-1) ----
            hD, hH, hV = shf(pD), shf(pH), shf(pV)
            tDd = p_add(hD, tmD)
            tHd = p_add(hH, tmH)
            tVd = p_add(hV, tmV)
            pickD = p_gt(tDd, tHd) & p_gt(tDd, tVd)
            pickH = (~pickD) & p_gt(tHd, tVd)
            D = p_where(pickD, tDd, p_where(pickH, tHd, tVd))
            dD = jnp.where(pickD, c_D, jnp.where(pickH, c_H, c_V))
            D = p_where(lane == 0, neg, D)

            three = (glob_r >= 1) & (lane >= 2)

            # ---- V channel (previous row, same col) ----
            tDv = p_add(pD, gvs)
            tVv = p_add(pV, gvc)
            tHv = p_add(pH, gvs)
            pickD3 = p_gt(tDv, tHv) & p_gt(tDv, tVv)
            pickH3 = (~pickD3) & p_gt(tHv, tVv)
            v3 = p_where(pickD3, tDv, p_where(pickH3, tHv, tVv))
            d3 = jnp.where(pickD3, c_D, jnp.where(pickH3, c_H, c_V))
            pickD2 = p_gt(tDv, tVv)
            V = p_where(three, v3, p_where(pickD2, tDv, tVv))
            dV = jnp.where(three, d3, jnp.where(pickD2, c_D, c_V))

            # col-0 boundary: V0 = max(pD0, pV0) + v0_cost while row+1 < w1
            # (v0_cost rides in lane 0 of gvc, which is dead otherwise)
            V0vec = p_add(p_max(pD, pV), gvc)
            von = glob_r < w1m1                                # [sb, 1]
            Vb = p_where(von, V0vec, neg)
            V = p_where(lane == 0, Vb, V)

            # ---- H channel: max-plus prefix scan along the row ----
            mD = p_add(shf(D), ghs)
            mV = p_add(shf(V), ghs)
            m = p_where(three, p_max(mD, mV), mD)
            g1ce_r = rowf_ref[0, r, :, 0:1]           # (sb, 1) counts
            g1cte_r = rowf_ref[0, r, :, 1:2]
            bc = p_add(_k_pmul_u32(g1ce_r, cumE), _k_pmul_u32(g1cte_r, cumT))
            run = p_cummax(p_sub(m, bc))
            H = p_add(bc, p_max(run, neg))
            H = p_where(lane == 0, neg, H)

            tHh2 = p_add(shf(H), ghc)
            pickD3h = p_gt(mD, tHh2) & p_gt(mD, mV)
            pickV3h = (~pickD3h) & p_gt(mV, tHh2)
            h3 = jnp.where(pickD3h, c_D, jnp.where(pickV3h, c_V, c_H))
            dH = jnp.where(three, h3, jnp.where(p_gt(mD, tHh2), c_D, c_H))

            packed = dD | (dH << 2) | (dV << 4)
            packed = jnp.where(lane == 0, jnp.int32(COL0_PACK), packed)
            dirs_ref[0, r, :, :] = packed

            # last-column (col w2 per merge) values for this row
            def pick(ch):
                return (jnp.sum(jnp.where(lastm, ch[0], jnp.int32(0)), axis=1,
                                dtype=jnp.int32),
                        jnp.sum(jnp.where(lastm, ch[1], jnp.int32(0)), axis=1,
                                dtype=jnp.int32))

            fD, fH, fV = pick(D), pick(H), pick(V)
            z32 = jnp.int32(0)
            fin = (jnp.where(fin_col == 0, fD[0][:, None], z32)
                   + jnp.where(fin_col == 1, fD[1][:, None], z32)
                   + jnp.where(fin_col == 2, fH[0][:, None], z32)
                   + jnp.where(fin_col == 3, fH[1][:, None], z32)
                   + jnp.where(fin_col == 4, fV[0][:, None], z32)
                   + jnp.where(fin_col == 5, fV[1][:, None], z32))
            fin_ref[0, r, :, :] = fin
            return (D, H, V)

        carry = carry0
        for r in range(blk):
            carry = row_body(r, carry)
        D, H, V = carry
        prev_ref[0:sb, :] = D[0]
        prev_ref[sb:2 * sb, :] = D[1]
        prev_ref[2 * sb:3 * sb, :] = H[0]
        prev_ref[3 * sb:4 * sb, :] = H[1]
        prev_ref[4 * sb:5 * sb, :] = V[0]
        prev_ref[5 * sb:6 * sb, :] = V[1]

    return kernel


# ---------------------------------------------------------------------------
# stage 1 + pallas_call wrapper (one jit = one device dispatch)
# ---------------------------------------------------------------------------
def _split(x):
    return ((x >> np.int64(32)).astype(jnp.int32), x.astype(jnp.int32))


def _build_mats(colp, xs, w1p, w2p):
    """Stage 1: the seven per-cell cost matrices as (hi, lo) i32 pairs.
    Returns (w1m1, h0hi, h0lo, lastm, mats[14]).

    Inputs may arrive in narrower integer dtypes (host-side shrink to cut
    the upload; see _shrink) - everything is widened to i64 on device."""
    colp = {k: v.astype(jnp.int64) for k, v in colp.items()}
    xs = {k: v.astype(jnp.int64) for k, v in xs.items()}
    w2pe = w2p + LANE_PAD

    def outer(rowv, colv):
        # rowv [G, sb, w1p] x colv [G, sb, w2pe] -> [G, w1p, sb, w2pe]
        return (rowv.transpose(0, 2, 1)[:, :, :, None]
                * colv[:, None, :, :])

    c1 = xs["c1"]                     # [G, sb, w1p, 30]
    s2 = colp["s2"]                   # [G, sb, w2pe, 30]
    t = outer(c1[..., 0], s2[..., 0])
    for s in range(1, NO_AMINOACIDS_AND_GAPS):
        t = t + outer(c1[..., s], s2[..., s])

    p2o, p2e = colp["p2gaps"][..., 0], colp["p2gaps"][..., 1]
    p2to, p2te = colp["p2gaps"][..., 2], colp["p2gaps"][..., 3]
    tmH = t + outer(xs["n1c"], p2e - p2o) + outer(xs["n1tc"], p2te - p2to)
    tmV = t + outer(xs["col1nng"], colp["gaps2_change"])
    gvs = (outer(xs["s1go"], colp["g2so"]) + outer(xs["s1ge"], colp["g2se"])
           + outer(xs["s1gto"], colp["g2sto"])
           + outer(xs["s1gte"], colp["g2ste"]))
    gvc = outer(xs["s1ge"], colp["g2ce"]) + outer(xs["s1gte"], colp["g2cte"])
    # v0_cost (col-0 V boundary, per row) rides in the dead lane 0 of gvc
    v0t = xs["v0_cost"].transpose(0, 2, 1)            # [G, w1p, sb]
    lane0m = (jnp.arange(w2pe) == 0)[None, None, None, :]
    gvc = jnp.where(lane0m, v0t[:, :, :, None], gvc)
    ghs = (outer(xs["g1so"], p2o) + outer(xs["g1se"], p2e)
           + outer(xs["g1sto"], p2to) + outer(xs["g1ste"], p2te))
    ghc = outer(xs["g1ce"], p2e) + outer(xs["g1cte"], p2te)
    lane0 = (jnp.arange(w2pe) == 0)[None, None, None, :]
    ghc = jnp.where(lane0, jnp.int64(0), ghc)

    mats = []
    for a in (t, tmH, tmV, gvs, gvc, ghs, ghc):
        hi, lo = _split(a)
        mats.append(hi)
        mats.append(lo)

    h0hi, h0lo = _split(colp["h0"])               # [G, sb, w2pe]
    lastm = colp["last_col_mask"].astype(jnp.int32)
    w1m1 = xs["w1m1"].astype(jnp.int32)[:, None, :]   # [G, 1, sb]
    return w1m1, h0hi, h0lo, lastm, mats


def _srl(x, k):
    """Logical right shift of an i32 bit pattern by constant k."""
    return jax.lax.shift_right_logical(x, jnp.full(x.shape, k, x.dtype))


def _pmul_u32(c, x):
    """Exact (mod 2^64) product of a non-negative i32 scalar/array c
    (0 <= c < 2^31) with an i64 value given as an (hi, lo) i32 pair.

    Pure i32 ops (4x 16-bit partial products + carry assembly), so the XLA
    TPU x64 legalizer never sees it and the whole chain fuses into one
    vector loop - the emulated-i64 version of the same outer products ran
    ~10x slower (unfused micro-kernels)."""
    hi, lo = x
    m16 = jnp.int32(0xFFFF)
    a0 = c & m16
    a1 = _srl(c, 16)
    b0 = lo & m16
    b1 = _srl(lo, 16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = _srl(p00, 16) + (p01 & m16) + (p10 & m16)
    lo_out = (mid << 16) | (p00 & m16)
    hi_mul = p11 + _srl(p01, 16) + _srl(p10, 16) + _srl(mid, 16)
    return (c * hi + hi_mul, lo_out)


def _build_mats_pairs(colp, xs, w1p, w2p):
    """Stage 1 in explicit (hi, lo) i32-pair arithmetic: bit-identical to
    _build_mats but ~10x faster on TPU (no s64 in the hot loop).

    Layout note: every product is rowv [G, w1p, sb, 1] x colv
    [G, 1, sb, w2pe] - broadcasting builds the [G, w1p, sb, w2pe] matrices
    directly in the kernel's layout inside one fused XLA loop."""
    w2pe = w2p + LANE_PAD

    def sp_row(a):
        # [G, sb, w1p] i64 -> (hi, lo) [G, w1p, sb, 1]
        a = a.astype(jnp.int64).transpose(0, 2, 1)[:, :, :, None]
        return _split(a)

    def sp_col(a):
        # [G, sb, w2pe] i64 -> (hi, lo) [G, 1, sb, w2pe]
        a = a.astype(jnp.int64)[:, None, :, :]
        return _split(a)

    def row_u32(a):
        # non-negative count-typed row operand -> i32 [G, w1p, sb, 1]
        return a.astype(jnp.int32).transpose(0, 2, 1)[:, :, :, None]

    def col_u32(a):
        return a.astype(jnp.int32)[:, None, :, :]

    def p_mul_rc(rows_cnt, col_pair):
        return _pmul_u32(row_u32(rows_cnt), col_pair)

    def p_mul_cr(row_pair, cols_cnt):
        return _pmul_u32(col_u32(cols_cnt), row_pair)

    c1 = xs["c1"]                     # [G, sb, w1p, 30] counts
    t = p_mul_rc(c1[..., 0], sp_col(colp["s2"][..., 0]))
    for s in range(1, NO_AMINOACIDS_AND_GAPS):
        t = p_add(t, p_mul_rc(c1[..., s], sp_col(colp["s2"][..., s])))

    p2g = colp["p2gaps"].astype(jnp.int64)
    p2o, p2e = p2g[..., 0], p2g[..., 1]
    p2to, p2te = p2g[..., 2], p2g[..., 3]

    tmH = p_add(t, p_add(p_mul_rc(xs["n1c"], sp_col(p2e - p2o)),
                         p_mul_rc(xs["n1tc"], sp_col(p2te - p2to))))
    tmV = p_add(t, p_mul_rc(xs["col1nng"], sp_col(colp["gaps2_change"])))

    # gvs/gvc: score-typed rows x count-typed cols (commuted operands)
    gvs = p_add(p_add(p_mul_cr(sp_row(xs["s1go"]), colp["g2so"]),
                      p_mul_cr(sp_row(xs["s1ge"]), colp["g2se"])),
                p_add(p_mul_cr(sp_row(xs["s1gto"]), colp["g2sto"]),
                      p_mul_cr(sp_row(xs["s1gte"]), colp["g2ste"])))
    gvc = p_add(p_mul_cr(sp_row(xs["s1ge"]), colp["g2ce"]),
                p_mul_cr(sp_row(xs["s1gte"]), colp["g2cte"]))
    # v0_cost (col-0 V boundary, per row) rides in the dead lane 0 of gvc
    lane0 = (jnp.arange(w2pe) == 0)[None, None, None, :]
    v0hi, v0lo = sp_row(xs["v0_cost"])
    gvc = (jnp.where(lane0, v0hi, gvc[0]), jnp.where(lane0, v0lo, gvc[1]))

    ghs = p_add(p_add(p_mul_rc(xs["g1so"], sp_col(p2o)),
                      p_mul_rc(xs["g1se"], sp_col(p2e))),
                p_add(p_mul_rc(xs["g1sto"], sp_col(p2to)),
                      p_mul_rc(xs["g1ste"], sp_col(p2te))))
    ghc = p_add(p_mul_rc(xs["g1ce"], sp_col(p2e)),
                p_mul_rc(xs["g1cte"], sp_col(p2te)))
    z = jnp.int32(0)
    ghc = (jnp.where(lane0, z, ghc[0]), jnp.where(lane0, z, ghc[1]))

    g = colp["s2"].shape[0]
    sb = colp["s2"].shape[1]
    full = (g, w1p, sb, w2pe)
    mats = []
    for hi, lo in (t, tmH, tmV, gvs, gvc, ghs, ghc):
        mats.append(jnp.broadcast_to(hi, full))
        mats.append(jnp.broadcast_to(lo, full))

    h0hi, h0lo = _split(colp["h0"].astype(jnp.int64))   # [G, sb, w2pe]
    lastm = colp["last_col_mask"].astype(jnp.int32)
    w1m1 = xs["w1m1"].astype(jnp.int32)[:, None, :]     # [G, 1, sb]
    return w1m1, h0hi, h0lo, lastm, mats


def _build_mats_single(colp, xs, w1p, w2p):
    """Stage 1 when every cost-matrix value provably fits i32 (see
    dp_profile_pallas_paths: 3 * card1 * card2 * C < 2^31): plain i32
    muls/adds, 7 single-word matrices; the kernel sign-extends on read.
    ~10x less stage-1 arithmetic and half the HBM traffic vs the pair
    path; bit-identical within its validity domain."""
    w2pe = w2p + LANE_PAD

    def row(a):
        return a.astype(jnp.int32).transpose(0, 2, 1)[:, :, :, None]

    def col(a):
        return a.astype(jnp.int32)[:, None, :, :]

    c1 = xs["c1"]                     # [G, sb, w1p, 30] counts
    s2 = colp["s2"]
    t = row(c1[..., 0]) * col(s2[..., 0])
    for s in range(1, NO_AMINOACIDS_AND_GAPS):
        t = t + row(c1[..., s]) * col(s2[..., s])

    p2g = colp["p2gaps"].astype(jnp.int32)
    p2o, p2e = p2g[..., 0], p2g[..., 1]
    p2to, p2te = p2g[..., 2], p2g[..., 3]

    tmH = (t + row(xs["n1c"]) * col(p2e - p2o)
           + row(xs["n1tc"]) * col(p2te - p2to))
    tmV = t + row(xs["col1nng"]) * col(colp["gaps2_change"])
    # gvs/gvc/ghs/ghc are rank<=4: the kernel rebuilds them per row from
    # the column factors in colf and the per-row scalars in rowf

    g = s2.shape[0]
    sb = s2.shape[1]
    full = (g, w1p, sb, w2pe)
    mats = [jnp.broadcast_to(m, full) for m in (t, tmH, tmV)]

    h0hi, h0lo = _split(colp["h0"].astype(jnp.int64))   # [G, sb, w2pe]
    lastm = colp["last_col_mask"].astype(jnp.int32)
    w1m1 = xs["w1m1"].astype(jnp.int32)[:, None, :]     # [G, 1, sb]
    return w1m1, h0hi, h0lo, lastm, mats


def _bc_factors(colp, xs, w1p, w2p, single=False):
    """Factors of the bc-trick: bc_row = cumsum(ghc_row) distributes as
    g1ce[r] * cumsum(p2e') + g1cte[r] * cumsum(p2te') (lane0-zeroed
    columns), exact mod 2^64.  Returns (colf [G, 4(+10), sb, w2pe] i32 -
    the two cumsums as hi/lo pairs, plus in single mode the 10 raw gap
    column factors - and rowf [G, w1p, sb, 2|12] i32 per-row scalars)."""
    from .dp_jax import _cumsum_log
    w2pe = w2p + LANE_PAD
    p2g = colp["p2gaps"].astype(jnp.int64)
    z0 = (jnp.arange(w2pe) == 0)[None, None, :]
    cumE = _cumsum_log(jnp.where(z0, jnp.int64(0), p2g[..., 1]))
    cumT = _cumsum_log(jnp.where(z0, jnp.int64(0), p2g[..., 3]))
    eh, el = _split(cumE)
    th, tl = _split(cumT)
    cf = [eh, el, th, tl]

    def rw(name):
        return xs[name].astype(jnp.int32).transpose(0, 2, 1)

    rf = [rw("g1ce"), rw("g1cte")]
    if single:
        for name in ("g2so", "g2se", "g2sto", "g2ste", "g2ce", "g2cte"):
            cf.append(colp[name].astype(jnp.int32))
        for k in range(4):
            cf.append(p2g[..., k].astype(jnp.int32))   # p2o p2e p2to p2te
        for name in ("s1go", "s1ge", "s1gto", "s1gte",
                     "g1so", "g1se", "g1sto", "g1ste", "v0_cost"):
            rf.append(rw(name))
        rf.append(jnp.zeros_like(rf[0]))               # pad to 12
    colf = jnp.stack(cf, axis=1)
    rowf = jnp.stack(rf, axis=3)
    return colf, rowf


def _run_kernel(w1m1, h0hi, h0lo, lastm, colf, rowf, mats, sb, blk, w1p,
                w2p, interpret=False, single=False):
    """Stage 2: the Mosaic row-loop kernel over prebuilt cost matrices."""
    w2pe = w2p + LANE_PAD
    g = h0hi.shape[0]
    grid = (g, w1p // blk)

    def bm(bs, im):
        return pl.BlockSpec(bs, im, memory_space=pltpu.VMEM)

    z0 = np.int32(0)   # index maps must stay i32: x64 literals break Mosaic
    mat_spec = bm((1, blk, sb, w2pe), lambda b, i: (b, i, z0, z0))
    in_specs = [
        bm((1, 1, sb), lambda b, i: (b, z0, z0)),     # w1m1
        bm((1, sb, w2pe), lambda b, i: (b, z0, z0)),  # h0hi
        bm((1, sb, w2pe), lambda b, i: (b, z0, z0)),  # h0lo
        bm((1, sb, w2pe), lambda b, i: (b, z0, z0)),  # lastm
        bm((1, colf.shape[1], sb, w2pe),
           lambda b, i: (b, z0, z0, z0)),                     # colf
        bm((1, blk, sb, rowf.shape[3]),
           lambda b, i: (b, i, z0, z0)),                      # rowf
    ] + [mat_spec] * len(mats)

    out_shape = [
        jax.ShapeDtypeStruct((g, w1p, sb, w2pe), jnp.int32),   # dirs
        jax.ShapeDtypeStruct((g, w1p, sb, 8), jnp.int32),      # finals
    ]
    out_specs = [
        bm((1, blk, sb, w2pe), lambda b, i: (b, i, z0, z0)),
        bm((1, blk, sb, 8), lambda b, i: (b, i, z0, z0)),
    ]

    dirs_i32, fins = pl.pallas_call(
        _make_kernel(sb, blk, w2pe, single=single),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((6 * sb, w2pe), jnp.int32)],
        interpret=interpret,
    )(w1m1, h0hi, h0lo, lastm, colf, rowf, *mats)
    return dirs_i32, fins


def _dp_pallas_raw(colp, xs, sb, blk, w1p, w2p, interpret=False,
                   single=False):
    """Stage 1 + stage 2; returns the raw kernel outputs
    (dirs i32 [G, w1p, sb, w2pe], finals i32 [G, w1p, sb, 8]).
    Traced inside the jitted wrappers below."""
    import os
    if single:
        w1m1, h0hi, h0lo, lastm, mats = _build_mats_single(
            colp, xs, w1p, w2p)
    elif os.environ.get("FAMSA_TPU_MATS_PAIRS", "1") == "1":
        w1m1, h0hi, h0lo, lastm, mats = _build_mats_pairs(colp, xs, w1p, w2p)
    else:
        w1m1, h0hi, h0lo, lastm, mats = _build_mats(colp, xs, w1p, w2p)
    colf, rowf = _bc_factors(colp, xs, w1p, w2p, single=single)
    return _run_kernel(w1m1, h0hi, h0lo, lastm, colf, rowf, mats, sb, blk,
                       w1p, w2p, interpret=interpret, single=single)


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
    )
    return colp, xsp


# ---------------------------------------------------------------------------
# device-side stage 0: derive ALL DP cost inputs from the raw profile
# counters, so the host uploads only [W+1, 32] i8/i16 counter tensors per
# merge (~4x less than the precomputed cost arrays).  Mirrors
# core/profile.py:_calculate_scores and ops/dp_jax.py:_prepare_inputs /
# _gap_correction_arrays exactly (integer arithmetic, bit-identical).
# ---------------------------------------------------------------------------
def _scores_from_counters(c, card, w, sm, gp):
    """[Wp+1, 32] counters -> [Wp+1, 32] scores (profile.cpp:162-217).
    c i64, card/w traced scalars, sm [24, 24] i64, gp static ints."""
    go, ge, gto, gte = gp
    wp = c.shape[0] - 1
    cc = c[1:]
    gap_cost = (cc[:, GAP_OPEN] * go + cc[:, GAP_TERM_OPEN] * gto
                + cc[:, GAP_EXT] * ge + cc[:, GAP_TERM_EXT] * gte)
    sym = jnp.zeros((wp, NO_AMINOACIDS), jnp.int64)
    for s in range(NO_AMINOACIDS):
        sym = sym + cc[:, s:s + 1] * sm[s][None, :]
    tot = cc[:, :NO_AMINOACIDS].sum(axis=1)

    scores = jnp.zeros((wp + 1, 32), jnp.int64)
    scores = scores.at[1:, :NO_AMINOACIDS].set(sym + gap_cost[:, None])
    scores = scores.at[1:, GAP_OPEN].set(tot * go)
    scores = scores.at[1:, GAP_TERM_OPEN].set(tot * gto)
    scores = scores.at[1:, GAP_EXT].set(tot * ge)
    scores = scores.at[1:, GAP_TERM_EXT].set(tot * gte)
    row0 = jnp.zeros(32, jnp.int64)
    row0 = row0.at[GAP_OPEN].set(card * go)
    row0 = row0.at[GAP_EXT].set(card * ge)
    row0 = row0.at[GAP_TERM_EXT].set(card * gte)
    row0 = row0.at[GAP_TERM_OPEN].set(card * gto)
    return scores.at[0].set(row0)


def _gap_corrections_device(c, w, card):
    """ops/dp_jax.py:_gap_correction_arrays, traced (w/card scalars)."""
    wp = c.shape[0] - 1
    j = np.arange(wp + 1)
    nxt = np.minimum(j + 1, wp)
    internal = (j >= 1) & (j < w)
    at_end = j == w
    z = jnp.int64(0)

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


def _stage0_one(c1, c2, w1, w2, card1, card2, sm, gp, w1p, w2p):
    """Device equivalent of _prepare_inputs + _prepare_pallas for ONE merge.
    c1 [w1p+1, 32] i64, c2 [w2p+1, 32] i64; w1/w2/card1/card2 i64 scalars.
    Returns (colp, xs) dicts in the pallas layout."""
    from .dp_jax import _cumsum_log
    go, ge, gto, gte = gp
    w2pe = w2p + LANE_PAD
    jj = np.arange(w2p + 1)
    jjd = jnp.arange(w2p + 1)

    s1 = _scores_from_counters(c1, card1, w1, sm, gp)
    s2 = _scores_from_counters(c2, card2, w2, sm, gp)
    # padded rows (beyond the true width) must be zero like the host pad()
    rows1 = jnp.arange(w1p + 1)
    rows2 = jnp.arange(w2p + 1)
    s1 = jnp.where(rows1[:, None] <= w1, s1, jnp.int64(0))
    s2 = jnp.where(rows2[:, None] <= w2, s2, jnp.int64(0))
    c1m = jnp.where(rows1[:, None] <= w1, c1, jnp.int64(0))
    c2m = jnp.where(rows2[:, None] <= w2, c2, jnp.int64(0))

    g1 = _gap_corrections_device(c1m, w1, card1)
    g2 = _gap_corrections_device(c2m, w2, card2)

    p2o, p2e = s2[:, GAP_OPEN], s2[:, GAP_EXT]
    p2to, p2te = s2[:, GAP_TERM_OPEN], s2[:, GAP_TERM_EXT]
    gaps2_change = (c2m[:, GAP_OPEN] * (ge - go)
                    + c2m[:, GAP_TERM_OPEN] * (gte - gto))

    h0 = jnp.where(jjd == 1, p2to[1] * card1, p2te * card1)
    h0 = jnp.concatenate([jnp.zeros(1, jnp.int64), _cumsum_log(h0[1:])])
    h0 = jnp.where((jjd == 0) | (jjd == w2), jnp.int64(NEG), h0)

    def padc(a, fill=0):
        pad_shape = (w2pe - a.shape[0],) + a.shape[1:]
        return jnp.concatenate(
            [a, jnp.full(pad_shape, jnp.int64(fill))], axis=0)

    def shift1(a):
        out = jnp.zeros(w2pe, jnp.int64)
        return out.at[1:1 + a.shape[0]].set(a)

    colp = dict(
        s2=padc(s2[:, :NO_AMINOACIDS_AND_GAPS]),
        p2gaps=padc(jnp.stack([p2o, p2e, p2to, p2te], axis=1)),
        gaps2_change=padc(gaps2_change),
        h0=padc(h0, fill=NEG),
        last_col_mask=padc((jjd == w2).astype(jnp.int64)),
        g2so=shift1(g2[0][1:]), g2se=shift1(g2[1][1:]),
        g2sto=shift1(g2[2][1:]), g2ste=shift1(g2[3][1:]),
        g2ce=shift1(g2[4][1:]), g2cte=shift1(g2[5][1:]),
    )
    ii = jnp.arange(1, w1p + 1)
    s1gto = s1[1:, GAP_TERM_OPEN]
    s1gte = s1[1:, GAP_TERM_EXT]
    xs = dict(
        c1=c1m[1:, :NO_AMINOACIDS_AND_GAPS],
        col1nng=c1m[1:, :NO_AMINOACIDS].sum(axis=1),
        n1c=c1m[1:, GAP_OPEN], n1tc=c1m[1:, GAP_TERM_OPEN],
        s1go=s1[1:, GAP_OPEN], s1ge=s1[1:, GAP_EXT],
        s1gto=s1gto, s1gte=s1gte,
        g1so=g1[0][1:], g1se=g1[1][1:], g1sto=g1[2][1:],
        g1ste=g1[3][1:], g1ce=g1[4][1:], g1cte=g1[5][1:],
        v0_cost=jnp.where(ii == 1, s1gto * card2, s1gte * card2),
        w1m1=w1 - 1,
    )
    return colp, xs


# ---------------------------------------------------------------------------
# on-device traceback: pull only the O(W) path, never the O(W^2) matrices
# (the axon tunnel moves ~15 MB/s; a 2 MB direction-matrix pull costs more
# than the whole DP kernel)
# ---------------------------------------------------------------------------
def _traceback_one(dirs_m, w1, w2, dir0, steps):
    """dirs_m: [w1p, w2pe] packed i32, row r = DP row r+1 (DP row 0 is the
    constant ROW0_PACK boundary).  Walks from (w1, w2) with initial channel
    dir0; returns (emits [steps] i32 with sentinel 3 after done).
    Mirrors core/construct.py:_trace_path."""

    def step(carry, _):
        i, j, d, done = carry
        cell = jax.lax.dynamic_slice(dirs_m, (i - 1, j), (1, 1))[0, 0]
        cell = jnp.where(i == 0,
                         jnp.where(j >= 1, jnp.int32(ROW0_PACK), jnp.int32(0)),
                         cell)
        nd = jax.lax.shift_right_logical(
            cell, (2 * d).astype(jnp.int32)) & jnp.int32(3)
        di = ((d == _D) | (d == _V)).astype(jnp.int32)
        dj = ((d == _D) | (d == _H)).astype(jnp.int32)
        act = (~done).astype(jnp.int32)
        i2 = i - di * act
        j2 = j - dj * act
        emit = jnp.where(done, jnp.int32(3), nd)
        d2 = jnp.where(done, d, nd)
        done2 = (i2 == 0) & (j2 == 0)
        return (i2, j2, d2, done2), emit

    init = (w1.astype(jnp.int32), w2.astype(jnp.int32),
            dir0.astype(jnp.int32), (w1 == 0) & (w2 == 0))
    _, emits = jax.lax.scan(step, init, None, length=steps)
    return emits


def _tb_impl(colp, xs, w1v, w2v, sb, blk, w1p, w2p, interpret=False,
             single=False):
    """DP kernel + on-device traceback in ONE program.  w1v/w2v: [G*sb] i32
    true widths.  Returns (emits [B, w1p+w2p] i32, dir0 [B] i32,
    total [B] i64).  Direction matrices never leave the device."""
    w2pe = w2p + LANE_PAD
    g = colp["s2"].shape[0]
    b = g * sb

    dirs_i32, fins = _dp_pallas_raw(colp, xs, sb, blk, w1p, w2p, interpret,
                                    single)
    # [G, w1p, sb, w2pe] -> [B, w1p, w2pe]
    dirs_m = dirs_i32.transpose(0, 2, 1, 3).reshape(b, w1p, w2pe)

    # final-row (hi, lo) triples per merge: fins[g, w1-1, s, :]
    fins_b = fins.transpose(0, 2, 1, 3).reshape(b, w1p, 8)
    idx = jnp.maximum(w1v.astype(jnp.int32) - 1, 0)
    f = jnp.take_along_axis(fins_b, idx[:, None, None].astype(jnp.int64),
                            axis=1)[:, 0, :]     # [B, 8]

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
    # array [B, (w1p+w2p)/16 + 3]: words..., dir0, total_hi, total_lo
    s = w1p + w2p                       # multiple of 128, so 16 | s
    ew = emits.reshape(emits.shape[0], s // 16, 16)
    shifts = (2 * jnp.arange(16, dtype=jnp.int32))[None, None, :]
    packed_e = jnp.sum(ew << shifts, axis=2, dtype=jnp.int32)
    tot_hi = (total >> np.int64(32)).astype(jnp.int32)
    tot_lo = total.astype(jnp.int32)
    return jnp.concatenate(
        [packed_e, dir0[:, None], tot_hi[:, None], tot_lo[:, None]], axis=1)


_dp_pallas_tb = jax.jit(
    _tb_impl, static_argnames=("sb", "blk", "w1p", "w2p", "interpret",
                               "single"))


def _tb_counters_impl(c1s, c2s, w1v, w2v, card1v, card2v, sm, gp,
                      sb, blk, w1p, w2p, interpret, single):
    b = c1s.shape[0]
    g = b // sb

    def one(c1, c2, w1, w2, k1, k2):
        return _stage0_one(c1.astype(jnp.int64), c2.astype(jnp.int64),
                           w1.astype(jnp.int64), w2.astype(jnp.int64),
                           k1.astype(jnp.int64), k2.astype(jnp.int64),
                           sm, gp, w1p, w2p)

    colp, xs = jax.vmap(one)(c1s, c2s, w1v, w2v, card1v, card2v)
    colp = {k: v.reshape((g, sb) + v.shape[1:]) for k, v in colp.items()}
    xs = {k: v.reshape((g, sb) + v.shape[1:]) for k, v in xs.items()}
    return _tb_impl(colp, xs, w1v, w2v, sb, blk, w1p, w2p, interpret, single)


@functools.partial(jax.jit, static_argnames=("gp", "sb", "blk", "w1p", "w2p",
                                             "interpret", "single"))
def _dp_pallas_tb_counters(c1s, c2s, w1v, w2v, card1v, card2v, sm, gp,
                           sb, blk, w1p, w2p, interpret=False, single=False):
    """Counters-in variant: c1s [B, w1p+1, 32], c2s [B, w2p+1, 32] (any int
    dtype), w1v/w2v/card1v/card2v [B] i32, sm [24,24] i64, gp static gap
    costs.  Stage 0 (scores, gap corrections, boundaries) runs on device."""
    return _tb_counters_impl(c1s, c2s, w1v, w2v, card1v, card2v, sm, gp,
                             sb, blk, w1p, w2p, interpret, single)


def _csc_dense(counts, syms, vals, wp):
    """Reconstruct dense [B, wp+1, 32] i32 counters from the compact
    per-column encoding: counts [B, wp+1] (nonzeros per column), syms
    [B, nnzb] (symbol of each nonzero, column-major), vals [B, nnzb]
    (its count).  Padding entries have val 0, so their scatter-add is a
    no-op wherever it lands (column index clamped into range)."""
    b, nnzb = syms.shape
    cum = jnp.cumsum(counts.astype(jnp.int32), axis=1)      # [B, wp+1]
    ks = jnp.arange(nnzb, dtype=jnp.int32)
    col_of = jax.vmap(
        lambda c: jnp.searchsorted(c, ks, side="right"))(cum)
    col_of = jnp.minimum(col_of, wp).astype(jnp.int32)
    idx = col_of * 32 + syms.astype(jnp.int32)
    flat = jnp.zeros((b, (wp + 1) * 32), jnp.int32)
    flat = flat.at[jnp.arange(b)[:, None], idx].add(vals.astype(jnp.int32))
    return flat.reshape(b, wp + 1, 32)


@functools.partial(jax.jit, static_argnames=("gp", "sb", "blk", "w1p", "w2p",
                                             "interpret", "single"))
def _dp_pallas_tb_csc(cnt1, sym1, val1, cnt2, sym2, val2, w1v, w2v,
                      card1v, card2v, sm, gp, sb, blk, w1p, w2p,
                      interpret=False, single=False):
    """Compact-upload variant: a profile column holds a handful of distinct
    symbols, so the host ships per-column nonzero counts (i8) + symbol ids
    (i8) + count values (i8/i16) instead of the dense [w, 32] tensor - the
    dominant cost of a dispatch through the tunnel is the host->device
    transfer (~26 ms + bytes/40 MB/s)."""
    c1s = _csc_dense(cnt1, sym1, val1, w1p)
    c2s = _csc_dense(cnt2, sym2, val2, w2p)
    return _tb_counters_impl(c1s, c2s, w1v, w2v, card1v, card2v, sm, gp,
                             sb, blk, w1p, w2p, interpret, single)


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


class JaxPathResult:
    """DP result carrying the traceback path directly (device traceback);
    construct's _trace_path short-circuits on .path."""
    __slots__ = ("path", "total")

    def __init__(self, path, total):
        self.path = path
        self.total = total


def _single_word_ok(params, pairs):
    """True iff every cost-matrix value of every merge provably fits i32:
    |mat| <= 3 * card1 * card2 * C with C = max |substitution score| +
    sum |gap costs| (see _build_mats_single)."""
    c = int(np.abs(np.asarray(params.score_matrix, dtype=np.int64)).max())
    c += sum(abs(int(x)) for x in (params.gap_open, params.gap_ext,
                                   params.gap_term_open,
                                   params.gap_term_ext))
    prod = max(len(p1.data) * len(p2.data) for p1, p2 in pairs)
    return 3 * prod * c < 2 ** 31


class PendingPaths:
    """In-flight batched DP dispatch: a single packed device array
    [B, steps+3] (emits..., dir0, total_hi, total_lo) not yet pulled.
    resolve() blocks, pulls the O(W) paths in ONE transfer and returns
    [JaxPathResult].  Dispatching several batches before resolving
    pipelines host packing + uploads against device compute."""

    def __init__(self, packed, n):
        self._packed = packed
        self._n = n

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
            out.append(JaxPathResult(full[1:], int(total[k])))
        return out


def dp_profile_pallas_paths_async(params, pairs, sb=None, interpret=False,
                                  single=None, force_dense=False):
    """Batched DP + device traceback, dispatched without blocking: returns
    a PendingPaths.  The host uploads only the nonzero counter entries
    (per-column compact encoding, see _csc_pack) or narrow dense counters
    and pulls only the O(W) paths, 2-bit packed."""
    n = len(pairs)
    if sb is None:
        sb = 8 if n >= 5 else 1
    if single is None:
        single = _single_word_ok(params, pairs)
    w1p = max(_pallas_bucket(p1.width) for p1, _ in pairs)
    w2p = max(_pallas_bucket(p2.width) for _, p2 in pairs)
    blk = _row_block(sb, w2p + LANE_PAD, n_mats=3 if single else 14)

    g = (n + sb - 1) // sb
    b = g * sb
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

    cnt1, sym1, val1 = _csc_pack(pairs, n, b, 0, w1p)
    cnt2, sym2, val2 = _csc_pack(pairs, n, b, 1, w2p)
    csc_bytes = (cnt1.nbytes + sym1.nbytes + val1.nbytes
                 + cnt2.nbytes + sym2.nbytes + val2.nbytes)
    dense_itemsize = _shrink(np.array([max(k1v.max(), k2v.max())],
                                      dtype=np.int64)).itemsize
    dense_bytes = b * (w1p + w2p + 2) * 32 * dense_itemsize

    if csc_bytes < 0.8 * dense_bytes and not force_dense:
        packed = _dp_pallas_tb_csc(
            jnp.asarray(cnt1), jnp.asarray(sym1), jnp.asarray(val1),
            jnp.asarray(cnt2), jnp.asarray(sym2), jnp.asarray(val2),
            *common,
            gp=gp, sb=sb, blk=blk, w1p=w1p, w2p=w2p,
            interpret=interpret, single=single)
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
        packed = _dp_pallas_tb_counters(
            jnp.asarray(c1s), jnp.asarray(c2s), *common,
            gp=gp, sb=sb, blk=blk, w1p=w1p, w2p=w2p,
            interpret=interpret, single=single)
    return PendingPaths(packed, n)


def dp_profile_pallas_paths(params, pairs, sb=None, interpret=False,
                            single=None, force_dense=False):
    """Blocking variant: dispatch one batch and pull its paths."""
    return dp_profile_pallas_paths_async(
        params, pairs, sb=sb, interpret=interpret, single=single,
        force_dense=force_dense).resolve()


def dp_profile_pallas_batched(params, pairs, sb=None, interpret=False):
    """pairs: list of (p1, p2); same contract as dp_profile_jax_batched."""
    n = len(pairs)
    if sb is None:
        sb = 8 if n >= 5 else 1
    w1p = max(_pallas_bucket(p1.width) for p1, _ in pairs)
    w2p = max(_pallas_bucket(p2.width) for _, p2 in pairs)
    w2pe = w2p + LANE_PAD
    blk = _row_block(sb, w2pe)

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
                            interpret=interpret)
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
