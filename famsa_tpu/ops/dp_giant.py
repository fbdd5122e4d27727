"""Width-agnostic single-merge profile DP: the staggered-fold kernel.

The batched Mosaic kernel (ops/dp_pallas.py) compiles per (w1p, w2p)
bucket; each fresh bucket of a giant merge costs minutes of Mosaic
compile through the axon tunnel, which made the device DP unusable at
the top of a 100k-sequence guide tree (round-3 flagship ran the whole
alignment stage on host).  This module is the device analog of the
reference's width-agnostic thread wavefront (profile_par.cpp:441-905):

 - ONE merge per dispatch; the 8 sublanes carry 8 column FOLDS of that
   merge (fold f = global columns [f*LW, (f+1)*LW)), so a single merge
   uses full (8, 128) vregs instead of the 1/8 sublane utilization of
   the batched kernel's sb=1 fallback;
 - folds run as a software wavefront: at grid step t, sublane f
   computes DP rows [(t-f)*blk, (t-f+1)*blk) of fold f - one row-block
   behind fold f-1, exactly the reference's staggered thread start
   (profile_par.cpp:214-230).  Cross-fold coupling per row is O(1):
   fold f's lane 0 reads fold f-1's last-column D/H/V of the same row,
   and the H channel's max-plus prefix scan is seeded with fold f-1's
   running max - both written to a VMEM edge buffer one step earlier
   and read via a one-sublane roll;
 - the grid length is DYNAMIC (a traced scalar): one compiled program
   per LW variant covers EVERY row count, so a progressive alignment
   pays at most len(_LWS) Mosaic compiles per session no matter how
   merge shapes evolve;
 - all arithmetic is (hi, lo) i32-pair mode (no per-merge overflow
   analysis needed), costs are built in-kernel per row;
 - only the O(W) traceback path leaves the device (ops/dp_pallas.py's
   packed-emit pull), and the merged profile counters are computed on
   device (merged_counters_device) at a FIXED [GMAX_W+1, 32] shape so
   chained trees feed merge k+1 from merge k without a host round trip
   (the chain would otherwise serialize on the ~26 ms tunnel latency).

Bit-exact vs core/dp.py (tests/test_dp_giant.py, interpreter mode).
"""

import functools
import os

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.defs import NO_AMINOACIDS_AND_GAPS
from .dp_pallas import (COL0_PACK, LANE_PAD, NEG_HI, NEG_LO, MergedRef,
                        PendingPaths, _D, _H, _V, _forward_paths, _k_pmul_u32,
                        _leaf_counters_dev_b, _pack_kernel_inputs,
                        _stage0_one, _traceback_one, _traceback_runs,
                        merged_counters_device,
                        p_add, p_gt, p_max, p_sub, p_where)

FOLDS = 8
BLK = 8
# the remote AOT helper charges minutes for the FIRST execution of each
# distinct program variant, so the variant space is kept tiny: two fold
# widths x two row buckets x {dense, chained} profile2 (row padding
# wastes no compute - the dynamic grid stops at the true row count)
_LWS = (1024, 2048)
# stage 0 reserves LANE_PAD trailing lanes (ops/dp_pallas.py), so the
# widest profile2 an lw variant covers is 8*lw - LANE_PAD columns
GMAX_W = FOLDS * _LWS[-1] - LANE_PAD
# fixed row count of device-resident merged counter tensors: giant
# results all share this shape so chained dispatches reuse one program
GMAX_ROWS = FOLDS * _LWS[-1] + 1


def lw_for(w2):
    """Smallest fold width whose 8 folds cover DP columns 0..w2."""
    for lw in _LWS:
        if w2 <= FOLDS * lw - LANE_PAD:
            return lw
    return None


def _w1_bucket(w1):
    """Row padding (array shapes only: the dynamic grid stops at the
    true row-block count, so padding wastes no compute; coarse buckets
    bound the compiled-variant count)."""
    return 1024 if w1 <= 1024 else 16384


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------
def _make_giant_kernel(lw, blk, banded=False):
    def kernel(scal_ref, h0p_ref, lastm_ref, colf_ref, s2_ref,
               rowf_ref, c1_ref, dirs_ref, fin_ref, prev_ref, edge_ref):
        i = pl.program_id(0)
        w1m1 = scal_ref[0, 0]
        t_fin = scal_ref[0, 1]

        fidx = jax.lax.broadcasted_iota(jnp.int32, (FOLDS, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (FOLDS, lw), 1)
        gl = fidx * np.int32(lw) + lane            # global DP column
        neg = (jnp.full((FOLDS, lw), NEG_HI, jnp.int32),
               jnp.full((FOLDS, lw), NEG_LO, jnp.int32))
        z = jnp.int32(0)
        c_D, c_H, c_V = jnp.int32(_D), jnp.int32(_H), jnp.int32(_V)
        gl0 = gl == 0
        pm = _k_pmul_u32

        # column factors (pair layout, ops/dp_pallas.py plane map)
        cumE = (colf_ref[0], colf_ref[1])
        cumT = (colf_ref[2], colf_ref[3])
        (g2so_c, g2se_c, g2sto_c, g2ste_c, g2ce_c, g2cte_c) = (
            colf_ref[4 + k] for k in range(6))

        def cp(k):
            return (colf_ref[k], colf_ref[k + 1])

        p2o_p, p2e_p = cp(10), cp(12)
        p2to_p, p2te_p = cp(14), cp(16)
        g2chg_p = cp(18)
        dE_p = p_sub(p2e_p, p2o_p)
        dT_p = p_sub(p2te_p, p2to_p)

        # DP row 0 boundary planes (injected where a fold's first real
        # row appears, replacing the batched kernel's i==0 init)
        h0 = (h0p_ref[0], h0p_ref[1])
        h0s = (h0p_ref[2], h0p_ref[3])
        D0 = (jnp.where(gl0, z, neg[0]), jnp.where(gl0, z, neg[1]))
        gl1 = gl == 1
        D0s = (jnp.where(gl1, z, neg[0]), jnp.where(gl1, z, neg[1]))

        lastm = lastm_ref[:, :] != 0
        fin_col = jax.lax.broadcasted_iota(jnp.int32, (FOLDS, 8), 1)

        # cross-fold edges written by the previous grid step: sublane f
        # reads fold f-1's values (one sublane roll of the snapshot)
        edges = jnp.roll(edge_ref[:, :], 1, axis=0)    # (8, blk*8)

        def epair(r, k):
            c = r * 8 + k
            return (edges[:, c:c + 1], edges[:, c + 1:c + 2])   # (8,1) pair

        def _ld(ci):
            return (prev_ref[2 * ci], prev_ref[2 * ci + 1])

        carry = ((_ld(0), _ld(1), _ld(2)), (_ld(3), _ld(4), _ld(5)))

        def s2p(s):
            return (s2_ref[2 * s], s2_ref[2 * s + 1])

        def shf_e(x, e):
            """lane j <- j-1 within the fold; lane 0 <- fold f-1's last
            column (the cross-fold edge); fold 0's lane 0 <- -inf (the
            global 'head' boundary, as the batched kernel's shf)."""
            eh = jnp.where(fidx == 0, NEG_HI, e[0])
            el = jnp.where(fidx == 0, NEG_LO, e[1])
            l0 = lane == 0
            return (jnp.where(l0, eh, jnp.roll(x[0], 1, axis=1)),
                    jnp.where(l0, el, jnp.roll(x[1], 1, axis=1)))

        def p_cummax(x):
            h, l = x
            k = 1
            while k < lw:
                hs = jnp.where(lane >= k, jnp.roll(h, k, axis=1),
                               jnp.int32(NEG_HI))
                ls = jnp.where(lane >= k, jnp.roll(l, k, axis=1),
                               jnp.int32(NEG_LO))
                h, l = p_max((h, l), (hs, ls))
                k *= 2
            return h, l

        def rb(r, k):
            return rowf_ref[0, r, :, k:k + 1]          # (8, 1)

        def rbp(r, k):
            return (rb(r, k), rb(r, k + 1))

        saved = []
        for r in range(blk):
            (pD, pH, pV), (pDs, pHs, pVs) = carry
            gr = (i - fidx) * np.int32(blk) + np.int32(r)   # (8, 1)
            m0 = gr == 0
            # first real row of this fold: previous row is DP row 0
            pD = p_where(m0, D0, pD)
            pH = p_where(m0, h0, pH)
            pV = p_where(m0, neg, pV)
            pDs = p_where(m0, D0s, pDs)
            pHs = p_where(m0, h0s, pHs)
            pVs = p_where(m0, neg, pVs)

            # ---- per-row cost terms (pair mode, in-kernel MAC) ----
            tb = pm(c1_ref[0, r, :, 0:1], s2p(0))
            for s in range(1, NO_AMINOACIDS_AND_GAPS):
                tb = p_add(tb, pm(c1_ref[0, r, :, s:s + 1], s2p(s)))
            tmH = p_add(tb, p_add(pm(rb(r, 16), dE_p), pm(rb(r, 17), dT_p)))
            tmV = p_add(tb, pm(rb(r, 18), g2chg_p))
            gvs = p_add(p_add(pm(g2so_c, rbp(r, 2)), pm(g2se_c, rbp(r, 4))),
                        p_add(pm(g2sto_c, rbp(r, 6)), pm(g2ste_c, rbp(r, 8))))
            gvc0 = p_add(pm(g2ce_c, rbp(r, 4)), pm(g2cte_c, rbp(r, 8)))
            gvc = p_where(gl0, rbp(r, 10), gvc0)
            ghs = p_add(p_add(pm(rb(r, 12), p2o_p), pm(rb(r, 13), p2e_p)),
                        p_add(pm(rb(r, 14), p2to_p), pm(rb(r, 15), p2te_p)))
            ghc0 = p_add(pm(rb(r, 0), p2e_p), pm(rb(r, 1), p2te_p))
            ghc = (jnp.where(gl0, z, ghc0[0]), jnp.where(gl0, z, ghc0[1]))
            bc = p_add(pm(rb(r, 0), cumE), pm(rb(r, 1), cumT))
            if banded:
                blo_r, bhi_r = rb(r, 19), rb(r, 20)
                inb = (gl >= blo_r) & (gl <= bhi_r)

            # ---- D channel (previous row, col j-1) ----
            tDd = p_add(pDs, tb)
            tHd = p_add(pHs, tmH)
            tVd = p_add(pVs, tmV)
            pickD = p_gt(tDd, tHd) & p_gt(tDd, tVd)
            pickH = (~pickD) & p_gt(tHd, tVd)
            D = p_where(pickD, tDd, p_where(pickH, tHd, tVd))
            dD = jnp.where(pickD, c_D, jnp.where(pickH, c_H, c_V))
            D = p_where(gl0, neg, D)
            if banded:
                D = p_where(inb, D, neg)

            three = (gr >= 1) & (gl >= 2)

            # ---- V channel (previous row, same col) ----
            tDv = p_add(pD, gvs)
            tHv = p_add(pH, gvs)
            tVv = p_add(pV, gvc)
            gDH = p_gt(tDv, tHv)
            gDH2 = gDH | (~three)
            mDHv = p_where(gDH2, tDv, tHv)
            gDV = p_gt(mDHv, tVv)
            V = p_where(gDV, mDHv, tVv)
            dV = jnp.where(gDV, jnp.where(gDH2, c_D, c_H), c_V)
            V0vec = p_add(p_max(pD, pV), gvc)
            von = gr < w1m1
            Vb = p_where(von, V0vec, neg)
            V = p_where(gl0, Vb, V)
            if banded:
                V = p_where(inb | gl0, V, neg)

            # ---- H channel: seeded max-plus prefix scan ----
            Ds = shf_e(D, epair(r, 0))
            Vs = shf_e(V, epair(r, 4))
            mD = p_add(Ds, ghs)
            mV = p_add(Vs, ghs)
            m = p_where(three, p_max(mD, mV), mD)
            run = p_cummax(p_sub(m, bc))
            sh, sl = epair(r, 6)
            seed = (jnp.where(fidx == 0, NEG_HI, sh),
                    jnp.where(fidx == 0, NEG_LO, sl))
            run = p_max(run, seed)
            H = p_add(bc, p_max(run, neg))
            H = p_where(gl0, neg, H)
            if banded:
                H = p_where(inb, H, neg)
            Hs = shf_e(H, epair(r, 2))

            tHh2 = p_add(Hs, ghc)
            pickD3h = p_gt(mD, tHh2) & p_gt(mD, mV)
            pickV3h = (~pickD3h) & p_gt(mV, tHh2)
            h3 = jnp.where(pickD3h, c_D, jnp.where(pickV3h, c_V, c_H))
            dH = jnp.where(three, h3, jnp.where(p_gt(mD, tHh2), c_D, c_H))

            packed = dD | (dH << 2) | (dV << 4)
            packed = jnp.where(gl0, jnp.int32(COL0_PACK), packed)
            dirs_ref[0, r] = packed

            # edges for fold f+1's same row, read next grid step
            le = lw - 1
            ed = jnp.concatenate(
                [D[0][:, le:], D[1][:, le:], H[0][:, le:], H[1][:, le:],
                 V[0][:, le:], V[1][:, le:], run[0][:, le:], run[1][:, le:]],
                axis=1)
            edge_ref[:, r * 8:(r + 1) * 8] = ed
            saved.append((D, H, V))
            carry = ((D, H, V), (Ds, Hs, Vs))

        (D, H, V), (Ds, Hs, Vs) = carry
        for ci, ch in enumerate((D, H, V, Ds, Hs, Vs)):
            prev_ref[2 * ci] = ch[0]
            prev_ref[2 * ci + 1] = ch[1]

        # last-column finals: only the step holding DP row w1-1 of the
        # fold containing column w2 (scalar-gated; rows elsewhere unused)
        @pl.when(i == t_fin)
        def _():
            for r in range(blk):
                Dr, Hr, Vr = saved[r]

                def pick(ch):
                    return (jnp.sum(jnp.where(lastm, ch[0], z), axis=1,
                                    dtype=jnp.int32),
                            jnp.sum(jnp.where(lastm, ch[1], z), axis=1,
                                    dtype=jnp.int32))

                fD, fH, fV = pick(Dr), pick(Hr), pick(Vr)
                fin = (jnp.where(fin_col == 0, fD[0][:, None], z)
                       + jnp.where(fin_col == 1, fD[1][:, None], z)
                       + jnp.where(fin_col == 2, fH[0][:, None], z)
                       + jnp.where(fin_col == 3, fH[1][:, None], z)
                       + jnp.where(fin_col == 4, fV[0][:, None], z)
                       + jnp.where(fin_col == 5, fV[1][:, None], z))
                fin_ref[0, r] = fin

    return kernel


def _run_giant(scal, h0p, lastm, colf, s2stk, rowf_st, c1_st, T, lw, blk,
               banded=False, interpret=False):
    tm = rowf_st.shape[0]

    def bm(bs, im):
        return pl.BlockSpec(bs, im, memory_space=pltpu.VMEM)

    z0 = np.int32(0)
    in_specs = [
        bm((1, 8), lambda i: (z0, z0)),
        bm((4, FOLDS, lw), lambda i: (z0, z0, z0)),
        bm((FOLDS, lw), lambda i: (z0, z0)),
        bm((colf.shape[0], FOLDS, lw), lambda i: (z0, z0, z0)),
        bm((s2stk.shape[0], FOLDS, lw), lambda i: (z0, z0, z0)),
        bm((1, blk, FOLDS, rowf_st.shape[3]), lambda i: (i, z0, z0, z0)),
        bm((1, blk, FOLDS, 32), lambda i: (i, z0, z0, z0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((tm, blk, FOLDS, lw), jnp.int32),   # dirs
        jax.ShapeDtypeStruct((tm, blk, FOLDS, 8), jnp.int32),    # finals
    ]
    out_specs = [
        bm((1, blk, FOLDS, lw), lambda i: (i, z0, z0, z0)),
        bm((1, blk, FOLDS, 8), lambda i: (i, z0, z0, z0)),
    ]
    return pl.pallas_call(
        _make_giant_kernel(lw, blk, banded=banded),
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((12, FOLDS, lw), jnp.int32),
                        pltpu.VMEM((FOLDS, blk * 8), jnp.int32)],
        interpret=interpret,
    )(scal, h0p, lastm, colf, s2stk, rowf_st, c1_st)


# ---------------------------------------------------------------------------
# jitted wrapper: stage 0 + fold/stagger prep + kernel + traceback + pack
# ---------------------------------------------------------------------------
def _side_counters(c, leaf, wp):
    """Resolve one side to a [wp+1, 32] i32 counter tensor inside the
    jitted program: c is a dense upload / device-resident tensor
    (possibly [1, GMAX_ROWS, 32] from a chained giant result), or leaf
    symbol bytes [wp] one-hotted on device (32x smaller upload for
    ungapped leaves)."""
    if leaf is not None:
        return _leaf_counters_dev_b(leaf[None], wp=wp)[0]
    if c.ndim == 3:
        c = c[0]
    if c.shape[0] >= wp + 1:
        return c[:wp + 1].astype(jnp.int32)
    out = jnp.zeros((wp + 1, 32), jnp.int32)
    return out.at[:c.shape[0]].set(c.astype(jnp.int32))


def _giant_core(c1s, leaf1, c2s, leaf2, w1, w2, card1, card2, sm, gp,
                lw, w1p, blk=BLK, interpret=False, banded=False,
                blo=None, bhi=None, merged=False, nl=4, want_width=False,
                skip_tb=False):
    """Traceable giant-merge body (jitted as _dp_giant_tb; also traced
    inside the chain scan, ops/dp_chain.py).  want_width additionally
    returns the merged width (path length) as a device scalar - the
    chain carry needs it without a host pull.  skip_tb: measurement-only
    (scripts/chain_profile.py ablation) - stop after the DP kernel and
    return a tiny slice that keeps it live."""
    w2p_eff = FOLDS * lw - LANE_PAD
    c1d = _side_counters(c1s, leaf1, w1p)
    c2d = _side_counters(c2s, leaf2, w2p_eff)
    colp, xs = _stage0_one(c1d, c2d, w1, w2, card1, card2, sm, gp,
                           w1p, w2p_eff, jnp.int64)
    if banded:
        xs["blo"] = blo.astype(jnp.int32)
        xs["bhi"] = bhi.astype(jnp.int32)
    colp = {k: v[None, None] for k, v in colp.items()}
    xs = {k: jnp.asarray(v)[None, None] for k, v in xs.items()}
    (w1m1, h0hi, h0lo, lastm, colf, rowf, s2stk, c1stk) = \
        _pack_kernel_inputs(colp, xs, w1p, w2p_eff, single=False)

    def fold(x):
        return x.reshape(x.shape[:-1] + (FOLDS, lw))

    colf_g = fold(colf[0, :, 0])                    # [P, 8, lw]
    s2_g = fold(s2stk[0, :, 0])                     # [60, 8, lw]
    lastm_g = fold(lastm[0, 0].astype(jnp.int32))   # [8, lw]
    h0h, h0l = h0hi[0, 0], h0lo[0, 0]
    h0sh = jnp.concatenate([jnp.full((1,), NEG_HI, jnp.int32), h0h[:-1]])
    h0sl = jnp.concatenate([jnp.full((1,), NEG_LO, jnp.int32), h0l[:-1]])
    h0p = jnp.stack([fold(h0h), fold(h0l), fold(h0sh), fold(h0sl)])

    def stag(x):
        """[w1p, K] row-indexed -> [tm, blk, 8, K] staggered: sublane f
        at grid step t reads rows (t-f)*blk.. (garbage-padded)."""
        padded = jnp.stack(
            [jnp.pad(x, ((f * blk, (FOLDS - 1 - f) * blk), (0, 0)))
             for f in range(FOLDS)], axis=1)
        tm = w1p // blk + FOLDS - 1
        return padded.reshape(tm, blk, FOLDS, x.shape[-1])

    rowf_g = stag(rowf[0, :, 0, :])
    c1_g = stag(c1stk[0, :, 0, :])

    w1 = w1.astype(jnp.int32)
    w2 = w2.astype(jnp.int32)
    nrb = (w1 + blk - 1) // blk
    T = nrb + FOLDS - 1
    sf = w2 // lw
    r_fin = (w1 - 1) % blk
    t_fin = sf + (w1 - 1) // blk
    scal = jnp.stack([w1 - 1, t_fin, sf, jnp.int32(0)] + [jnp.int32(0)] * 4
                     ).reshape(1, 8).astype(jnp.int32)

    dirs_st, fins_st = _run_giant(scal, h0p, lastm_g, colf_g, s2_g,
                                  rowf_g, c1_g, T, lw, blk,
                                  banded=banded, interpret=interpret)
    if skip_tb:
        return (dirs_st[0, 0, 0, :16] + fins_st[0, 0, 0, :1])[None, :]

    # finals -> dir0 / total (reference final-cell pick, profile.cpp)
    f = jax.lax.dynamic_slice(fins_st, (t_fin, r_fin, sf, jnp.int32(0)),
                              (1, 1, 1, 8)).reshape(8)

    def join(hi, lo):
        return (hi.astype(jnp.int64) << np.int64(32)) | \
               (lo.astype(jnp.int64) & np.int64(0xFFFFFFFF))

    d0 = join(f[0], f[1])
    h0v = join(f[2], f[3])
    v0 = join(f[4], f[5])
    pick_d = (d0 >= h0v) & (d0 >= v0)
    pick_h = (~pick_d) & (h0v > v0)
    dir0 = jnp.where(pick_d, jnp.int32(_D),
                     jnp.where(pick_h, jnp.int32(_H), jnp.int32(_V)))
    total = jnp.where(pick_d, d0, jnp.where(pick_h, h0v, v0))

    # unstagger: row g of fold f lives at [(g//blk)+f, g%blk, f, :], i.e.
    # flat row g + f*blk - a static slice per fold
    tm = w1p // blk + FOLDS - 1
    st2 = dirs_st.reshape(tm * blk, FOLDS, lw)
    dirs_m = jnp.concatenate(
        [jax.lax.slice(st2, (fd * blk, fd, 0), (fd * blk + w1p, fd + 1, lw))
         .reshape(w1p, lw) for fd in range(FOLDS)], axis=1)

    # run-jumping traceback: chain-shaped merges (w2 >> w1) spend ~11 ms
    # in the per-cell walk (scripts/giant_profile.py) vs ~w1 serial steps
    # of run jumps
    emits = _traceback_runs(dirs_m, w1, w2, dir0, w1p + FOLDS * lw)

    s = emits.shape[0]
    sp = -(-s // 16) * 16
    if sp > s:
        emits = jnp.concatenate([emits, jnp.full((sp - s,), 3, jnp.int32)])
    ew = emits.reshape(sp // 16, 16)
    shifts = (2 * jnp.arange(16, dtype=jnp.int32))[None, :]
    packed_e = jnp.sum(ew << shifts, axis=1, dtype=jnp.int32)
    tot_hi = (total >> np.int64(32)).astype(jnp.int32)
    tot_lo = total.astype(jnp.int32)
    packed = jnp.concatenate(
        [packed_e, dir0[None], tot_hi[None], tot_lo[None]])[None, :]
    if not merged:
        return packed
    fwd = _forward_paths(emits[None], dir0[None])[0]
    mc = merged_counters_device(c1d, c2d, fwd, w1, w2, card1, card2, nl=nl,
                                blocked=True)
    # standardized device-resident shape: every giant result is
    # [GMAX_ROWS, 32] so chained dispatches hit one compiled program
    if mc.shape[0] >= GMAX_ROWS:
        mc = mc[:GMAX_ROWS]
    else:
        mc = jnp.zeros((GMAX_ROWS, 32), jnp.int32).at[:mc.shape[0]].set(mc)
    if want_width:
        width = jnp.sum((emits != 3).astype(jnp.int32), dtype=jnp.int32)
        return packed, mc, width
    return packed, mc


# gp (gap costs) is TRACED: params.adjust rescales gap costs with the
# input's sequence count, and a static gp would fork a fresh compiled
# variant (minutes on the remote AOT helper) per family size.
_dp_giant_tb = functools.partial(jax.jit, static_argnames=(
    "lw", "w1p", "blk", "interpret", "banded", "merged", "nl",
    "want_width"))(_giant_core)


# ---------------------------------------------------------------------------
# host-side dispatch
# ---------------------------------------------------------------------------
def _gather_side(p, dev, wp):
    """(counters|None, leaf_syms|None) upload plan for one merge side.
    Every returned array has a shape determined ONLY by (wp,) - a
    width-dependent upload shape would recompile the whole giant program
    per distinct profile width."""
    if dev is not None:
        if isinstance(dev, MergedRef) and dev.batch.shape[0] == 1 \
                and dev.batch.shape[1] == GMAX_ROWS:
            return dev.batch, None          # giant chain: zero eager ops
        if isinstance(dev, MergedRef):
            t = dev.batch[dev.k, :min(dev.rows, wp + 1)]
        else:
            t = dev[:wp + 1]
        if t.shape[0] == wp + 1:
            return t, None
        import jax.numpy as _jnp
        return _jnp.zeros((wp + 1, 32), _jnp.int32).at[:t.shape[0]].set(
            t.astype(_jnp.int32)), None
    gs = p.data[0] if len(p.data) == 1 else None
    if gs is not None and int(gs.n_gaps.sum()) == 0 and gs.size <= wp:
        syms = np.full((wp,), 31, dtype=np.int8)
        syms[:gs.size] = gs.symbols
        return None, syms
    # fixed i32 upload dtype: a data-dependent _shrink dtype would fork
    # another compiled variant per magnitude class
    c = np.zeros((wp + 1, 32), dtype=np.int32)
    c[:p.width + 1] = p.counters
    return c, None


def dp_profile_giant_paths_async(params, p1, p2, dev1=None, dev2=None,
                                 bands=None, want_merged=False,
                                 interpret=False):
    """One giant merge, dispatched without blocking; returns PendingPaths
    (n=1).  dev1/dev2: optional device-resident counter tensors (from a
    previous giant/batched merge); those sides upload nothing."""
    w1, w2 = p1.width, p2.width
    lw = lw_for(w2)
    if lw is None:
        raise ValueError(f"merge too wide for giant kernel: w2={w2}")
    w1p = _w1_bucket(w1)

    c1, leaf1 = _gather_side(p1, dev1, w1p)
    c2, leaf2 = _gather_side(p2, dev2, FOLDS * lw - LANE_PAD)

    banded = bands is not None
    blo = bhi = None
    if banded:
        lo, hi = bands
        blo_np = np.zeros(w1p, np.int32)
        bhi_np = np.full(w1p, w2, np.int32)
        blo_np[:w1] = lo[1:w1 + 1]
        bhi_np[:w1] = hi[1:w1 + 1]
        blo, bhi = jnp.asarray(blo_np), jnp.asarray(bhi_np)

    gp = (np.int64(params.gap_open), np.int64(params.gap_ext),
          np.int64(params.gap_term_open), np.int64(params.gap_term_ext))
    sm = jnp.asarray(np.asarray(params.score_matrix, dtype=np.int64))

    # fixed limb count (covers card < 2^21 = 2M sequences): a
    # card-dependent nl would fork another compiled variant per scale
    maxcard = max(len(p1.data), len(p2.data))
    nl = 3 if maxcard < (1 << 21) else 4

    out = _dp_giant_tb(
        None if c1 is None else jnp.asarray(c1),
        None if leaf1 is None else jnp.asarray(leaf1),
        None if c2 is None else jnp.asarray(c2),
        None if leaf2 is None else jnp.asarray(leaf2),
        np.int32(w1), np.int32(w2),
        np.int32(len(p1.data)), np.int32(len(p2.data)),
        sm, gp, lw=lw, w1p=w1p, blk=BLK, interpret=interpret,
        banded=banded, blo=blo, bhi=bhi, merged=want_merged, nl=nl)
    if want_merged:
        packed, mc = out
        return PendingPaths(packed, 1, mc[None])
    return PendingPaths(out, 1)


def dp_profile_giant_paths(params, p1, p2, bands=None, interpret=False):
    """Blocking variant."""
    return dp_profile_giant_paths_async(
        params, p1, p2, bands=bands, interpret=interpret).resolve()


_PREWARMED = False


def prewarm(block=False):
    """Compile + first-execute the hot giant-program variants on tiny
    inputs so production dispatches find them warm: the remote AOT
    helper charges the FIRST execution of each distinct program minutes,
    which would otherwise land in the middle of the alignment stage.
    Runs in a daemon thread (jit compilation releases the GIL) so the
    warmup overlaps the host-side alignment phase; later real dispatches
    of an already-warm variant are unaffected."""
    global _PREWARMED
    if _PREWARMED or os.environ.get("FAMSA_TPU_PREWARM", "1") != "1":
        return None
    if jax.default_backend() != "tpu":
        # Mosaic programs only exist on TPU; compiling them on the CPU
        # fallback backend wastes minutes and leaves a daemon compile
        # thread alive at interpreter exit (observed SIGABRT)
        return None
    _PREWARMED = True
    import threading

    import jax as _jax
    import jax.numpy as _jnp

    from ..core.params import Params

    params = Params()
    params.adjust(100)
    gp = (np.int64(params.gap_open), np.int64(params.gap_ext),
          np.int64(params.gap_term_open), np.int64(params.gap_term_ext))
    sm = _jnp.asarray(np.asarray(params.score_matrix, dtype=np.int64))

    def one(w1p, lw, side1, side2):
        w2p_eff = FOLDS * lw - LANE_PAD
        c1 = leaf1 = None
        if side1 == "leaf":
            leaf1 = _jnp.full((w1p,), 31, _jnp.int8)
        else:
            c1 = _jnp.zeros((w1p + 1, 32), _jnp.int32)
        if side2 == "dev":
            c2 = _jnp.zeros((1, GMAX_ROWS, 32), _jnp.int32)
        else:
            c2 = _jnp.zeros((w2p_eff + 1, 32), _jnp.int32)
        out = _dp_giant_tb(c1, leaf1, c2, None, np.int32(8), np.int32(8),
                           np.int32(1), np.int32(2), sm, gp, lw=lw,
                           w1p=w1p, merged=True, nl=3)
        _jax.block_until_ready(out)

    def run():
        for v in ((16384, 1024, "dense", "dense"),
                  (16384, 1024, "dense", "dev"),
                  (16384, 2048, "dense", "dense"),
                  (16384, 2048, "dense", "dev"),
                  (1024, 2048, "dense", "dense"),
                  (1024, 2048, "dense", "dev"),
                  (1024, 2048, "leaf", "dev")):
            try:
                one(*v)
            except Exception:
                pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    if block:
        t.join()
    return t
