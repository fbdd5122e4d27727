"""JAX/TPU profile-alignment DP.

One jitted kernel covers both the profile-profile and sequence-profile
recurrences of the reference (profile_seq.cpp:165-892): for a single-
sequence profile1 the gap-correction precomputes reduce exactly to the
sequence-profile constants, including tie-breaking, so the kernels are
mathematically identical (verified by the parity test).

Design (TPU-first):
 - per-row match scores t = scores2[:, :30] . counters1[i, :30] as an
   explicit mul+reduce (an s64 dot_general is rejected by the TPU X64
   rewriter);
 - D and V channels are full-width vector ops off the previous row;
 - the H channel's intra-row dependency is a max-plus prefix scan
   H[j] = B[j] + cummax(m[k] - B[k]), exact in int64, implemented as a
   log-depth Hillis-Steele scan (lax.cummax on s64 lowers pathologically);
 - lax.scan over rows emits a packed 2-bit x3 direction byte per cell
   (the reference CDPMatrix layout, profile.h:36-149);
 - shapes are bucketed (pad-and-mask) to bound recompilation;
 - the kernel takes NO traced scalars: traced scalar jit arguments
   (w1/w2/cardinalities) pessimize the compiled TPU loop ~80x, so all
   boundary logic is folded into host-precomputed arrays.

Traceback stays on host (O(W), sequential).
"""

import functools

import jax

jax.config.update("jax_enable_x64", True)   # exact int64 DP scores

import jax.numpy as jnp
import numpy as np

from ..core.defs import (GAP_EXT, GAP_OPEN, GAP_TERM_EXT, GAP_TERM_OPEN,
                         INFTY, NO_AMINOACIDS, NO_AMINOACIDS_AND_GAPS)

NEG_INF = np.int64(-INFTY)
_D, _H, _V = 0, 1, 2

# dim buckets to bound the number of compiled shapes
_BUCKETS = [64, 128, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096,
            6144, 8192, 12288, 16384, 24576, 32768]


def _bucket(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + 4095) // 4096) * 4096


def _cummax_log(x):
    """Inclusive max-scan, log-depth Hillis-Steele (exact for ints)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.pad(x[..., :-k], [(0, 0)] * (x.ndim - 1) + [(k, 0)],
                          constant_values=NEG_INF)
        x = jnp.maximum(x, shifted)
        k *= 2
    return x


def _cumsum_log(x):
    """Inclusive add-scan, log-depth (exact for ints)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.pad(x[..., :-k], [(0, 0)] * (x.ndim - 1) + [(k, 0)])
        x = x + shifted
        k *= 2
    return x


def _gap_correction_arrays(counters, w, card):
    """DP_SolveGapsProblemWhenStarting/Continuing vectorized over columns
    (profile.cpp:1223-1315). counters: [Wp+1, 32]; valid cols 1..w."""
    c = counters
    wp = counters.shape[0] - 1
    j = np.arange(wp + 1)
    nxt = np.minimum(j + 1, wp)
    internal = (j >= 1) & (j < w)
    at_end = j == w

    st_to = np.where(internal, c[nxt, GAP_TERM_OPEN], 0)
    st_te = np.where(internal, c[j, GAP_TERM_OPEN] + c[j, GAP_TERM_EXT], 0)
    st_ext = np.where(internal, c[j, GAP_OPEN] + c[j, GAP_EXT], 0)
    cnt_end = c[j, GAP_TERM_OPEN] + c[j, GAP_TERM_EXT]
    st_te = np.where(at_end, cnt_end, st_te)
    st_to = np.where(at_end, card - cnt_end, st_to)
    st_open = np.where(internal, card - st_ext - st_to - st_te, 0)

    ct_te = np.where(internal, c[nxt, GAP_TERM_OPEN] + c[j, GAP_TERM_OPEN]
                     + c[j, GAP_TERM_EXT], 0)
    ct_te = np.where(at_end, card, ct_te)
    ct_ext = np.where(internal | at_end, card - ct_te, 0)
    dead = ~(internal | at_end)
    ct_te = np.where(dead, 0, ct_te)
    return (st_open.astype(np.int64), st_ext.astype(np.int64),
            st_to.astype(np.int64), st_te.astype(np.int64),
            ct_ext.astype(np.int64), ct_te.astype(np.int64))


@functools.partial(jax.jit, static_argnames=("w1p", "w2p", "unroll"))
def _dp_kernel(col, xs, w1p, w2p, unroll=8):
    """Scalar-free DP over bucketed shapes.

    col: dict of column-shaped arrays (loop constants):
      s2_sym [w2p+1, 30], p2gaps [4, w2p+1], gaps2_change [w2p+1],
      h0_row [w2p+1], last_col_mask [w2p+1] bool,
      g2so/g2se/g2sto/g2ste/g2ce/g2cte [w2p] (columns 1..w2p).
    xs: dict of per-row arrays (leading dim w1p) - see _prepare_inputs.

    Returns (dirs [w1p+1, w2p+1] uint8 packed, lastD/H/V [w1p])."""
    jj = jnp.arange(w2p + 1)
    s2_sym = col["s2_sym"]
    p2o, p2e, p2to, p2te = col["p2gaps"]
    gaps2_change = col["gaps2_change"]
    h0_row = col["h0_row"]
    last_col_mask = col["last_col_mask"]
    g2so, g2se, g2sto, g2ste = col["g2so"], col["g2se"], col["g2sto"], col["g2ste"]
    g2ce, g2cte = col["g2ce"], col["g2cte"]

    dge_go = p2e - p2o
    dgte_gto = p2te - p2to

    prevD = jnp.where(jj == 0, jnp.int64(0), NEG_INF)
    prevH = h0_row
    prevV = jnp.full(w2p + 1, NEG_INF)

    dirs_row0 = jnp.where((jj >= 1), jnp.uint8(_H | (_H << 2) | (_H << 4)),
                          jnp.uint8(0))
    j_gt1 = jj[1:] > 1

    def row_step(carry, x):
        pD, pH, pV = carry

        # match scores for this row: [w2p+1]
        t = (s2_sym * x["c1"][None, :]).sum(axis=1)

        # ---- D channel ----
        tD = pD[:-1] + t[1:]
        delta = x["n1c"] * dge_go[1:] + x["n1tc"] * dgte_gto[1:]
        tH = pH[:-1] + t[1:] + delta
        tV = pV[:-1] + t[1:] + gaps2_change[1:] * x["col1nng"]
        pickD = (tD > tH) & (tD > tV)
        pickH = (~pickD) & (tH > tV)
        D_ = jnp.where(pickD, tD, jnp.where(pickH, tH, tV))
        dD = jnp.where(pickD, _D, jnp.where(pickH, _H, _V)).astype(jnp.uint8)

        three = x["i_gt1"] & j_gt1

        # ---- V channel ----
        gv_s = (x["s1go"] * g2so + x["s1ge"] * g2se
                + x["s1gto"] * g2sto + x["s1gte"] * g2ste)
        gv_c = x["s1ge"] * g2ce + x["s1gte"] * g2cte
        tD = pD[1:] + gv_s
        tV = pV[1:] + gv_c
        tH = pH[1:] + gv_s
        pickD3 = (tD > tH) & (tD > tV)
        pickH3 = (~pickD3) & (tH > tV)
        v3 = jnp.where(pickD3, tD, jnp.where(pickH3, tH, tV))
        d3 = jnp.where(pickD3, _D, jnp.where(pickH3, _H, _V)).astype(jnp.uint8)
        pickD2 = tD > tV
        V_ = jnp.where(three, v3, jnp.where(pickD2, tD, tV))
        dV = jnp.where(three, d3,
                       jnp.where(pickD2, _D, _V).astype(jnp.uint8))

        # boundary col 0 (i<w1 / i==1 folded into v0_on / v0_cost)
        V0 = jnp.where(x["v0_on"],
                       jnp.maximum(pD[0], pV[0]) + x["v0_cost"], NEG_INF)
        Dfull = jnp.concatenate([jnp.array([NEG_INF]), D_])
        Vfull = jnp.concatenate([V0[None], V_])

        # ---- H channel (max-plus prefix scan) ----
        gh_s = (p2o[1:] * x["g1so"] + p2e[1:] * x["g1se"]
                + p2to[1:] * x["g1sto"] + p2te[1:] * x["g1ste"])
        gh_c = p2e[1:] * x["g1ce"] + p2te[1:] * x["g1cte"]
        m = Dfull[:-1] + gh_s
        mv = Vfull[:-1] + gh_s
        m = jnp.where(three, jnp.maximum(m, mv), m)
        bc = _cumsum_log(gh_c)
        run = _cummax_log(m - bc)
        H_ = bc + jnp.maximum(run, NEG_INF)      # H[0] = -inf feed
        Hfull = jnp.concatenate([jnp.array([NEG_INF]), H_])

        tD = Dfull[:-1] + gh_s
        tH = Hfull[:-1] + gh_c
        tV = Vfull[:-1] + gh_s
        pickD3 = (tD > tH) & (tD > tV)
        pickV3 = (~pickD3) & (tV > tH)
        h3 = jnp.where(pickD3, _D, jnp.where(pickV3, _V, _H)).astype(jnp.uint8)
        pickD2 = tD > tH
        dH = jnp.where(three, h3, jnp.where(pickD2, _D, _H).astype(jnp.uint8))

        packed = (dD | (dH << 2) | (dV << 4)).astype(jnp.uint8)
        col0 = jnp.uint8(_V | (_V << 2) | (_V << 4))
        packed = jnp.concatenate([col0[None], packed])

        lastD = jnp.where(last_col_mask, Dfull, NEG_INF).max()
        lastH = jnp.where(last_col_mask, Hfull, NEG_INF).max()
        lastV = jnp.where(last_col_mask, Vfull, NEG_INF).max()
        return (Dfull, Hfull, Vfull), (packed, lastD, lastH, lastV)

    (_, _, _), (dirs, lastD, lastH, lastV) = jax.lax.scan(
        row_step, (prevD, prevH, prevV), xs, unroll=unroll)

    dirs_all = jnp.concatenate([dirs_row0[None], dirs], axis=0)
    return dirs_all, lastD, lastH, lastV


class JaxDPResult:
    __slots__ = ("dirs_D", "dirs_H", "dirs_V", "last")


def _prepare_inputs(params, profile1, profile2, w1p, w2p):
    """Host-side precomputes; returns (col, xs) dicts of numpy arrays."""
    w1, w2 = profile1.width, profile2.width
    card1, card2 = len(profile1.data), len(profile2.data)

    def pad(a, wp):
        out = np.zeros((wp + 1, a.shape[1]), dtype=np.int64)
        out[:a.shape[0]] = a
        return out

    c1 = pad(profile1.counters, w1p)
    s1 = pad(profile1.scores, w1p)
    c2 = pad(profile2.counters, w2p)
    s2 = pad(profile2.scores, w2p)

    g1so, g1se, g1sto, g1ste, g1ce, g1cte = _gap_correction_arrays(c1, w1, card1)
    g2so, g2se, g2sto, g2ste, g2ce, g2cte = _gap_correction_arrays(c2, w2, card2)

    p2gaps = np.stack([s2[:, GAP_OPEN], s2[:, GAP_EXT],
                       s2[:, GAP_TERM_OPEN], s2[:, GAP_TERM_EXT]])
    gaps2_change = (c2[:, GAP_OPEN] * (params.gap_ext - params.gap_open)
                    + c2[:, GAP_TERM_OPEN] * (params.gap_term_ext - params.gap_term_open))

    jjn = np.arange(w2p + 1)
    # row 0 boundary (profile_seq.cpp:555-579)
    h0 = np.where(jjn == 1, p2gaps[2][1] * card1, p2gaps[3] * card1)
    h0 = np.concatenate([[0], np.cumsum(h0[1:])])
    h0 = np.where((jjn == 0) | (jjn == w2), NEG_INF, h0).astype(np.int64)

    ii = np.arange(1, w1p + 1)
    s1go = s1[1:, GAP_OPEN]
    s1ge = s1[1:, GAP_EXT]
    s1gto = s1[1:, GAP_TERM_OPEN]
    s1gte = s1[1:, GAP_TERM_EXT]

    col = dict(
        s2_sym=s2[:, :NO_AMINOACIDS_AND_GAPS],
        p2gaps=p2gaps,
        gaps2_change=gaps2_change,
        h0_row=h0,
        last_col_mask=(jjn == w2),
        g2so=g2so[1:], g2se=g2se[1:], g2sto=g2sto[1:], g2ste=g2ste[1:],
        g2ce=g2ce[1:], g2cte=g2cte[1:],
    )
    xs = dict(
        c1=c1[1:, :NO_AMINOACIDS_AND_GAPS],
        col1nng=c1[1:, :NO_AMINOACIDS].sum(axis=1),
        n1c=c1[1:, GAP_OPEN], n1tc=c1[1:, GAP_TERM_OPEN],
        s1go=s1go, s1ge=s1ge, s1gto=s1gto, s1gte=s1gte,
        g1so=g1so[1:], g1se=g1se[1:], g1sto=g1sto[1:],
        g1ste=g1ste[1:], g1ce=g1ce[1:], g1cte=g1cte[1:],
        i_gt1=(ii > 1),
        v0_on=(ii < w1),
        v0_cost=np.where(ii == 1, s1gto * card2, s1gte * card2).astype(np.int64),
    )
    return col, xs


_USE_PAIR_KERNEL = True   # i32-pair scan body (x64 pass is pathological)


def dp_profile_jax(params, profile1, profile2):
    """Unguided prof-prof / seq-prof DP on the JAX backend."""
    import famsa_tpu.ops.i64pair as P

    w1 = profile1.width
    w1p, w2p = _bucket(w1), _bucket(profile2.width)
    col, xs = _prepare_inputs(params, profile1, profile2, w1p, w2p)

    kern = _dp_kernel_pairs if _USE_PAIR_KERNEL else _dp_kernel
    dirs, lastD, lastH, lastV = kern(
        jax.tree_util.tree_map(jnp.asarray, col),
        jax.tree_util.tree_map(jnp.asarray, xs), w1p, w2p)

    dirs = np.asarray(dirs)
    res = JaxDPResult()
    res.dirs_D = (dirs & 3).astype(np.uint8)
    res.dirs_H = ((dirs >> 2) & 3).astype(np.uint8)
    res.dirs_V = ((dirs >> 4) & 3).astype(np.uint8)
    if _USE_PAIR_KERNEL:
        res.last = (int(P.to_i64(*lastD)[w1 - 1]),
                    int(P.to_i64(*lastH)[w1 - 1]),
                    int(P.to_i64(*lastV)[w1 - 1]))
    else:
        res.last = (int(np.asarray(lastD)[w1 - 1]),
                    int(np.asarray(lastH)[w1 - 1]),
                    int(np.asarray(lastV)[w1 - 1]))
    return res


# ----------------------------------------------------------------------
# Batched independent merges: vmap over the merge axis amortizes scan
# iteration overhead and device dispatch across a whole tree level.
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("w1p", "w2p", "unroll"))
def _dp_kernel_batched(col, xs, w1p, w2p, unroll=1):
    base = _dp_kernel_pairs if _USE_PAIR_KERNEL else _dp_kernel
    kern = functools.partial(base.__wrapped__, w1p=w1p, w2p=w2p,
                             unroll=unroll)
    return jax.vmap(kern)(col, xs)


def dp_profile_jax_batched(params, pairs):
    """pairs: list of (profile1, profile2) with identical bucket shapes.

    Returns list of JaxDPResult."""
    w1p = max(_bucket(p1.width) for p1, _ in pairs)
    w2p = max(_bucket(p2.width) for _, p2 in pairs)
    cols = []
    xss = []
    for p1, p2 in pairs:
        c, x = _prepare_inputs(params, p1, p2, w1p, w2p)
        cols.append(c)
        xss.append(x)
    col_b = {k: jnp.asarray(np.stack([c[k] for c in cols])) for k in cols[0]}
    xs_b = {k: jnp.asarray(np.stack([x[k] for x in xss])) for k in xss[0]}

    dirs, lastD, lastH, lastV = _dp_kernel_batched(col_b, xs_b, w1p, w2p)
    dirs = np.asarray(dirs)
    if _USE_PAIR_KERNEL:
        from . import i64pair as P
        lastD = P.to_i64(*lastD)
        lastH = P.to_i64(*lastH)
        lastV = P.to_i64(*lastV)
    else:
        lastD = np.asarray(lastD)
        lastH = np.asarray(lastH)
        lastV = np.asarray(lastV)

    out = []
    for k, (p1, p2) in enumerate(pairs):
        res = JaxDPResult()
        d = dirs[k]
        res.dirs_D = (d & 3).astype(np.uint8)
        res.dirs_H = ((d >> 2) & 3).astype(np.uint8)
        res.dirs_V = ((d >> 4) & 3).astype(np.uint8)
        w1 = p1.width
        res.last = (int(lastD[k][w1 - 1]), int(lastH[k][w1 - 1]),
                    int(lastV[k][w1 - 1]))
        out.append(res)
    return out


# ----------------------------------------------------------------------
# Pair-arithmetic kernel: the scan body runs entirely in native i32/u32
# (hi, lo) pairs (see ops/i64pair.py) - the XLA x64 legalizer shredded the
# s64 loop body into ~400 unfused micro-kernels.  The seven per-cell cost
# matrices are built in s64 OUTSIDE the loop (one-time fused computation)
# and streamed through the scan as pair rows.
# ----------------------------------------------------------------------
from . import i64pair as _P


@functools.partial(jax.jit, static_argnames=("w1p", "w2p", "unroll"))
def _dp_kernel_pairs(col, xs, w1p, w2p, unroll=4):
    """Same contract as _dp_kernel; scan body in (hi,lo) i32 pairs."""
    jj = jnp.arange(w2p + 1)
    s2_sym = col["s2_sym"]
    p2o, p2e, p2to, p2te = col["p2gaps"]
    gaps2_change = col["gaps2_change"]
    h0_row = col["h0_row"]
    last_col_mask = col["last_col_mask"]

    # ---- one-time s64 cost matrices (outside the loop) ----
    # match scores: [w1p, w2p+1] via mul+reduce (no s64 dot_general)
    # accumulate 30 outer products (materializing [w1p, w2p, 30] pads to
    # ~28GB on TPU; this form keeps intermediates at [w1p, w2p+1])
    t_full = xs["c1"][:, 0, None] * s2_sym[None, :, 0]
    for _s in range(1, NO_AMINOACIDS_AND_GAPS):
        t_full = t_full + xs["c1"][:, _s, None] * s2_sym[None, :, _s]
    delta = (xs["n1c"][:, None] * (p2e - p2o)[None, 1:]
             + xs["n1tc"][:, None] * (p2te - p2to)[None, 1:])
    tvx = gaps2_change[None, 1:] * xs["col1nng"][:, None]
    tmD = t_full[:, 1:]
    tmH = tmD + delta
    tmV = tmD + tvx
    gvs = (xs["s1go"][:, None] * col["g2so"][None, :]
           + xs["s1ge"][:, None] * col["g2se"][None, :]
           + xs["s1gto"][:, None] * col["g2sto"][None, :]
           + xs["s1gte"][:, None] * col["g2ste"][None, :])
    gvc = (xs["s1ge"][:, None] * col["g2ce"][None, :]
           + xs["s1gte"][:, None] * col["g2cte"][None, :])
    ghs = (p2o[None, 1:] * xs["g1so"][:, None]
           + p2e[None, 1:] * xs["g1se"][:, None]
           + p2to[None, 1:] * xs["g1sto"][:, None]
           + p2te[None, 1:] * xs["g1ste"][:, None])
    ghc = (p2e[None, 1:] * xs["g1ce"][:, None]
           + p2te[None, 1:] * xs["g1cte"][:, None])

    def sp(x):
        return _P.from_i64(x)

    xs_scan = dict(
        tmD=sp(tmD), tmH=sp(tmH), tmV=sp(tmV),
        gvs=sp(gvs), gvc=sp(gvc), ghs=sp(ghs), ghc=sp(ghc),
        i_gt1=xs["i_gt1"], v0_on=xs["v0_on"], v0_cost=sp(xs["v0_cost"]),
    )

    NEG = int(NEG_INF)
    neg_pair_full = _P.const(NEG, (w2p + 1,))
    neg_pair_1 = _P.const(NEG, (1,))

    prevD = _P.from_i64(jnp.where(jj == 0, jnp.int64(0), NEG_INF))
    prevH = _P.from_i64(h0_row)
    prevV = neg_pair_full

    dirs_row0 = jnp.where((jj >= 1), jnp.uint8(_H | (_H << 2) | (_H << 4)),
                          jnp.uint8(0))
    j_gt1 = jj[1:] > 1

    def head(a):
        return (a[0][:-1], a[1][:-1])

    def tail(a):
        return (a[0][1:], a[1][1:])

    def row_step(carry, x):
        pD, pH, pV = carry

        # ---- D channel ----
        tD = _P.add(head(pD), x["tmD"])
        tH = _P.add(head(pH), x["tmH"])
        tV = _P.add(head(pV), x["tmV"])
        gDH = _P.gt(tD, tH)
        gDV = _P.gt(tD, tV)
        gHV = _P.gt(tH, tV)
        pickD = gDH & gDV
        pickH = (~pickD) & gHV
        D_ = _P.where(pickD, tD, _P.where(pickH, tH, tV))
        dD = jnp.where(pickD, _D, jnp.where(pickH, _H, _V)).astype(jnp.uint8)

        three = x["i_gt1"] & j_gt1

        # ---- V channel ----
        tD = _P.add(tail(pD), x["gvs"])
        tV = _P.add(tail(pV), x["gvc"])
        tH = _P.add(tail(pH), x["gvs"])
        gDH = _P.gt(tD, tH)
        gDV = _P.gt(tD, tV)
        gHV = _P.gt(tH, tV)
        pickD3 = gDH & gDV
        pickH3 = (~pickD3) & gHV
        v3 = _P.where(pickD3, tD, _P.where(pickH3, tH, tV))
        d3 = jnp.where(pickD3, _D, jnp.where(pickH3, _H, _V)).astype(jnp.uint8)
        pickD2 = gDV
        V_ = _P.where(three, v3, _P.where(pickD2, tD, tV))
        dV = jnp.where(three, d3,
                       jnp.where(pickD2, _D, _V).astype(jnp.uint8))

        # boundary col 0
        p0 = (pD[0][:1], pD[1][:1])
        v0 = (pV[0][:1], pV[1][:1])
        vb = _P.add(_P.maximum(p0, v0), (x["v0_cost"][0][None],
                                         x["v0_cost"][1][None]))
        V0 = _P.where(x["v0_on"][None], vb, neg_pair_1)
        Dfull = _P.concat([neg_pair_1, D_])
        Vfull = _P.concat([V0, V_])

        # ---- H channel (max-plus prefix scan) ----
        m0 = _P.add(head(Dfull), x["ghs"])
        mv = _P.add(head(Vfull), x["ghs"])
        m = _P.where(three, _P.maximum(m0, mv), m0)
        bc = _P.cumsum_log(x["ghc"])
        run = _P.cummax_log(_P.sub(m, bc), NEG)
        negc = _P.const(NEG, run[0].shape)
        H_ = _P.add(bc, _P.maximum(run, negc))
        Hfull = _P.concat([neg_pair_1, H_])

        tD = m0
        tH = _P.add(head(Hfull), x["ghc"])
        tV = mv
        gDH = _P.gt(tD, tH)
        gDV = _P.gt(tD, tV)
        gVH = _P.gt(tV, tH)
        pickD3 = gDH & gDV
        pickV3 = (~pickD3) & gVH
        h3 = jnp.where(pickD3, _D, jnp.where(pickV3, _V, _H)).astype(jnp.uint8)
        dH = jnp.where(three, h3, jnp.where(gDH, _D, _H).astype(jnp.uint8))

        packed = (dD | (dH << 2) | (dV << 4)).astype(jnp.uint8)
        col0 = jnp.uint8(_V | (_V << 2) | (_V << 4))
        packed = jnp.concatenate([col0[None], packed])

        lastD = _P.masked_max(Dfull, last_col_mask, NEG)
        lastH = _P.masked_max(Hfull, last_col_mask, NEG)
        lastV = _P.masked_max(Vfull, last_col_mask, NEG)
        return (Dfull, Hfull, Vfull), (packed, lastD, lastH, lastV)

    (_, _, _), (dirs, lastD, lastH, lastV) = jax.lax.scan(
        row_step, (prevD, prevH, prevV), xs_scan, unroll=unroll)

    dirs_all = jnp.concatenate([dirs_row0[None], dirs], axis=0)
    return dirs_all, lastD, lastH, lastV
