"""JAX/TPU profile-alignment DP.

One jitted kernel covers both the profile-profile and sequence-profile
recurrences of the reference (profile_seq.cpp:165-892): for a single-
sequence profile1 the gap-correction precomputes reduce exactly to the
sequence-profile constants, including tie-breaking, so the kernels are
mathematically identical (verified by the parity test).

Design (TPU-first):
 - per-row match scores t = scores2[:, :30] @ counters1[i, :30] (matvec);
 - D and V channels are full-width vector ops off the previous row;
 - the H channel's intra-row dependency is a max-plus prefix scan
   H[j] = B[j] + cummax(m[k] - B[k]), exact in int64;
 - lax.scan over rows emits a packed 2-bit x3 direction byte per cell
   (the reference CDPMatrix layout, profile.h:36-149);
 - shapes are bucketed (pad-and-mask) to bound recompilation.

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
    """Inclusive max-scan, log-depth Hillis-Steele (exact for ints; avoids
    the pathological TPU lowering of lax.cummax on s64)."""
    n = x.shape[0]
    k = 1
    while k < n:
        x = jnp.maximum(x, jnp.concatenate([jnp.full((k,), NEG_INF), x[:-k]]))
        k *= 2
    return x


def _cumsum_log(x):
    """Inclusive add-scan, log-depth (exact for ints)."""
    n = x.shape[0]
    k = 1
    while k < n:
        x = x + jnp.concatenate([jnp.zeros((k,), x.dtype), x[:-k]])
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
def _dp_kernel(counters1, scores1, counters2, scores2, w1, w2,
               card1, card2, gc1, gc2, gap_costs, w1p, w2p, unroll=8):
    """counters/scores padded to [w1p+1, 32] / [w2p+1, 32] int64.
    gc1: [6, w1p+1]; gc2: [6, w2p+1]; gap_costs: (go, ge, gto, gte).

    Returns (dirs_packed [w1p+1, w2p+1] uint8, last (D,H,V))."""
    go, ge, gto, gte = gap_costs
    jj = jnp.arange(w2p + 1)

    s2_sym = scores2[:, :NO_AMINOACIDS_AND_GAPS]           # [w2p+1, 30]
    p2o = scores2[:, GAP_OPEN]
    p2e = scores2[:, GAP_EXT]
    p2to = scores2[:, GAP_TERM_OPEN]
    p2te = scores2[:, GAP_TERM_EXT]

    dge_go = p2e - p2o
    dgte_gto = p2te - p2to
    gaps2_change = (counters2[:, GAP_OPEN] * (ge - go)
                    + counters2[:, GAP_TERM_OPEN] * (gte - gto))

    gc2_sto, gc2_ste, gc2_stto, gc2_stte, gc2_cte, gc2_ctte = gc2

    # row 0 boundary (profile_seq.cpp:555-579)
    h0 = jnp.where(jj == 1, p2to[1] * card1, p2te * card1)
    h0 = jnp.concatenate([jnp.zeros(1, jnp.int64), _cumsum_log(h0[1:])])
    h0 = jnp.where(jj == 0, NEG_INF, h0)
    h0 = jnp.where(jj == w2, NEG_INF, h0)
    prevD = jnp.where(jj == 0, jnp.int64(0), NEG_INF)
    prevH = h0
    prevV = jnp.full(w2p + 1, NEG_INF)
    last_col_mask = (jj == w2)   # static-shape alternative to Dfull[w2]

    dirs_row0 = jnp.where((jj >= 1), jnp.uint8(_H | (_H << 2) | (_H << 4)),
                          jnp.uint8(0))

    c1_sym = counters1[:, :NO_AMINOACIDS_AND_GAPS]
    col1nng = counters1[:, :NO_AMINOACIDS].sum(axis=1)
    n1_change = counters1[:, GAP_OPEN]
    n1_term_change = counters1[:, GAP_TERM_OPEN]
    s1go = scores1[:, GAP_OPEN]
    s1ge = scores1[:, GAP_EXT]
    s1gto = scores1[:, GAP_TERM_OPEN]
    s1gte = scores1[:, GAP_TERM_EXT]
    gc1_sto, gc1_ste, gc1_stto, gc1_stte, gc1_cte, gc1_ctte = gc1

    ii = jnp.arange(1, w1p + 1)
    xs = dict(
        i=ii,
        c1=c1_sym[1:],
        col1nng=col1nng[1:],
        n1c=n1_change[1:], n1tc=n1_term_change[1:],
        s1go=s1go[1:], s1ge=s1ge[1:], s1gto=s1gto[1:], s1gte=s1gte[1:],
        g1so=gc1_sto[1:], g1se=gc1_ste[1:], g1sto=gc1_stto[1:],
        g1ste=gc1_stte[1:], g1ce=gc1_cte[1:], g1cte=gc1_ctte[1:],
    )

    def row_step(carry, x):
        pD, pH, pV = carry
        i = x["i"]

        # match scores for this row: [w2p+1]; explicit mul+reduce (an s64
        # dot_general is not supported by the TPU X64 rewriter)
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

        three = (i > 1) & (jj[1:] > 1)

        # ---- V channel ----
        gv_s = (x["s1go"] * gc2_sto[1:] + x["s1ge"] * gc2_ste[1:]
                + x["s1gto"] * gc2_stto[1:] + x["s1gte"] * gc2_stte[1:])
        gv_c = x["s1ge"] * gc2_cte[1:] + x["s1gte"] * gc2_ctte[1:]
        tD = pD[1:] + gv_s
        tV = pV[1:] + gv_c
        tH = pH[1:] + gv_s
        pickD3 = (tD > tH) & (tD > tV)
        pickH3 = (~pickD3) & (tH > tV)
        v3 = jnp.where(pickD3, tD, jnp.where(pickH3, tH, tV))
        d3 = jnp.where(pickD3, _D, jnp.where(pickH3, _H, _V)).astype(jnp.uint8)
        pickD2 = tD > tV
        v2 = jnp.where(pickD2, tD, tV)
        d2 = jnp.where(pickD2, _D, _V).astype(jnp.uint8)
        V_ = jnp.where(three, v3, v2)
        dV = jnp.where(three, d3, d2)

        # boundary col 0
        lt_w1 = i < w1
        v_b0 = jnp.maximum(pD[0], pV[0]) + jnp.where(
            i == 1, x["s1gto"] * card2, x["s1gte"] * card2)
        V0 = jnp.where(lt_w1, v_b0, NEG_INF)
        Dfull = jnp.concatenate([jnp.array([NEG_INF]), D_])
        Vfull = jnp.concatenate([V0[None], V_])

        # ---- H channel (prefix scan) ----
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
        h2 = jnp.where(pickD2, _D, _H).astype(jnp.uint8)
        dH = jnp.where(three, h3, h2)

        packed = (dD | (dH << 2) | (dV << 4)).astype(jnp.uint8)
        col0 = jnp.uint8(_V | (_V << 2) | (_V << 4))
        packed = jnp.concatenate([col0[None], packed])

        # loop-variant dynamic-slice per row is pathological on TPU; use a
        # masked reduce to extract column w2 instead
        lastD = jnp.where(last_col_mask, Dfull, NEG_INF).max()
        lastH = jnp.where(last_col_mask, Hfull, NEG_INF).max()
        lastV = jnp.where(last_col_mask, Vfull, NEG_INF).max()
        return (Dfull, Hfull, Vfull), (packed, lastD, lastH, lastV)

    (_, _, _), (dirs, lastD, lastH, lastV) = jax.lax.scan(
        row_step, (prevD, prevH, prevV), xs, unroll=unroll)

    dirs_all = jnp.concatenate([dirs_row0[None], dirs], axis=0)
    return dirs_all, lastD[w1 - 1], lastH[w1 - 1], lastV[w1 - 1]


class JaxDPResult:
    __slots__ = ("dirs_D", "dirs_H", "dirs_V", "last")


def dp_profile_jax(params, profile1, profile2):
    """Unguided prof-prof / seq-prof DP on the JAX backend."""
    w1, w2 = profile1.width, profile2.width
    w1p, w2p = _bucket(w1), _bucket(w2)
    card1, card2 = len(profile1.data), len(profile2.data)

    def pad(a, wp):
        out = np.zeros((wp + 1, a.shape[1]), dtype=np.int64)
        out[:a.shape[0]] = a
        return out

    c1 = pad(profile1.counters, w1p)
    s1 = pad(profile1.scores, w1p)
    c2 = pad(profile2.counters, w2p)
    s2 = pad(profile2.scores, w2p)

    gc1 = np.stack(_gap_correction_arrays(c1, w1, card1))
    gc2 = np.stack(_gap_correction_arrays(c2, w2, card2))

    gap_costs = (np.int64(params.gap_open), np.int64(params.gap_ext),
                 np.int64(params.gap_term_open), np.int64(params.gap_term_ext))

    dirs, lastD, lastH, lastV = _dp_kernel(
        jnp.asarray(c1), jnp.asarray(s1), jnp.asarray(c2), jnp.asarray(s2),
        np.int64(w1), np.int64(w2), np.int64(card1), np.int64(card2),
        jnp.asarray(gc1), jnp.asarray(gc2), gap_costs, w1p, w2p)

    dirs = np.asarray(dirs)
    res = JaxDPResult()
    res.dirs_D = (dirs & 3).astype(np.uint8)
    res.dirs_H = ((dirs >> 2) & 3).astype(np.uint8)
    res.dirs_V = ((dirs >> 4) & 3).astype(np.uint8)
    res.last = (int(lastD), int(lastH), int(lastV))
    return res
