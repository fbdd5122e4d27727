"""Cross-chip profile-alignment DP: one merge sharded over the column axis.

The reference splits a single big merge across threads by column stripes
with a spin-barrier wavefront (profile_par.cpp:214-230).  The TPU-native
equivalent shards the DP row state over a device mesh axis ("cols") and
runs the whole row loop as ONE compiled program under shard_map:

 - D and V channels are elementwise off the previous row; the j-1
   dependency needs only the left neighbor's last element per row
   (one ppermute halo exchange over ICI);
 - the H channel's intra-row max-plus prefix scan is two-phase: a local
   cummax plus a cross-shard carry (all_gather of one scalar per shard);
 - the bc cumsum of the scan trick is likewise local cumsum + offsets.

The arithmetic is a term-for-term transcription of ops/dp_jax.py's
_dp_kernel (itself bit-exact vs core/dp.py), in exact int64 - outputs are
byte-identical to the single-device kernels (tests/test_parallel.py runs
an 8-device CPU mesh).  Use: merges whose DP state exceeds one chip's
memory, routed by core/aligner.py when a mesh is active.
"""

import functools

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.dp_jax import NEG_INF, JaxDPResult, _bucket, _prepare_inputs

_D, _H, _V = 0, 1, 2
COL0_PACK = np.uint8(_V | (_V << 2) | (_V << 4))
ROW0_PACK = np.uint8(_H | (_H << 2) | (_H << 4))


@functools.lru_cache(maxsize=32)
def _sharded_program(mesh, w1p, L, axis):
    """Compiled shard_map DP over a [w1p rows x L cols] grid (L = padded
    global width, divisible by the mesh size)."""
    S = mesh.devices.size
    Lloc = L // S
    perm = [(i, i + 1) for i in range(S - 1)]

    col_specs = dict(
        s2=P(axis, None), p2g=P(None, axis), g2chg=P(axis), h0=P(axis),
        lastm=P(axis), g2so=P(axis), g2se=P(axis), g2sto=P(axis),
        g2ste=P(axis), g2ce=P(axis), g2cte=P(axis))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(col_specs, P()),
        out_specs=(P(None, axis), P(), P(), P()),
        check_vma=False)
    def run(c, xs):
        idx = jax.lax.axis_index(axis)
        jg = idx.astype(jnp.int64) * Lloc + jnp.arange(Lloc, dtype=jnp.int64)
        neg = jnp.int64(NEG_INF)

        def halo(vals, fills):
            """vals [K, Lloc] -> [K, Lloc] shifted right by one GLOBAL
            column; global column 0 receives fills."""
            last = vals[:, -1:]
            if S > 1:
                left = jax.lax.ppermute(last, axis, perm)
            else:
                left = last
            left = jnp.where(idx == 0, fills[:, None], left)
            return jnp.concatenate([left, vals[:, :-1]], axis=1)

        def gmax(x):
            if S > 1:
                return jnp.max(jax.lax.all_gather(x, axis))
            return x

        p2o, p2e, p2to, p2te = c["p2g"]
        dge_go = p2e - p2o
        dgte_gto = p2te - p2to
        s2 = c["s2"]
        fills3 = jnp.array([NEG_INF] * 3, dtype=jnp.int64)
        fills2 = jnp.array([NEG_INF] * 2, dtype=jnp.int64)
        gh_c_base = jnp.where(jg == 0, jnp.int64(0), jnp.int64(1))

        def row_step(carry, x):
            pD, pH, pV = carry

            t = (s2 * x["c1"][None, :]).sum(axis=1)
            pl = halo(jnp.stack([pD, pH, pV]), fills3)
            pD_l, pH_l, pV_l = pl[0], pl[1], pl[2]

            # ---- D channel ----
            tD = pD_l + t
            tH = pH_l + t + x["n1c"] * dge_go + x["n1tc"] * dgte_gto
            tV = pV_l + t + c["g2chg"] * x["col1nng"]
            pickD = (tD > tH) & (tD > tV)
            pickH = (~pickD) & (tH > tV)
            D = jnp.where(pickD, tD, jnp.where(pickH, tH, tV))
            dD = jnp.where(pickD, _D, jnp.where(pickH, _H, _V)).astype(jnp.uint8)
            D = jnp.where(jg == 0, neg, D)
            # guided band (reference row_ranges, profile.cpp:1320-1365):
            # cells outside [blo, bhi] read -inf, exactly the Mosaic
            # kernels' banded masking; unguided merges pass the full
            # range so one compiled program serves both
            inb = (jg >= x["blo"]) & (jg <= x["bhi"])
            D = jnp.where(inb, D, neg)

            three = x["i_gt1"] & (jg > 1)

            # ---- V channel ----
            gv_s = (x["s1go"] * c["g2so"] + x["s1ge"] * c["g2se"]
                    + x["s1gto"] * c["g2sto"] + x["s1gte"] * c["g2ste"])
            gv_c = x["s1ge"] * c["g2ce"] + x["s1gte"] * c["g2cte"]
            tD2 = pD + gv_s
            tV2 = pV + gv_c
            tH2 = pH + gv_s
            pickD3 = (tD2 > tH2) & (tD2 > tV2)
            pickH3 = (~pickD3) & (tH2 > tV2)
            v3 = jnp.where(pickD3, tD2, jnp.where(pickH3, tH2, tV2))
            d3 = jnp.where(pickD3, _D, jnp.where(pickH3, _H, _V)).astype(jnp.uint8)
            pickD2 = tD2 > tV2
            V = jnp.where(three, v3, jnp.where(pickD2, tD2, tV2))
            dV = jnp.where(three, d3,
                           jnp.where(pickD2, _D, _V).astype(jnp.uint8))
            V0 = jnp.where(x["v0_on"], jnp.maximum(pD, pV) + x["v0_cost"], neg)
            V = jnp.where(jg == 0, V0, V)
            V = jnp.where(inb | (jg == 0), V, neg)

            # ---- H channel (two-phase max-plus prefix scan) ----
            gh_s = (x["g1so"] * p2o + x["g1se"] * p2e
                    + x["g1sto"] * p2to + x["g1ste"] * p2te)
            gh_c = (x["g1ce"] * p2e + x["g1cte"] * p2te) * gh_c_base
            dvl = halo(jnp.stack([D, V]), fills2)
            m0 = dvl[0] + gh_s
            mv = dvl[1] + gh_s
            m = jnp.where(three, jnp.maximum(m0, mv), m0)
            m = jnp.where(jg == 0, neg, m)

            bc_loc = jnp.cumsum(gh_c)
            if S > 1:
                tots = jax.lax.all_gather(bc_loc[-1], axis)       # [S]
                off = jnp.where(jnp.arange(S) < idx, tots, 0).sum()
            else:
                off = jnp.int64(0)
            bc = bc_loc + off
            mk = m - bc
            run_loc = jax.lax.cummax(mk)
            if S > 1:
                tails = jax.lax.all_gather(run_loc[-1], axis)     # [S]
                carry_in = jnp.max(
                    jnp.where(jnp.arange(S) < idx, tails, neg))
            else:
                carry_in = neg
            run = jnp.maximum(run_loc, carry_in)
            H = bc + jnp.maximum(run, neg)
            H = jnp.where(jg == 0, neg, H)
            H = jnp.where(inb, H, neg)

            tHh = halo(H[None], fills2[:1])[0] + gh_c
            pickD3h = (m0 > tHh) & (m0 > mv)
            pickV3h = (~pickD3h) & (mv > tHh)
            h3 = jnp.where(pickD3h, _D, jnp.where(pickV3h, _V, _H)).astype(jnp.uint8)
            dH = jnp.where(three, h3,
                           jnp.where(m0 > tHh, _D, _H).astype(jnp.uint8))

            packed = (dD | (dH << 2) | (dV << 4)).astype(jnp.uint8)
            packed = jnp.where(jg == 0, COL0_PACK, packed)

            def lastv(ch):
                return gmax(jnp.max(jnp.where(c["lastm"], ch, neg)))

            return (D, H, V), (packed, lastv(D), lastv(H), lastv(V))

        prevD = jnp.where(jg == 0, jnp.int64(0), neg)
        prevH = c["h0"]
        prevV = jnp.full(Lloc, neg)

        (_, _, _), (dirs, lD, lH, lV) = jax.lax.scan(
            row_step, (prevD, prevH, prevV), xs)
        return dirs, lD, lH, lV

    return jax.jit(run)


def _band_rows(bands, w1, w1p, L):
    """[w1p] per-row band lo/hi (DP row r+1), full range by default."""
    blo = np.zeros(w1p, dtype=np.int64)
    bhi = np.full(w1p, L, dtype=np.int64)
    if bands is not None:
        lo, hi = bands
        blo[:w1] = np.asarray(lo[1:w1 + 1], dtype=np.int64)
        bhi[:w1] = np.asarray(hi[1:w1 + 1], dtype=np.int64)
    return blo, bhi


def dp_profile_sharded(params, profile1, profile2, mesh, axis="cols",
                       bands=None):
    """Column-sharded DP for one seq-prof/prof-prof merge (optionally
    guided: bands = find_row_ranges (lo, hi) arrays).  Returns a
    JaxDPResult (packed directions + final D/H/V) identical to
    ops/dp_jax.py's dp_profile_jax."""
    w1 = profile1.width
    w1p, w2p = _bucket(w1), _bucket(profile2.width)
    col, xs = _prepare_inputs(params, profile1, profile2, w1p, w2p)

    S = mesh.devices.size
    L = -(-(w2p + 1) // S) * S
    xs["blo"], xs["bhi"] = _band_rows(bands, w1, w1p, L)

    def padL(a, fill=0):
        out = np.full((L,) + a.shape[1:], fill, dtype=a.dtype)
        out[:a.shape[0]] = a
        return out

    def shift1(a):
        """[w2p] j=1..w2p array -> full-width [L] with 0 at j=0."""
        out = np.zeros(L, dtype=a.dtype)
        out[1:1 + a.shape[0]] = a
        return out

    c = dict(
        s2=padL(col["s2_sym"]),
        p2g=np.stack([padL(col["p2gaps"][k]) for k in range(4)]),
        g2chg=padL(col["gaps2_change"]),
        h0=padL(col["h0_row"], fill=NEG_INF),
        lastm=padL(col["last_col_mask"]),
        g2so=shift1(col["g2so"]), g2se=shift1(col["g2se"]),
        g2sto=shift1(col["g2sto"]), g2ste=shift1(col["g2ste"]),
        g2ce=shift1(col["g2ce"]), g2cte=shift1(col["g2cte"]),
    )
    xs.pop("w1m1", None)

    prog = _sharded_program(mesh, w1p, L, axis)
    dirs, lD, lH, lV = prog({k: jnp.asarray(v) for k, v in c.items()},
                            {k: jnp.asarray(v) for k, v in xs.items()})

    dirs = np.asarray(dirs)[:, :w2p + 1]
    jj = np.arange(w2p + 1)
    row0 = np.where(jj >= 1, ROW0_PACK, np.uint8(0))
    dirs = np.concatenate([row0[None], dirs], axis=0)

    res = JaxDPResult()
    res.dirs_D = (dirs & 3).astype(np.uint8)
    res.dirs_H = ((dirs >> 2) & 3).astype(np.uint8)
    res.dirs_V = ((dirs >> 4) & 3).astype(np.uint8)
    lD, lH, lV = np.asarray(lD), np.asarray(lH), np.asarray(lV)
    res.last = (int(lD[w1 - 1]), int(lH[w1 - 1]), int(lV[w1 - 1]))
    return res


_tb_sharded = None


def dp_profile_sharded_paths(params, profile1, profile2, mesh, axis="cols",
                             bands=None):
    """Column-sharded DP + on-device traceback: only the O(W) path (2-bit
    codes) and the [w1p] final-channel vectors leave the device - a
    >= 2e8-cell merge's dirs matrix is >= 200 MB against the ~20-40 MB/s
    tunnel, the path is ~W bytes.  The reference's parallel engine
    likewise never materializes the matrix off-node
    (profile_par.cpp:441-905).  Returns a JaxPathResult (construct's
    _trace_path short-circuits on .path)."""
    global _tb_sharded
    from ..ops.dp_pallas import _D, _H, _V, JaxPathResult, _traceback_one

    if _tb_sharded is None:
        def _tb(dirs_u8, w1, w2, dir0, nsteps):
            return _traceback_one(dirs_u8.astype(jnp.int32), w1, w2, dir0,
                                  nsteps)
        _tb_sharded = jax.jit(_tb, static_argnames=("nsteps",))

    w1 = profile1.width
    w2 = profile2.width
    w1p, w2p = _bucket(w1), _bucket(profile2.width)

    S = mesh.devices.size
    L = -(-(w2p + 1) // S) * S
    if w1p < 32 or L < 32:
        # tiny merge (tests only): the tiled traceback's [32, 32] window
        # gather needs both dims; fall back to the dirs-returning variant
        # (construct walks them on host)
        return dp_profile_sharded(params, profile1, profile2, mesh, axis,
                                  bands=bands)

    col, xs = _prepare_inputs(params, profile1, profile2, w1p, w2p)
    xs["blo"], xs["bhi"] = _band_rows(bands, w1, w1p, L)

    def padL(a, fill=0):
        out = np.full((L,) + a.shape[1:], fill, dtype=a.dtype)
        out[:a.shape[0]] = a
        return out

    def shift1(a):
        out = np.zeros(L, dtype=a.dtype)
        out[1:1 + a.shape[0]] = a
        return out

    c = dict(
        s2=padL(col["s2_sym"]),
        p2g=np.stack([padL(col["p2gaps"][k]) for k in range(4)]),
        g2chg=padL(col["gaps2_change"]),
        h0=padL(col["h0_row"], fill=NEG_INF),
        lastm=padL(col["last_col_mask"]),
        g2so=shift1(col["g2so"]), g2se=shift1(col["g2se"]),
        g2sto=shift1(col["g2sto"]), g2ste=shift1(col["g2ste"]),
        g2ce=shift1(col["g2ce"]), g2cte=shift1(col["g2cte"]),
    )
    xs.pop("w1m1", None)

    prog = _sharded_program(mesh, w1p, L, axis)
    dirs, lD, lH, lV = prog({k: jnp.asarray(v) for k, v in c.items()},
                            {k: jnp.asarray(v) for k, v in xs.items()})

    d0 = int(np.asarray(lD)[w1 - 1])
    h0 = int(np.asarray(lH)[w1 - 1])
    v0 = int(np.asarray(lV)[w1 - 1])
    if d0 >= h0 and d0 >= v0:
        dir0, total = _D, d0
    elif h0 > v0:
        dir0, total = _H, h0
    else:
        dir0, total = _V, v0

    emits = np.asarray(_tb_sharded(dirs, jnp.int32(w1), jnp.int32(w2),
                                   jnp.int32(dir0), nsteps=w1p + L))
    stop = int(np.argmax(emits == 3)) if (emits == 3).any() else len(emits)
    full = [int(dir0)] + [int(x) for x in emits[:stop]]
    full.reverse()
    return JaxPathResult(full[1:], int(total))
