#!/usr/bin/env python
"""Stage timing of the width-agnostic giant DP path on a chain-shaped
merge (small leaf rows x wide chain columns) - the shape the 100k
flagship's serial chain would dispatch.

Stages: kernel-only (stage0 + Mosaic DP), +traceback, +merged counters.
The difference isolates the on-device traceback scan cost, which bounds
any chain-batched dispatch design.

Usage: python scripts/giant_profile.py [w1] [w2] [card2]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from famsa_tpu.core.params import Params
from famsa_tpu.ops import dp_giant as G
from famsa_tpu.ops import dp_pallas as dpp

W1 = int(sys.argv[1]) if len(sys.argv) > 1 else 300
W2 = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
CARD2 = int(sys.argv[3]) if len(sys.argv) > 3 else 5000


def timed(label, fn, n_iter=5):
    t0 = time.perf_counter()
    fn()
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        fn()
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    params = Params()
    params.adjust(100000)
    rng = np.random.default_rng(0)
    gp = (np.int64(params.gap_open), np.int64(params.gap_ext),
          np.int64(params.gap_term_open), np.int64(params.gap_term_ext))
    sm = jnp.asarray(np.asarray(params.score_matrix, dtype=np.int64))

    lw = G.lw_for(W2)
    w1p = G._w1_bucket(W1)
    print(f"W1={W1} W2={W2} CARD2={CARD2} lw={lw} w1p={w1p}", flush=True)

    # leaf side: symbol row; chain side: plausible counters
    leaf = np.full((w1p,), 31, dtype=np.int8)
    leaf[:W1] = rng.integers(0, 20, size=W1)
    c2 = np.zeros((G.GMAX_ROWS, 32), dtype=np.int32)
    sel = rng.integers(0, 20, size=(W2 + 1, 4))
    for k in range(4):
        np.put_along_axis(c2[:W2 + 1], sel[:, k:k+1], CARD2 // 4, axis=1)
    c2[0] = 0

    leaf_d = jnp.asarray(leaf)
    c2_d = jnp.asarray(c2)
    w1v, w2v = np.int32(W1), np.int32(W2)
    k1v, k2v = np.int32(1), np.int32(CARD2)

    # --- kernel only: stage0 + fold prep + Mosaic DP (pull a tiny slice)
    @functools.partial(jax.jit, static_argnames=("lw", "w1p"))
    def kern_only(leaf1, c2s, w1, w2, card2, lw, w1p):
        w2p_eff = G.FOLDS * lw - G.LANE_PAD
        c1d = G._side_counters(None, leaf1, w1p)
        c2d = G._side_counters(c2s, None, w2p_eff)
        colp, xs = dpp._stage0_one(c1d, c2d, w1, w2, jnp.int32(1), card2,
                                   sm, gp, w1p, w2p_eff, jnp.int64)
        colp = {k: v[None, None] for k, v in colp.items()}
        xs = {k: jnp.asarray(v)[None, None] for k, v in xs.items()}
        (w1m1, h0hi, h0lo, lastm, colf, rowf, s2stk, c1stk) = \
            dpp._pack_kernel_inputs(colp, xs, w1p, w2p_eff, single=False)

        def fold(x):
            return x.reshape(x.shape[:-1] + (G.FOLDS, lw))

        colf_g = fold(colf[0, :, 0])
        s2_g = fold(s2stk[0, :, 0])
        lastm_g = fold(lastm[0, 0].astype(jnp.int32))
        h0h, h0l = h0hi[0, 0], h0lo[0, 0]
        h0sh = jnp.concatenate([jnp.full((1,), dpp.NEG_HI, jnp.int32),
                                h0h[:-1]])
        h0sl = jnp.concatenate([jnp.full((1,), dpp.NEG_LO, jnp.int32),
                                h0l[:-1]])
        h0p = jnp.stack([fold(h0h), fold(h0l), fold(h0sh), fold(h0sl)])

        def stag(x):
            padded = jnp.stack(
                [jnp.pad(x, ((f * G.BLK, (G.FOLDS - 1 - f) * G.BLK), (0, 0)))
                 for f in range(G.FOLDS)], axis=1)
            tm = w1p // G.BLK + G.FOLDS - 1
            return padded.reshape(tm, G.BLK, G.FOLDS, x.shape[-1])

        rowf_g = stag(rowf[0, :, 0, :])
        c1_g = stag(c1stk[0, :, 0, :])
        w1_, w2_ = w1.astype(jnp.int32), w2.astype(jnp.int32)
        nrb = (w1_ + G.BLK - 1) // G.BLK
        T = nrb + G.FOLDS - 1
        sf = w2_ // lw
        t_fin = sf + (w1_ - 1) // G.BLK
        scal = jnp.stack([w1_ - 1, t_fin, sf, jnp.int32(0)]
                         + [jnp.int32(0)] * 4).reshape(1, 8).astype(jnp.int32)
        dirs_st, fins_st = G._run_giant(scal, h0p, lastm_g, colf_g, s2_g,
                                        rowf_g, c1_g, T, lw, G.BLK)
        return fins_st[0, 0, 0], dirs_st[0, 0, 0, :8]

    timed("kernel-only (stage0+DP)", lambda: np.asarray(
        kern_only(leaf_d, c2_d, w1v, w2v, k2v, lw, w1p)[0]))

    # --- full path, no merged counters
    timed("full paths (DP+traceback)", lambda: np.asarray(
        G._dp_giant_tb(None, leaf_d, c2_d, None, w1v, w2v, k1v, k2v,
                       sm, gp, lw=lw, w1p=w1p, merged=False)))

    # --- full + merged counters (chain steady state)
    def run_merged():
        packed, mc = G._dp_giant_tb(None, leaf_d, c2_d, None, w1v, w2v,
                                    k1v, k2v, sm, gp, lw=lw, w1p=w1p,
                                    merged=True)
        np.asarray(packed)
        return mc

    timed("full + merged counters", run_merged)


if __name__ == "__main__":
    main()
