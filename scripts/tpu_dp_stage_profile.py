#!/usr/bin/env python
"""Time each stage of the Pallas DP path separately on the TPU.

Stages (see famsa_tpu/ops/dp_pallas.py):
  0: counters -> colp/xs         (_stage0_one vmapped)
  1: colp/xs -> factor tensors   (_pack_kernel_inputs; O(W) only, the
                                  per-cell cost matrices are built
                                  in-kernel since round 2)
  2: factors -> dirs/fins        (_run_kernel, the Mosaic kernel)
  3: dirs/fins -> paths          (tiled traceback)
Plus the fused full program for reference.

Timing rule for this box: block_until_ready does not fence remote
completion through the axon tunnel; every measurement pulls a small
np.asarray slice that depends on the full program.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from famsa_tpu.core.params import Params
from famsa_tpu.ops import dp_pallas as dpp

W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CARD = 64
SB = 8


def _random_profile(rng, params, n_seqs, n_cols):
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.core.sequence import encode_gapped
    aa = "ARNDCQEGHILKMFPSTWYV"
    p = Profile(params)
    for k in range(n_seqs):
        chars = ['-' if rng.random() < 0.15 else aa[rng.integers(0, 20)]
                 for _ in range(n_cols)]
        if all(c == '-' for c in chars):
            chars[0] = 'A'
        p.append_raw_sequence(encode_gapped(f">s{k}", "".join(chars), k))
    p.calculate_counters_scores()
    return p


def timed(label, fn, n_iter=5):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn()
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
    return out, dt


def main():
    params = Params()
    params.adjust(1000)
    rng = np.random.default_rng(0)
    pairs = [(_random_profile(rng, params, CARD, W),
              _random_profile(rng, params, CARD, W)) for _ in range(BATCH)]

    single = dpp._single_word_ok(params, pairs)
    w1p = max(dpp._pallas_bucket(p1.width) for p1, _ in pairs)
    w2p = max(dpp._pallas_bucket(p2.width) for _, p2 in pairs)
    blk = dpp._row_block(SB, w2p + dpp.LANE_PAD, single=single)
    print(f"w1p={w1p} w2p={w2p} blk={blk} single={single}", flush=True)

    g = (BATCH + SB - 1) // SB
    b = g * SB
    c1s = np.zeros((b, w1p + 1, 32), dtype=np.int64)
    c2s = np.zeros((b, w2p + 1, 32), dtype=np.int64)
    w1v = np.empty(b, dtype=np.int32)
    w2v = np.empty(b, dtype=np.int32)
    k1v = np.empty(b, dtype=np.int32)
    k2v = np.empty(b, dtype=np.int32)
    for k in range(b):
        p1, p2 = pairs[min(k, BATCH - 1)]
        c1s[k, :p1.width + 1] = p1.counters
        c2s[k, :p2.width + 1] = p2.counters
        w1v[k], w2v[k] = p1.width, p2.width
        k1v[k], k2v[k] = len(p1.data), len(p2.data)

    gp = (int(params.gap_open), int(params.gap_ext),
          int(params.gap_term_open), int(params.gap_term_ext))
    sm = jnp.asarray(np.asarray(params.score_matrix, dtype=np.int64))
    c1d = jnp.asarray(dpp._shrink(c1s))
    c2d = jnp.asarray(dpp._shrink(c2s))
    w1d, w2d = jnp.asarray(w1v), jnp.asarray(w2v)
    k1d, k2d = jnp.asarray(k1v), jnp.asarray(k2v)

    # ---- stage 0 ----
    @functools.partial(jax.jit, static_argnames=("gp",))
    def f_stage0(c1s, c2s, w1v, w2v, k1v, k2v, sm, gp):
        it = jnp.int32 if single else jnp.int64

        def one(c1, c2, w1, w2, q1, q2):
            return dpp._stage0_one(c1, c2, w1, w2, q1, q2,
                                   sm, gp, w1p, w2p, it)
        colp, xs = jax.vmap(one)(c1s, c2s, w1v, w2v, k1v, k2v)
        colp = {k: v.reshape((g, SB) + v.shape[1:]) for k, v in colp.items()}
        xs = {k: v.reshape((g, SB) + v.shape[1:]) for k, v in xs.items()}
        return colp, xs

    def run0():
        colp, xs = f_stage0(c1d, c2d, w1d, w2d, k1d, k2d, sm, gp)
        np.asarray(colp["s2"][0, 0, :2, 0])
        return colp, xs

    (colp, xs), dt0 = timed("stage0 (counters->colp/xs)", run0)

    # ---- stage 1: O(W) factor packing ----
    @functools.partial(jax.jit, static_argnames=("single",))
    def f_stage1(colp, xs, single):
        return dpp._pack_kernel_inputs(colp, xs, w1p, w2p, single)

    def run1():
        out = f_stage1(colp, xs, single)
        np.asarray(out[4][0, 0, 0, :2])
        return out

    packed, dt1 = timed("stage1 (factor packing)", run1)

    # ---- stage 2 ----
    @functools.partial(jax.jit, static_argnames=("sb", "blk", "single"))
    def f_stage2(packed, sb, blk, single):
        return dpp._run_kernel(*packed, sb, blk, w1p, w2p, single=single)

    def run2():
        dirs, fins = f_stage2(packed, sb=SB, blk=blk, single=single)
        np.asarray(fins[0, 0, 0, :2])
        return dirs, fins

    (dirs_i32, fins), dt2 = timed("stage2 (mosaic kernel)", run2)

    # ---- stage 3 ----
    @jax.jit
    def f_stage3(dirs_i32, fins, w1v, w2v):
        w2pe = w2p + dpp.LANE_PAD
        dirs_m = dirs_i32.transpose(0, 2, 1, 3).reshape(b, w1p, w2pe)
        fins_b = fins.transpose(0, 2, 1, 3).reshape(b, w1p, 8)
        idx = jnp.maximum(w1v.astype(jnp.int32) - 1, 0)
        f = jnp.take_along_axis(fins_b, idx[:, None, None].astype(jnp.int64),
                                axis=1)[:, 0, :]

        def join(hi, lo):
            return (hi.astype(jnp.int64) << np.int64(32)) | \
                   (lo.astype(jnp.int64) & np.int64(0xFFFFFFFF))

        d0 = join(f[:, 0], f[:, 1])
        h0 = join(f[:, 2], f[:, 3])
        v0 = join(f[:, 4], f[:, 5])
        pick_d = (d0 >= h0) & (d0 >= v0)
        pick_h = (~pick_d) & (h0 > v0)
        dir0 = jnp.where(pick_d, jnp.int32(0),
                         jnp.where(pick_h, jnp.int32(1), jnp.int32(2)))
        emits = jax.vmap(dpp._traceback_one, in_axes=(0, 0, 0, 0, None))(
            dirs_m, w1v, w2v, dir0, w1p + w2p)
        return emits

    def run3():
        emits = f_stage3(dirs_i32, fins, w1d, w2d)
        np.asarray(emits[0, :2])
        return emits

    _, dt3 = timed("stage3 (traceback)", run3)

    # ---- full fused ----
    def runf():
        return dpp.dp_profile_pallas_paths(params, pairs)

    _, dtf = timed("full fused path", runf)

    cells = BATCH * w1p * w2p
    print(f"\ncells/batch = {cells:.3e}")
    for name, dt in [("stage0", dt0), ("stage1", dt1), ("stage2", dt2),
                     ("stage3", dt3), ("full", dtf)]:
        print(f"{name}: {dt * 1e3:8.2f} ms  ({cells / dt:.3e} cells/s)")


if __name__ == "__main__":
    main()
