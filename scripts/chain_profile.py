#!/usr/bin/env python
"""Measure the device chain dispatcher's per-merge cost on real TPU.

Simulates the 100k flagship's serial chain sections: a wide chain
profile (W0 columns, C0 members) absorbing ~300-residue leaves, chunked
CHAIN_K merges per dispatch with device-resident carry.  Compare against
the host route's ~5.3 ms/merge (round-4 scheduler stats).

Usage: python scripts/chain_profile.py [W0] [C0] [n_chunks]
"""

import sys
import time
from types import SimpleNamespace

sys.path.insert(0, "/root/repo")

import numpy as np

from famsa_tpu.core.params import Params

W0 = int(sys.argv[1]) if len(sys.argv) > 1 else 7000
C0 = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
NCHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def main():
    from famsa_tpu.ops.dp_chain import (CHAIN_K, ChainState,
                                        dispatch_chain_chunk, lw_for)

    params = Params()
    params.adjust(100000)
    rng = np.random.default_rng(0)

    # chain-start profile stand-in: plausible counters (4 symbols/col)
    counters = np.zeros((W0 + 1, 32), dtype=np.int64)
    sel = rng.integers(0, 20, size=(W0 + 1, 4))
    for k in range(4):
        np.put_along_axis(counters, sel[:, k:k + 1], C0 // 4, axis=1)
    counters[0] = 0
    start = SimpleNamespace(counters=counters, width=W0,
                            data=[None] * C0, dev_counters=None)

    def leaf():
        ln = int(rng.integers(250, 350))
        gs = SimpleNamespace(symbols=rng.integers(0, 20, size=ln)
                             .astype(np.int8), size=ln)
        return SimpleNamespace(data=[gs], width=ln)

    state = ChainState.seed(start)

    def make_chunk(bound):
        """Adaptive chunk: grow while the width bound fits a variant."""
        leaves, wsum = [], 0
        while len(leaves) < CHAIN_K:
            l = leaf()
            if lw_for(bound + wsum + l.width + 1) is None:
                break
            leaves.append(l)
            wsum += l.width
        return leaves, wsum, lw_for(bound + wsum + 1)

    leaves, wsum, lw = make_chunk(W0)
    print(f"W0={W0} C0={C0} K={CHAIN_K} chunks={NCHUNK} lw={lw} "
          f"first chunk n={len(leaves)}", flush=True)

    # compile + warm
    t0 = time.perf_counter()
    pend = dispatch_chain_chunk(params, state, leaves, lw,
                                card_bound=C0 + 100000)
    res = pend.resolve()
    print(f"compile+first chunk: {time.perf_counter() - t0:.1f} s "
          f"(path len {len(res[0].path)}, {len(res[-1].path)})", flush=True)

    # steady state: chunks chained through device state, resolve lagging
    # (when the bound outruns capacity, resolve to tighten it - the real
    # width grows far slower than the leaf-sum bound)
    bound = len(res[-1].path)
    t0 = time.perf_counter()
    pends = []
    outs = []
    n_merges = 0
    launched = 0
    while launched < NCHUNK or pends:
        if launched < NCHUNK and len(pends) < 2:
            leaves, wsum, lwc = make_chunk(bound)
            if leaves:
                pends.append((dispatch_chain_chunk(
                    params, state, leaves, lwc,
                    card_bound=C0 + 100000), wsum))
                bound += wsum
                n_merges += len(leaves)
                launched += 1
                continue
            if not pends:
                print("capacity exhausted", flush=True)
                break
        p, wsum = pends.pop(0)
        r = p.resolve()
        outs.append(r)
        bound = bound - wsum + 0
        bound = min(bound, len(r[-1].path) + sum(w for _, w in pends))
    dt = time.perf_counter() - t0
    print(f"steady: {dt:.2f} s for {n_merges} merges -> "
          f"{dt / n_merges * 1e3:.2f} ms/merge "
          f"(host route round-4: ~5.3 ms/merge)", flush=True)
    w_last = len(outs[-1][-1].path)
    print(f"final chain width {w_last}", flush=True)


if __name__ == "__main__":
    main()


def ablate():
    """Per-stage ablation of one chain step: DP-only / +traceback /
    +merged-counters (full), each as a fake-carry scan so stages can be
    dropped without breaking the chain dependency."""
    import functools

    import jax
    import jax.numpy as jnp

    from famsa_tpu.ops import dp_giant as G
    from famsa_tpu.ops.dp_chain import CHAIN_K, CHAIN_W1P, _sm_dev

    params = Params()
    params.adjust(100000)
    rng = np.random.default_rng(0)
    lw = 2048
    rows = G.GMAX_ROWS
    gp = (np.int64(params.gap_open), np.int64(params.gap_ext),
          np.int64(params.gap_term_open), np.int64(params.gap_term_ext))
    sm = _sm_dev(params)

    c = np.zeros((rows, 32), dtype=np.int32)
    sel = rng.integers(0, 20, size=(rows, 4))
    for k in range(4):
        np.put_along_axis(c, sel[:, k:k + 1], 12500, axis=1)
    c[0] = 0
    c_d = jnp.asarray(c)
    syms = np.full((CHAIN_K, CHAIN_W1P), 31, dtype=np.int8)
    for i in range(CHAIN_K):
        syms[i, :300] = rng.integers(0, 20, size=300)
    syms_d = jnp.asarray(syms)
    lws_d = jnp.full((CHAIN_K,), 300, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def scan(c0, syms, lwv, mode):
        def step(cc, x):
            sy, lwid = x
            if mode == "dp":
                packed = G._giant_core(
                    None, sy, cc, None, lwid, jnp.int32(W0), jnp.int32(1),
                    jnp.int32(50000), sm, gp, lw=lw, w1p=CHAIN_W1P,
                    merged=False, skip_tb=True)
                return cc, packed[0, -4:]
            if mode == "dptb":
                packed = G._giant_core(
                    None, sy, cc, None, lwid, jnp.int32(W0), jnp.int32(1),
                    jnp.int32(50000), sm, gp, lw=lw, w1p=CHAIN_W1P,
                    merged=False)
                return cc, packed[0, -4:]
            packed, mc, m = G._giant_core(
                None, sy, cc, None, lwid, jnp.int32(W0), jnp.int32(1),
                jnp.int32(50000), sm, gp, lw=lw, w1p=CHAIN_W1P,
                merged=True, nl=3, want_width=True)
            return mc, packed[0, -4:]
        _, outs = jax.lax.scan(step, c0, (syms, lwv))
        return outs

    import time as _t
    for mode in ("dp", "dptb", "full"):
        t0 = _t.perf_counter()
        np.asarray(scan(c_d, syms_d, lws_d, mode))
        print(f"{mode}: compile+first {_t.perf_counter()-t0:.1f} s",
              flush=True)
        t0 = _t.perf_counter()
        for _ in range(3):
            np.asarray(scan(c_d, syms_d, lws_d, mode))
        dt = (_t.perf_counter() - t0) / 3
        print(f"{mode}: {dt/CHAIN_K*1e3:.2f} ms/merge", flush=True)


if len(sys.argv) > 4 and sys.argv[4] == "ablate":
    main = ablate


if __name__ == "____never__":
    pass
elif len(sys.argv) > 4 and sys.argv[4] == "ablate":
    ablate()
