#!/usr/bin/env python
"""Piecewise timing of the Pallas DP path on the real TPU:
 - tunnel bandwidth (device->host of 10 MB)
 - kernel-only (inputs staged on device, only tiny 'fins' pulled back)
 - full wrapper (host prep + transfers + pull dirs)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), file=sys.stderr)

from famsa_tpu.core.params import Params
from famsa_tpu.ops import dp_pallas as dpp
from bench import _random_profile

W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
CARD = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 8

# --- tunnel bandwidth ---
big = jnp.zeros((10 * 1024 * 1024 // 4,), jnp.int32) + 1
np.asarray(big)
t0 = time.perf_counter()
for _ in range(3):
    np.asarray(big + 1)
dt = (time.perf_counter() - t0) / 3
print(f"tunnel: 10MB device->host in {dt*1e3:.1f} ms -> {10/dt:.0f} MB/s",
      file=sys.stderr)

params = Params()
params.adjust(1000)
rng = np.random.default_rng(0)
pairs = [(_random_profile(rng, params, CARD, W),
          _random_profile(rng, params, CARD, W)) for _ in range(BATCH)]

sb = 8 if BATCH >= 5 else 1
w1p = max(dpp._pallas_bucket(p.width) for p, _ in pairs)
w2p = max(dpp._pallas_bucket(p.width) for _, p in pairs)
w2pe = w2p + dpp.LANE_PAD
blk = dpp._row_block(sb, w2pe)
g = (BATCH + sb - 1) // sb
print(f"sb={sb} blk={blk} w1p={w1p} w2p={w2p} g={g}", file=sys.stderr)

t0 = time.perf_counter()
colps, xsps = [], []
for k in range(g * sb):
    p1, p2 = pairs[min(k, BATCH - 1)]
    c, x = dpp._prepare_pallas(params, p1, p2, w1p, w2p)
    colps.append(c)
    xsps.append(x)
print(f"host prep: {time.perf_counter()-t0:.3f} s", file=sys.stderr)


def stack(ds):
    return {k: jnp.asarray(
        np.stack([d[k] for d in ds]).reshape((g, sb) + np.shape(ds[0][k])))
        for k in ds[0]}

t0 = time.perf_counter()
colp, xs = stack(colps), stack(xsps)
jax.block_until_ready((colp, xs))
print(f"stack+upload: {time.perf_counter()-t0:.3f} s", file=sys.stderr)

# kernel-only: device-resident inputs; pull only fins' last element
t0 = time.perf_counter()
dirs, fins = dpp._dp_pallas(colp, xs, sb, blk, w1p, w2p)
np.asarray(fins[0, -1, 0])
print(f"compile+first: {time.perf_counter()-t0:.1f} s", file=sys.stderr)

cells = BATCH * w1p * w2p
for label, pull in (("kernel only (fins)", False), ("kernel + dirs pull", True)):
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        dirs, fins = dpp._dp_pallas(colp, xs, sb, blk, w1p, w2p)
        if pull:
            np.asarray(dirs)
        np.asarray(fins[0, -1, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms -> {cells/dt:.3e} cells/s", file=sys.stderr)

t0 = time.perf_counter()
iters = 3
for _ in range(iters):
    dpp.dp_profile_pallas_batched(params, pairs)
dt = (time.perf_counter() - t0) / iters
print(f"full wrapper: {dt*1e3:.1f} ms -> {cells/dt:.3e} cells/s", file=sys.stderr)
