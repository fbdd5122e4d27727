#!/usr/bin/env python
"""Real-TPU validation + timing of the Pallas DP kernel vs the lax.scan
kernel (ops/dp_jax.py).  Run WITHOUT the test conftest (uses the tunnel TPU).

Usage: python scripts/tpu_pallas_check.py [W [CARD [BATCH]]]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

print("devices:", jax.devices(), file=sys.stderr)

from famsa_tpu.core.params import Params
from famsa_tpu.ops.dp_jax import dp_profile_jax_batched
from famsa_tpu.ops.dp_pallas import dp_profile_pallas_batched, _pallas_bucket
from bench import _random_profile  # noqa: E402

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
CARD = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 8

params = Params()
params.adjust(1000)
rng = np.random.default_rng(0)
pairs = [(_random_profile(rng, params, CARD, W),
          _random_profile(rng, params, CARD, W)) for _ in range(BATCH)]

t0 = time.perf_counter()
ref = dp_profile_jax_batched(params, pairs)
print(f"scan kernel compile+run: {time.perf_counter()-t0:.1f} s", file=sys.stderr)

t0 = time.perf_counter()
out = dp_profile_pallas_batched(params, pairs)
print(f"pallas kernel compile+run: {time.perf_counter()-t0:.1f} s", file=sys.stderr)

for k, (r, o) in enumerate(zip(ref, out)):
    assert r.last == o.last, (k, r.last, o.last)
    w1, w2 = pairs[k][0].width, pairs[k][1].width
    for name in ("dirs_D", "dirs_H", "dirs_V"):
        a = getattr(r, name)[:w1 + 1, :w2 + 1]
        b = getattr(o, name)[:w1 + 1, :w2 + 1]
        if not np.array_equal(a, b):
            bad = np.argwhere(a != b)
            print(f"merge {k} {name}: {len(bad)} mismatches, first {bad[0]}",
                  file=sys.stderr)
            raise SystemExit(1)
print("PARITY OK", file=sys.stderr)

wp = _pallas_bucket(W)
cells = BATCH * wp * wp


def timeit(fn, label, iters=3):
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(params, pairs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms -> {cells/dt:.3e} cells/s", file=sys.stderr)
    return cells / dt


timeit(dp_profile_jax_batched, "scan ")
timeit(dp_profile_pallas_batched, "pallas")
