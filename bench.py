#!/usr/bin/env python
"""Benchmark: profile-DP cell updates/s on the current accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: DP cell updates per second of the fused profile-alignment kernel
(famsa_tpu/ops/dp_jax.py) on a 2048x2048 merge of 64-sequence profiles -
the hot loop of progressive MSA (reference profile_seq.cpp:495-892).

Baseline: the reference FAMSA 2.5.0 AVX2 build measured on this host
(2 threads): 1.713e8 cell updates/s (famsa -gt import sl.dnd
-refine_mode off on adeno_fiber: 7,473,478 DP cells / 0.043625 s
time.alignment).  If /tmp/refbuild/bin/famsa exists, the baseline is
re-measured live.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_BIN = "/tmp/refbuild/bin/famsa"
REF_CELLS = 7_473_478
FALLBACK_BASELINE = 1.713e8


def measure_baseline():
    ref_dir = "/root/reference/test/adeno_fiber"
    if not os.path.exists(REF_BIN):
        return FALLBACK_BASELINE
    try:
        stats = "/tmp/ref_bench_stats.txt"
        subprocess.run(
            [REF_BIN, "-t", str(os.cpu_count() or 2), "-gt", "import",
             f"{ref_dir}/sl.dnd", "-refine_mode", "off", "-stats", stats,
             f"{ref_dir}/adeno_fiber", "/tmp/ref_bench_out.fasta"],
            check=True, capture_output=True, timeout=300)
        for line in open(stats):
            if line.startswith("time.alignment="):
                t = float(line.split("=")[1])
                return REF_CELLS / t
    except Exception as e:
        print(f"baseline re-measure failed ({e}); using recorded value",
              file=sys.stderr)
    return FALLBACK_BASELINE


def main():
    import jax
    import jax.numpy as jnp

    from famsa_tpu.core.params import Params
    from famsa_tpu.ops.dp_jax import _bucket, _dp_kernel, _gap_correction_arrays

    print(f"devices: {jax.devices()}", file=sys.stderr)

    params = Params()
    params.adjust(1000)
    rng = np.random.default_rng(0)

    w1 = w2 = 2048
    card = 64
    w1p, w2p = _bucket(w1), _bucket(w2)

    def fake_profile(wp, w):
        counters = np.zeros((wp + 1, 32), dtype=np.int64)
        counters[1:w + 1, :20] = rng.multinomial(card, np.full(20, 0.05), size=w)
        scores = rng.integers(-10**8, 10**8, size=(wp + 1, 32)).astype(np.int64)
        return counters, scores

    c1, s1 = fake_profile(w1p, w1)
    c2, s2 = fake_profile(w2p, w2)
    gc1 = np.stack(_gap_correction_arrays(c1, w1, card))
    gc2 = np.stack(_gap_correction_arrays(c2, w2, card))
    gap_costs = (np.int64(params.gap_open), np.int64(params.gap_ext),
                 np.int64(params.gap_term_open), np.int64(params.gap_term_ext))

    args = (jnp.asarray(c1), jnp.asarray(s1), jnp.asarray(c2), jnp.asarray(s2),
            np.int64(w1), np.int64(w2), np.int64(card), np.int64(card),
            jnp.asarray(gc1), jnp.asarray(gc2), gap_costs)

    # warmup / compile
    out = _dp_kernel(*args, w1p=w1p, w2p=w2p)
    jax.block_until_ready(out)

    n_iter = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = _dp_kernel(*args, w1p=w1p, w2p=w2p)
        # force completion incl. result materialization (tunnel-proof)
        _ = np.asarray(out[1])
    dt = (time.perf_counter() - t0) / n_iter

    cells = w1p * w2p
    rate = cells / dt
    print(f"dp kernel: {w1p}x{w2p} in {dt*1e3:.2f} ms -> {rate:.3e} cells/s",
          file=sys.stderr)

    baseline = measure_baseline()
    print(f"baseline (reference famsa, this host): {baseline:.3e} cells/s",
          file=sys.stderr)

    print(json.dumps({
        "metric": "profile_cell_updates_per_sec",
        "value": rate,
        "unit": "cells/s",
        "vs_baseline": rate / baseline,
    }))


if __name__ == "__main__":
    main()
