#!/usr/bin/env python
"""Benchmark: profile-DP cell updates/s on the current accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: DP cell updates per second of the fused profile-alignment kernel
(famsa_tpu/ops/dp_jax.py) on a batch of 2048x2048 merges of 64-sequence
profiles - the hot loop of progressive MSA (reference
profile_seq.cpp:495-892).  The batched variant reflects the production
schedule (independent tree merges are vmapped into one launch).

Baseline: the reference FAMSA 2.5.0 AVX2 build measured on this host
(2 threads): 1.713e8 cell updates/s (famsa -gt import sl.dnd
-refine_mode off on adeno_fiber: 7,473,478 DP cells / time.alignment).
If /tmp/refbuild/bin/famsa exists, the baseline is re-measured live.
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


def _random_profile(rng, params, n_seqs, n_cols):
    """Random gapped profile, vectorized (the benchmark builds dozens of
    2048-wide card-64 profiles; a per-char Python loop costs minutes of
    host time before any device work)."""
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.core.sequence import encode_gapped
    aa_arr = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    p = Profile(params)
    gap = rng.random((n_seqs, n_cols)) < 0.15
    sym = rng.integers(0, 20, size=(n_seqs, n_cols))
    rows = np.where(gap, np.uint8(ord("-")), aa_arr[sym])
    rows[gap.all(axis=1), 0] = ord("A")
    for k in range(n_seqs):
        p.append_raw_sequence(
            encode_gapped(f">s{k}", rows[k].tobytes().decode(), k))
    p.calculate_counters_scores()
    return p


def run_e2e_guard():
    """Whole-pipeline regression guard - full adeno_fiber alignment
    (fixed imported tree, refinement off) through the production
    compute_msa path: scheduler, DP, traceback-construct, dedup/restore,
    writer.  Runs FIRST and unconditionally so a kernel-bench crash can
    never mask a pipeline regression (stderr only)."""
    from famsa_tpu.cli import main as cli_main
    ref_dir = "/root/reference/test/adeno_fiber"
    t0 = time.perf_counter()
    cli_main(["-gt", "import", f"{ref_dir}/upgma.dnd", "-refine_mode",
              "off", f"{ref_dir}/adeno_fiber", "/tmp/bench_e2e.fasta"])
    dt_e2e = time.perf_counter() - t0
    ok = open("/tmp/bench_e2e.fasta", "rb").read() == \
        open(f"{ref_dir}/upgma.no_refine.fasta", "rb").read()
    print(f"e2e adeno (import tree, no refine): {dt_e2e:.2f} s "
          f"-> {REF_CELLS/dt_e2e:.3e} cells/s incl. host stages"
          f" (golden match: {ok})", file=sys.stderr)
    if not ok:
        raise SystemExit("E2E GOLDEN MISMATCH - pipeline regression")


def main():
    import jax

    from famsa_tpu.core.params import Params

    print(f"devices: {jax.devices()}", file=sys.stderr)
    on_tpu = jax.default_backend() == "tpu"

    if os.environ.get("BENCH_E2E", "1") == "1":
        run_e2e_guard()

    if on_tpu:
        # production TPU path: Mosaic DP kernel + on-device traceback +
        # on-device merged counters.  Counters are DEVICE-RESIDENT as in
        # the pipeline's steady state (a merge's counters are produced on
        # device by the previous merge, ops/dp_pallas.py:
        # merged_counters_device); only the O(W) paths leave the device.
        import jax.numpy as jnp

        from famsa_tpu.ops.dp_pallas import (MergedRef,
                                             _pallas_bucket as _bucket,
                                             dp_profile_pallas_paths_async)

        def _make_dev(pairs):
            # one stacked tensor per side + MergedRef views, exactly the
            # steady-state shape the pipeline's resolve() hands out (the
            # dispatch then needs ONE gather, not an eager per-merge stack)
            w1p = max(_bucket(p1.width) for p1, _ in pairs)
            w2p = max(_bucket(p2.width) for _, p2 in pairs)
            c1s = np.zeros((len(pairs), w1p + 1, 32), np.int32)
            c2s = np.zeros((len(pairs), w2p + 1, 32), np.int32)
            for k, (p1, p2) in enumerate(pairs):
                c1s[k, :p1.width + 1] = p1.counters
                c2s[k, :p2.width + 1] = p2.counters
            d1, d2 = jnp.asarray(c1s), jnp.asarray(c2s)
            return [(MergedRef(d1, k, p1.width + 1),
                     MergedRef(d2, k, p2.width + 1))
                    for k, (p1, p2) in enumerate(pairs)]

        _dev_pairs = None

        def _dp(params, pairs):
            return dp_profile_pallas_paths_async(
                params, pairs, dev_pairs=_dev_pairs, want_merged=True)

        def _drain(pending):
            return [p.resolve() for p in pending]
    else:
        from famsa_tpu.ops.dp_jax import _bucket
        from famsa_tpu.ops.dp_jax import dp_profile_jax_batched as _dp_sync

        def _dp(params, pairs):
            return _dp_sync(params, pairs)

        def _drain(pending):
            return pending

    params = Params()
    params.adjust(1000)
    rng = np.random.default_rng(0)

    w = int(os.environ.get("BENCH_W", "2048"))
    card = int(os.environ.get("BENCH_CARD", "64"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))

    pairs = [( _random_profile(rng, params, card, w),
               _random_profile(rng, params, card, w)) for _ in range(batch)]
    if on_tpu:
        _dev_pairs = _make_dev(pairs)

    # warmup / compile
    t0 = time.perf_counter()
    _drain([_dp(params, pairs)])
    print(f"compile+first run: {time.perf_counter()-t0:.1f} s", file=sys.stderr)

    n_iter = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    # pipelined: all batches in flight, then resolve (paths + scores)
    _drain([_dp(params, pairs) for _ in range(n_iter)])
    dt = (time.perf_counter() - t0) / n_iter

    wp = _bucket(pairs[0][0].width)
    cells = batch * wp * _bucket(pairs[0][1].width)
    rate = cells / dt
    print(f"dp kernel: batch={batch} x {wp}^2 in {dt*1e3:.2f} ms -> "
          f"{rate:.3e} cells/s", file=sys.stderr)

    if on_tpu and os.environ.get("BENCH_LCS", "1") == "1":
        # secondary metric (stderr): distance-kernel throughput - the
        # guide-tree stage's hot loop (reference lcsbp_avx2_intr.cpp:86)
        from famsa_tpu.core.sequence import Sequence
        from famsa_tpu.ops.distance import get_distance_backend
        from famsa_tpu.core.params import DIST_INDEL075_DIV_LCS
        aa = "ARNDCQEGHILKMFPSTWYV"
        nq, ln = 4096, 300
        seqs = [Sequence(f">q{k}",
                         "".join(aa[rng.integers(0, 20)] for _ in range(ln)),
                         k) for k in range(nq)]
        lmax = max(s.length for s in seqs)
        for s in seqs:
            s.resize(lmax)
        be = get_distance_backend(seqs, DIST_INDEL075_DIV_LCS, np.float64,
                                  backend="jax")
        be.row(0)                                   # warm / compile
        nrows = 32
        t0 = time.perf_counter()
        for r in range(1, nrows + 1):
            be.row(r)
        dt_lcs = time.perf_counter() - t0
        print(f"lcs distance rows: {nrows} x {nq} pairs (len {ln}) in "
              f"{dt_lcs*1e3:.1f} ms -> {nrows*nq/dt_lcs:.3e} pairs/s",
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
