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

# BASELINE.md's bar is >=10x a 32-core reference; this host has 2 cores.
# The reference's DP stage scales near-linearly with threads (its thread
# wavefront, profile_par.cpp:441-905, keeps all cores busy on merges this
# size), so the 32-core-equivalent figure scales the live 2-thread
# measurement by 32/threads.  Reported explicitly so the headline
# vs_baseline (vs the LIVE local build) cannot be mistaken for the bar.
TARGET_CORES = 32


def measure_baseline(n_runs=3):
    """Returns (cells_per_sec, n_threads) of the live reference build.

    The measurement is the MEDIAN of n_runs alignments: a single run
    jitters +-15% with host load (round-4 docs carried 0.87x/0.99x/1.1x
    for the same kernel), which made vs_32core_equiv a moving target."""
    ref_dir = "/root/reference/test/adeno_fiber"
    nthr = os.cpu_count() or 2
    if not os.path.exists(REF_BIN):
        return FALLBACK_BASELINE, 2
    rates = []
    for _ in range(n_runs):
        try:
            stats = "/tmp/ref_bench_stats.txt"
            subprocess.run(
                [REF_BIN, "-t", str(nthr), "-gt", "import",
                 f"{ref_dir}/sl.dnd", "-refine_mode", "off", "-stats", stats,
                 f"{ref_dir}/adeno_fiber", "/tmp/ref_bench_out.fasta"],
                check=True, capture_output=True, timeout=300)
            for line in open(stats):
                if line.startswith("time.alignment="):
                    t = float(line.split("=")[1])
                    rates.append(REF_CELLS / t)
        except Exception as e:
            print(f"baseline re-measure failed ({e}); using recorded value",
                  file=sys.stderr)
            return FALLBACK_BASELINE, 2
    if not rates:
        return FALLBACK_BASELINE, 2
    print(f"baseline runs: {', '.join(f'{r:.3e}' for r in sorted(rates))} "
          f"cells/s (median of {len(rates)})", file=sys.stderr)
    return float(np.median(rates)), nthr


# v5e peaks for the roofline lines (one TensorCore: 4 MXUs of 128x128
# bf16 MACs + an 8x128 VPU with 4 ALU sub-units, ~940 MHz): MXU ~197
# TFLOP/s bf16, VPU ~ 8*128*4*0.94e9 ~ 3.9e12 i32 ops/s.
VPU_PEAK_OPS = 3.9e12
MXU_PEAK_FLOPS = 1.97e14

# i32 VPU ops per DP cell in the production single-word + MXU-tb config,
# counted from the kernel row body (ops/dp_pallas.py:_make_kernel): D/H/V
# channel pair arithmetic (p_add ~4 ops, p_gt ~4, p_where 2), the
# log-depth H cummax (~13 rounds x 10 ops amortized per lane), block
# prologue cost builds, packing.  The MXU-tb variant moves the 30-term
# match MAC onto the MXU (~60 matmul flops/cell not counted here).
DP_OPS_PER_CELL_EST = 160


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
    # the pipeline's giant-variant prewarm thread would keep the remote
    # AOT helper busy into the timed kernel sections (measured: an 18x
    # slower DP batch while variants compile in the background)
    os.environ.setdefault("FAMSA_TPU_PREWARM", "0")
    ref_dir = "/root/reference/test/adeno_fiber"
    t0 = time.perf_counter()
    rc = cli_main(["-gt", "import", f"{ref_dir}/upgma.dnd", "-refine_mode",
                   "off", f"{ref_dir}/adeno_fiber", "/tmp/bench_e2e.fasta"])
    if rc != 0:
        raise SystemExit(f"E2E guard: cli returned {rc}")
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
    mfu_vpu = rate * DP_OPS_PER_CELL_EST / VPU_PEAK_OPS
    print(f"dp roofline: ~{DP_OPS_PER_CELL_EST} i32 VPU ops/cell -> "
          f"{rate * DP_OPS_PER_CELL_EST:.2e} ops/s = "
          f"{100 * mfu_vpu:.1f}% of v5e VPU peak ({VPU_PEAK_OPS:.1e}); "
          f"MXU carries the 30-term match MAC "
          f"({rate * 60:.1e} flops/s = "
          f"{100 * rate * 60 / MXU_PEAK_FLOPS:.2f}% of MXU peak)",
          file=sys.stderr)

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
        # measure FULL row-block dispatches (the production sweep shape;
        # single be.row() calls after the first are served from the
        # prefetch cache and would time only the host transform)
        nrows = be.block_rows
        ids = np.arange(nrows)
        be._lcs_block(ids)                          # warm / compile
        n_iter = 3
        t0 = time.perf_counter()
        for _ in range(n_iter):
            be._lcs_block(ids)
        dt_lcs = (time.perf_counter() - t0) / n_iter
        prate = nrows * nq / dt_lcs
        print(f"lcs kernel block: {nrows} x {nq} pairs (len {ln}) in "
              f"{dt_lcs*1e3:.1f} ms -> {prate:.3e} pairs/s",
              file=sys.stderr)
        t0 = time.perf_counter()
        be.rows_batch(ids)                          # kernel + transform
        dt_e2e = time.perf_counter() - t0
        print(f"lcs rows incl. f64 transform: {nrows * nq / dt_e2e:.3e} "
              f"pairs/s", file=sys.stderr)
        # LCS roofline: the bit-parallel update is ~9.5 i32 VPU ops per
        # u32 word per streamed symbol (ops/lcs_pallas.py one_pos);
        # a pair at len L costs L * ceil(L/32) word-updates.  This bound
        # (~1.4e8 pairs/s at len 300) is the i32 VPU speed of light for
        # the exact Hyyro recurrence; beating it needs a different
        # algorithm, not a better kernel.
        words = ln * -(-ln // 32)
        lcs_ops = prate * words * 9.5
        print(f"lcs roofline: ~{int(words * 9.5)} i32 ops/pair -> "
              f"{lcs_ops:.2e} ops/s = "
              f"{100 * lcs_ops / VPU_PEAK_OPS:.1f}% of v5e VPU peak",
              file=sys.stderr)

    baseline, nthr = measure_baseline()
    base32 = baseline * TARGET_CORES / nthr
    print(f"baseline (reference famsa, this host, {nthr} threads): "
          f"{baseline:.3e} cells/s; {TARGET_CORES}-core-equivalent "
          f"(linear scale): {base32:.3e} cells/s", file=sys.stderr)

    print(json.dumps({
        "metric": "profile_cell_updates_per_sec",
        "value": rate,
        "unit": "cells/s",
        "vs_baseline": rate / baseline,
        "baseline_threads": nthr,
        "baseline_measured_cells_s": baseline,
        "vs_32core_equiv": rate / base32,
    }))


if __name__ == "__main__":
    main()
