#!/usr/bin/env python
"""Giant-merge staggered-fold kernel on real TPU: parity vs host DP +
compile/steady-state timing.  Usage: tpu_giant_check.py [W1 W2 CARD]."""

import sys
import time

import numpy as np

from famsa_tpu.core.construct import _trace_path
from famsa_tpu.core.dp import dp_prof_prof
from famsa_tpu.core.params import Params
from famsa_tpu.core.profile import Profile
from famsa_tpu.core.sequence import encode_gapped
from famsa_tpu.ops.dp_giant import dp_profile_giant_paths_async, lw_for

AA = "ARNDCQEGHILKMFPSTWYV"


def make_profile(rng, params, n_seqs, n_cols):
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


def main():
    import jax
    print("devices:", jax.devices(), file=sys.stderr)
    w1 = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    w2 = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    card = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    check = "-nocheck" not in sys.argv

    rng = np.random.default_rng(0)
    params = Params()
    params.adjust(1000)
    p1 = make_profile(rng, params, card, w1)
    p2 = make_profile(rng, params, card, w2)
    print(f"merge: {p1.width} x {p2.width}, card {card}, "
          f"lw={lw_for(p2.width)}", file=sys.stderr)

    t0 = time.perf_counter()
    res = dp_profile_giant_paths_async(params, p1, p2,
                                       want_merged=True).resolve()[0]
    print(f"compile+first run: {time.perf_counter()-t0:.1f} s",
          file=sys.stderr)

    n_iter = 5
    t0 = time.perf_counter()
    pend = [dp_profile_giant_paths_async(params, p1, p2, want_merged=True)
            for _ in range(n_iter)]
    outs = [p.resolve() for p in pend]
    dt = (time.perf_counter() - t0) / n_iter
    cells = p1.width * p2.width
    print(f"steady state: {dt*1e3:.1f} ms/merge -> {cells/dt:.3e} cells/s",
          file=sys.stderr)

    if check:
        t0 = time.perf_counter()
        ref = dp_prof_prof(params, p1, p2)
        path, total = _trace_path(ref, p1.width, p2.width)
        print(f"host reference DP: {time.perf_counter()-t0:.1f} s",
              file=sys.stderr)
        ok_t = res.total == total
        ok_p = res.path == path
        print(f"parity: total {ok_t}, path {ok_p}", file=sys.stderr)
        if not (ok_t and ok_p):
            raise SystemExit("GIANT KERNEL PARITY FAILURE")
        # merged counters vs host construct
        from famsa_tpu.core.aligner import construct_profile
        dest = Profile(params)
        construct_profile(dest, p1, p2, res)
        mc = np.asarray(res.merged_dev)
        ok_c = np.array_equal(mc[:dest.width + 1],
                              dest.counters.astype(np.int32))
        print(f"merged counters parity: {ok_c}", file=sys.stderr)
        if not ok_c:
            raise SystemExit("GIANT MERGED COUNTERS FAILURE")
    print("OK")


if __name__ == "__main__":
    main()
