#!/usr/bin/env python
"""Sharded-path efficiency on the virtual 8-device CPU mesh (VERDICT
task 8): per-round collective overhead of sharded Prim and the halo /
two-phase-scan overhead of sharded DP, measured 8 devices vs 1, so the
first real multi-chip run has a prediction to check.

Run with:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/mesh_efficiency.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np


def timed(fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    return (time.perf_counter() - t0) / n, out


def main():
    import jax
    import jax.numpy as jnp

    from famsa_tpu.core.params import Params
    from famsa_tpu.parallel.mesh import make_mesh
    from famsa_tpu.parallel.dp_sharded import dp_profile_sharded_paths
    from famsa_tpu.parallel.dist_sharded import mst_prim_tree_sharded
    from famsa_tpu.tree.mst_prim import mst_prim_tree
    from famsa_tpu.ops.distance import get_distance_backend
    from famsa_tpu.core.params import DIST_INDEL075_DIV_LCS
    from famsa_tpu.core.sequence import Sequence

    print(f"devices: {len(jax.devices())}", flush=True)
    rng = np.random.default_rng(3)
    aa = "ARNDCQEGHILKMFPSTWYV"

    # ---- sharded Prim: n rounds, one all_gather argmin per round ----
    n, ln = 512, 120
    seqs = [Sequence(f">s{k}", "".join(aa[rng.integers(0, 20)]
                                       for _ in range(int(rng.integers(
                                           ln // 2, ln)))), k)
            for k in range(n)]
    lmax = max(s.length for s in seqs)
    for s in seqs:
        s.resize(lmax)

    mesh = make_mesh(axis="rows")

    def run_sharded():
        tree = [(-1, -1)] * n
        mst_prim_tree_sharded(seqs, tree, mesh)
        return tree

    def run_host():
        tree = [(-1, -1)] * n
        be = get_distance_backend(seqs, DIST_INDEL075_DIV_LCS, np.float64,
                                  "numpy")
        mst_prim_tree(n, lambda ref, ids: be.row(ref, ids), tree,
                      lengths=[s.length for s in seqs],
                      measure=DIST_INDEL075_DIV_LCS)
        return tree

    dt8, t8 = timed(run_sharded, n=3)
    dth, th = timed(run_host, n=3)
    assert t8 == th, "sharded Prim tree diverged"
    print(f"prim {n} rounds: sharded(8 dev) {dt8*1e3:.0f} ms "
          f"({dt8/n*1e6:.0f} us/round incl. 1 all_gather argmin + 1 "
          f"psum-style fold), host backend {dth*1e3:.0f} ms", flush=True)

    # ---- sharded DP: halo ppermute + two-phase scan per row ----
    sys.path.insert(0, "/root/repo/tests")
    from test_dp_jax_parity import _make_profile

    params = Params()
    params.adjust(50)
    mesh_c = make_mesh(axis="cols")
    p1 = _make_profile(rng, params, 4, 360)
    p2 = _make_profile(rng, params, 4, 760)

    def run_dp():
        # fresh copies: construct consumes nothing here, paths only
        return dp_profile_sharded_paths(params, p1, p2, mesh_c)

    dtdp, r8 = timed(run_dp, n=3)

    # single-device comparison: the same XLA program logic on 1 device
    from famsa_tpu.ops.dp_jax import dp_profile_jax
    from famsa_tpu.core.construct import _trace_path

    def run_dp1():
        return dp_profile_jax(params, p1, p2)

    dtdp1, r1 = timed(run_dp1, n=3)
    path1, tot1 = _trace_path(r1, p1.width, p2.width)
    assert r8.total == tot1 and r8.path == path1
    w1, w2 = p1.width, p2.width
    print(f"dp {w1}x{w2}: sharded(8 dev) {dtdp*1e3:.0f} ms vs "
          f"single-device scan {dtdp1*1e3:.0f} ms; per-row overhead = "
          f"2 ppermute halos + 2 all_gather (bc offset, cummax carry) + "
          f"1 all_gather finals = {(dtdp)/w1*1e6:.0f} us/row sharded vs "
          f"{dtdp1/w1*1e6:.0f} us/row local", flush=True)


if __name__ == "__main__":
    main()
