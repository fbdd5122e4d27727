#!/usr/bin/env python
"""Probe: can Mosaic lower integer dot_general onto the TPU, and at what
cost?  Decides the implementation strategy for moving the DP kernel's
30-symbol match-score contraction (ops/dp_pallas.py row-block prologue)
onto the MXU (reference inner loop: profile_seq.cpp:698-712).

Variants (each its own tiny pallas kernel, timed over many grid steps):
  i8xi8->i32   dot_general with preferred_element_type=int32
  i32xi32->i32 dot_general
  f32 dot      (control: known-good MXU path)
  vpu-mac      the current 30-term multiply-add loop (control)

Run on the real TPU: python scripts/tpu_mxu_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 8, 32, 2176         # per-merge shapes in the DP row-block
SB = 8                        # merges per grid step (batch dim)
STEPS = 256                   # grid steps (like w1p/blk for w1p=2048)


def make_dot_kernel(adt, bdt, odt):
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((M, N), odt)
        for s in range(SB):
            acc = acc + jax.lax.dot_general(
                a_ref[0, s].astype(adt), b_ref[0, s].astype(bdt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=odt)
        o_ref[0] = acc
    return kernel


def make_mac_kernel():
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((M, N), jnp.int32)
        for s in range(SB):
            t = a_ref[0, s, :, 0:1] * b_ref[0, s, 0, :][None]
            for k in range(1, K):
                t = t + a_ref[0, s, :, k:k + 1] * b_ref[0, s, k, :][None]
            acc = acc + t
        o_ref[0] = acc
    return kernel


def run(label, kernel, adt_store, bdt_store):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 64, size=(STEPS, SB, M, K)).astype(adt_store)
    b = rng.integers(-100, 100, size=(STEPS, SB, K, N)).astype(bdt_store)
    z = np.int32(0)

    try:
        fn = pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((1, SB, M, K), lambda i: (i, z, z, z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SB, K, N), lambda i: (i, z, z, z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, N), lambda i: (i, z, z),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((STEPS, M, N), jnp.int32),
        )
        jf = jax.jit(fn)
        da, db = jnp.asarray(a), jnp.asarray(b)   # resident: time compute,
        t0 = time.perf_counter()                  # not tunnel uploads
        out = np.asarray(jf(da, db))
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(5):
            out = np.asarray(jf(da, db))
        dt = (time.perf_counter() - t0) / 5
        # correctness vs numpy
        want = np.einsum("sbmk,sbkn->smn", a.astype(np.int64),
                         b.astype(np.int64)).astype(np.int32)
        ok = np.array_equal(out, want)
        print(f"{label}: {dt * 1e3:.2f} ms / {STEPS} steps "
              f"(exact={ok})", flush=True)
    except Exception as e:
        print(f"{label}: FAILED - {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    run("i32xi32->i32", make_dot_kernel(jnp.int32, jnp.int32, jnp.int32),
        np.int32, np.int32)
    run("i8xi8->i32", make_dot_kernel(jnp.int8, jnp.int8, jnp.int32),
        np.int8, np.int8)
    run("vpu-mac-i32", make_mac_kernel(), np.int32, np.int32)
