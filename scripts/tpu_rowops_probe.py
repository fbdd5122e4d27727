#!/usr/bin/env python
"""Attribute the DP kernel's per-row cost: standalone Mosaic kernels
running 2048 'rows' x 8 sublane-merges of ONE op family each, on the
same [8, 2176] i32 shapes as ops/dp_pallas.py's row_body.

Variants:
  cummax  - the 12-round (hi, lo) pair max-plus lane scan
  shf     - 8x the roll-by-1 + lane-0 fill halo op
  sel     - 12x pair compare/select chains (p_gt + p_where)
  addmul  - 30x plain i32 multiply-accumulate (the old MAC, control)

python scripts/tpu_rowops_probe.py [variants...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SB, W2PE, ROWS, BLK = 8, 2176, 16384, 8
MIN32 = np.int32(-2147483648)


def _ult(a, b):
    return (a ^ MIN32) < (b ^ MIN32)


def p_add(x, y):
    lo = x[1] + y[1]
    carry = _ult(lo, x[1]).astype(jnp.int32)
    return (x[0] + y[0] + carry, lo)


def p_sub(x, y):
    lo = x[1] - y[1]
    borrow = _ult(x[1], y[1]).astype(jnp.int32)
    return (x[0] - y[0] - borrow, lo)


def p_gt(x, y):
    return (x[0] > y[0]) | ((x[0] == y[0]) & _ult(y[1], x[1]))


def p_where(c, x, y):
    return (jnp.where(c, x[0], y[0]), jnp.where(c, x[1], y[1]))


def p_max(x, y):
    return p_where(p_gt(x, y), x, y)


def make_kernel(variant):
    def row_op(h, l):
        lane = jax.lax.broadcasted_iota(jnp.int32, (SB, W2PE), 1)
        if variant == "cummax":
            k = 1
            while k < W2PE:
                hs = jnp.where(lane >= k, jnp.roll(h, k, axis=1),
                               jnp.int32(-2))
                ls = jnp.where(lane >= k, jnp.roll(l, k, axis=1),
                               jnp.int32(-2))
                h, l = p_max((h, l), (hs, ls))
                k *= 2
            return h, l
        if variant == "shf":
            for _ in range(8):
                h = jnp.where(lane == 0, jnp.int32(-3),
                              jnp.roll(h, 1, axis=1))
                l = jnp.where(lane == 0, jnp.int32(-3),
                              jnp.roll(l, 1, axis=1))
            return h, l
        if variant == "sel":
            x = (h, l)
            y = (l, h)
            for _ in range(12):
                c = p_gt(x, y)
                x = p_where(c, p_add(x, y), p_sub(x, y))
            return x
        if variant == "addmul":
            t = h
            for k in range(30):
                t = t + h * jnp.int32(k + 1)
            return t, l + t
        raise ValueError(variant)

    def kernel(x_ref, o_ref):
        h = x_ref[0, 0:SB, :]
        l = x_ref[0, SB:2 * SB, :]
        for _ in range(BLK):
            h, l = row_op(h, l)
        # tiny output: pulls must not swamp the timing (tunnel ~20-40 MB/s);
        # the lane reduce keeps every lane live (no DCE of elementwise work)
        o_ref[0, :, :] = jnp.broadcast_to(
            jnp.sum(h + l, axis=1, dtype=jnp.int32)[:, None], (SB, 128))

    return kernel


def run(variant):
    rng = np.random.default_rng(0)
    # ONE resident input block + ONE output block (constant index maps):
    # uploads/pulls are KBs, so timing is pure kernel compute
    x = rng.integers(-1000, 1000,
                     size=(1, 2 * SB, W2PE)).astype(np.int32)
    z = np.int32(0)
    fn = jax.jit(pl.pallas_call(
        make_kernel(variant),
        grid=(ROWS // BLK,),
        in_specs=[pl.BlockSpec((1, 2 * SB, W2PE), lambda i: (z, z, z),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SB, 128), lambda i: (z, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, SB, 128), jnp.int32),
    ))
    dx = jnp.asarray(x)
    t0 = time.perf_counter()
    np.asarray(fn(dx))
    print(f"{variant}: compile+first {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        out = np.asarray(fn(dx))
    dt = (time.perf_counter() - t0) / 10
    print(f"{variant}: {dt * 1e3:.2f} ms / {ROWS} rows "
          f"({dt / ROWS * 1e6:.2f} us/row)", flush=True)
    return out


if __name__ == "__main__":
    variants = sys.argv[1:] or ["cummax", "shf", "sel", "addmul"]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for v in variants:
        run(v)
