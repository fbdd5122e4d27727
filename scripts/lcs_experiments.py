#!/usr/bin/env python
"""LCS kernel geometry/structure experiments on real TPU.

Round-4 honest rate: 1.18e7 pairs/s = 8.6% of the kernel's own VPU
roofline.  Arithmetic: at 940 MHz a 256x4096-pair block at len 300
spends ~1090 cycles per streamed position vs ~100 cycles of pure ALU
issue - something non-ALU dominates.  Suspect list, each probed by a
variant kernel below:

  base    - production kernel (ops/lcs_pallas.py), for in-session scale
  static  - mask row indexed STATICALLY (wrong results; isolates the
            cost of the per-word scalar-dynamic VMEM loads)
  slab    - ONE dynamic slice of the whole [W, 8, QL] symbol slab per
            position (pl.dslice) instead of W scalar-indexed row loads
  cselect - carry-select: speculative per-word sums for carry-in 0/1
            computed in parallel, serial chain reduced to 2 selects/word
  nr2/nr4 - 2/4 interleaved independent reference chains (VERDICT ask:
            one 2-chain geometry is not a refutation)

Usage: python scripts/lcs_experiments.py [variant ...]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from famsa_tpu.core.defs import NO_SYMBOLS
from famsa_tpu.ops import lcs_pallas as LP
from famsa_tpu.ops.lcs import build_bit_masks, lcs_ref_vs_queries

MIN32 = np.int32(-2147483648)

NQ, LEN, R = 4096, 300, 256


def _popcount32(x):
    def srl(v, k):
        return jax.lax.shift_right_logical(v, jnp.full(v.shape, k, v.dtype))
    x = x - (srl(x, 1) & jnp.int32(0x55555555))
    x = (x & jnp.int32(0x33333333)) + (srl(x, 2) & jnp.int32(0x33333333))
    x = (x + srl(x, 4)) & jnp.int32(0x0F0F0F0F)
    return srl(x * jnp.int32(0x01010101), 24)


def _make_kernel_variant(w, length, ql, mode):
    """mode: 'plain' (baseline structure), 'static', 'slab', 'cselect'."""

    def kernel(syms_ref, table_ref, out_ref):
        def one_pos(t, xs):
            sym = syms_ref[0, 0, t]
            base = sym * np.int32(w)
            if mode == "slab":
                slab = table_ref[0, pl.dslice(base, w)]
            new = []
            if mode == "cselect":
                # parallel speculative sums for carry-in 0 and 1 (i32
                # carries: bool vreg state trips an i8->i1 trunc Mosaic
                # can't lower)
                s0s, c0s, c1s, ds = [], [], [], []
                for k in range(w):
                    v = xs[k]
                    m = table_ref[0, base + np.int32(k)]
                    tb = v & m
                    s0 = v + tb
                    c0 = ((s0 ^ MIN32) < (v ^ MIN32)).astype(jnp.int32)
                    s1 = s0 + jnp.int32(1)
                    c1 = c0 | (s1 == 0).astype(jnp.int32)
                    s0s.append(s0)
                    c0s.append(c0)
                    c1s.append(c1)
                    ds.append(v - tb)
                # serial: one add + one select per word
                c = jnp.zeros((8, ql), jnp.int32)
                for k in range(w):
                    v2 = s0s[k] + c
                    new.append(v2 | ds[k])
                    c = jnp.where(c == 1, c1s[k], c0s[k])
                return tuple(new)
            carry = jnp.zeros((8, ql), jnp.int32)
            for k in range(w):
                v = xs[k]
                if mode == "static":
                    m = table_ref[0, k]
                elif mode == "slab":
                    m = slab[k]
                else:
                    m = table_ref[0, base + np.int32(k)]
                tb = v & m
                v2 = v + tb + carry
                carry = ((v2 ^ MIN32) < (v ^ MIN32)).astype(jnp.int32)
                new.append(v2 | (v - tb))
            return tuple(new)

        if mode == "wave":
            # (position, word) wavefront: update (t, k) on diagonal
            # s = t + k.  Deps: (t-1, k) via xs[k], (t, k-1) via cars[k].
            # Each diagonal's <= W updates are mutually independent -
            # W-way ILP with zero extra arithmetic (vs the serial
            # word chain of the base kernel).
            xs = [jnp.full((8, ql), -1, jnp.int32) for _ in range(w)]
            cars = [jnp.zeros((8, ql), jnp.int32) for _ in range(w)]
            zero = jnp.zeros((8, ql), jnp.int32)
            for s in range(length + w - 1):
                for k in range(min(w - 1, s), -1, -1):
                    t = s - k
                    if t < 0 or t >= length:
                        continue
                    sym = syms_ref[0, 0, np.int32(t)]
                    m = table_ref[0, sym * np.int32(w) + np.int32(k)]
                    v = xs[k]
                    tb = v & m
                    cin = cars[k - 1] if k else zero
                    v2 = v + tb + cin
                    if k + 1 < w:
                        cars[k] = ((v2 ^ MIN32)
                                   < (v ^ MIN32)).astype(jnp.int32)
                    xs[k] = v2 | (v - tb)
            xs = tuple(xs)
        else:
            xs = tuple(jnp.full((8, ql), -1, jnp.int32) for _ in range(w))
            for t in range(length):
                xs = one_pos(np.int32(t), xs)
        cnt = jnp.zeros((8, ql), jnp.int32)
        for k in range(w):
            cnt = cnt + _popcount32(~xs[k])
        out_ref[0, 0, 0] = cnt
    return kernel


@functools.partial(jax.jit, static_argnames=("w", "length", "ql", "mode"))
def _run_variant(table, syms, w, length, ql, mode):
    nb = table.shape[0]
    r = syms.shape[0]
    syms3 = syms.reshape(r, 1, length)
    z = np.int32(0)
    out = pl.pallas_call(
        _make_kernel_variant(w, length, ql, mode),
        grid=(nb, r),
        in_specs=[
            pl.BlockSpec((1, 1, length), lambda b, i: (i, z, z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NO_SYMBOLS * w, 8, ql),
                         lambda b, i: (b, z, z, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 8, ql),
                               lambda b, i: (b, i, z, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, r, 1, 8, ql), jnp.int32),
    )(syms3, table)
    return out.reshape(nb, r, 8, ql)


def main():
    want = sys.argv[1:] or ["base", "static", "slab", "cselect", "nr2",
                            "nr4"]
    rng = np.random.default_rng(7)
    padded = np.full((NQ, LEN), 22, dtype=np.int8)
    for i in range(NQ):
        padded[i] = rng.integers(0, 20, size=LEN)
    w = (LEN + 31) // 32
    ql = LP._pick_ql(w)
    print(f"W={w} QL={ql} NQ={NQ} LEN={LEN} R={R}", flush=True)
    tab, w2, nb = LP.pack_query_table(padded, ql)
    tab_d = jnp.asarray(tab)
    ref_ids = np.arange(R)
    syms = padded[ref_ids].astype(np.int32)

    # golden check data (64 queries x 4 refs)
    def check(got):
        for k in (0, 5):
            masks = build_bit_masks(padded[k], LEN)
            want_row = lcs_ref_vs_queries(masks, padded[:64])
            np.testing.assert_array_equal(got[k][:64], want_row)

    results = {}

    def timed(label, fn, check_fn=None, n_iter=3):
        t0 = time.perf_counter()
        out = fn()
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)
        if check_fn:
            check_fn(out)
            print(f"{label}: parity OK", flush=True)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn()
        dt = (time.perf_counter() - t0) / n_iter
        rate = R * NQ / dt
        results[label] = rate
        print(f"{label}: {dt*1e3:.1f} ms -> {rate:.3e} pairs/s", flush=True)

    if "base" in want:
        timed("base", lambda: np.asarray(
            LP.lcs_rows(tab_d, syms, w, ql, NQ)),
            check_fn=check)

    for mode in ("static", "slab", "cselect", "wave"):
        if mode not in want:
            continue
        timed(mode, lambda m=mode: np.asarray(
            _run_variant(tab_d, jnp.asarray(syms), w, LEN, ql, m)
            ).astype(np.int64).transpose(1, 0, 2, 3).reshape(R, -1)[:, :NQ],
            check_fn=None if mode == "static" else check)

    # interleave geometries via the production machinery (fresh jit per
    # variant: the module-level jit caches on (w, length, ql) and would
    # serve a stale-nr program otherwise).  Geometry rationale: live
    # vector-register state is nr * W * ql/128 vregs; at W=10 the
    # production nr1/ql512 holds 40 + masks - likely spilling.
    for nr, qlv in ((1, 256), (1, 128), (2, 128), (2, 256), (4, 128),
                    (2, 512), (1, 1024)):
        label = f"nr{nr}_ql{qlv}"
        if f"nr{nr}" not in want and label not in want:
            continue
        orig_nr = LP._pick_nr
        LP._pick_nr = lambda w_, n=nr: n
        try:
            tab2, _, _ = LP.pack_query_table(padded, qlv)
            tab2_d = jnp.asarray(tab2)
            fn = jax.jit(LP._lcs_pallas_impl,
                         static_argnames=("w", "length", "ql", "interpret"))
            syms_d = jnp.asarray(syms)
            timed(label, lambda: np.asarray(
                fn(tab2_d, syms_d, w, LEN, qlv)
                ).astype(np.int64).transpose(1, 0, 2, 3)
                .reshape(R, -1)[:, :NQ],
                check_fn=check)
        finally:
            LP._pick_nr = orig_nr

    print("\n=== summary (pairs/s) ===")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k:12s} {v:.3e}")


if __name__ == "__main__":
    main()
