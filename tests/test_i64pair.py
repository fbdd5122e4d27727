"""(hi,lo) pair arithmetic vs numpy int64."""

import numpy as np
import jax.numpy as jnp

from famsa_tpu.ops import i64pair as P


def _rand(rng, n):
    return rng.integers(-(1 << 62), 1 << 62, size=n, dtype=np.int64)


def test_pair_ops():
    rng = np.random.default_rng(0)
    a = _rand(rng, 257)
    b = _rand(rng, 257)
    pa = P.from_i64(a)
    pb = P.from_i64(b)

    assert np.array_equal(P.to_i64(*P.add(pa, pb)), a + b)
    assert np.array_equal(P.to_i64(*P.sub(pa, pb)), a - b)
    assert np.array_equal(np.asarray(P.gt(pa, pb)), a > b)
    assert np.array_equal(P.to_i64(*P.maximum(pa, pb)),
                          np.maximum(a, b))


def test_pair_scans():
    rng = np.random.default_rng(1)
    neg_inf = -(1 << 62)
    a = rng.integers(-(1 << 40), 1 << 40, size=123, dtype=np.int64)
    pa = P.from_i64(a)
    assert np.array_equal(P.to_i64(*P.cummax_log(pa, neg_inf)),
                          np.maximum.accumulate(a))
    assert np.array_equal(P.to_i64(*P.cumsum_log(pa)),
                          np.cumsum(a))


def test_pair_masked_max():
    rng = np.random.default_rng(2)
    neg_inf = -(1 << 62)
    a = _rand(rng, 100)
    mask = rng.random(100) < 0.3
    pa = P.from_i64(a)
    got = int(P.to_i64(*P.masked_max(pa, jnp.asarray(mask), neg_inf)))
    exp = int(np.where(mask, a, neg_inf).max())
    assert got == exp
