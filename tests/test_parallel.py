"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from famsa_tpu.parallel.mesh import (NEG_INF, dp_row_sharded, make_mesh,
                                     prim_round_sharded)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_prim_round_sharded_matches_host():
    from famsa_tpu.ops.lcs import build_bit_masks, lcs_ref_vs_queries
    from famsa_tpu.ops.lcs_jax import build_bit_masks32

    rng = np.random.default_rng(7)
    n, lmax = 64, 96
    lens = rng.integers(10, lmax, size=n)
    seqs = np.full((n, lmax), 22, dtype=np.int8)
    for i, l in enumerate(lens):
        seqs[i, :l] = rng.integers(0, 20, size=l)

    ref_idx = 3
    ref = seqs[ref_idx][:int(lens[ref_idx])]
    masks = build_bit_masks32(ref, len(ref))

    # host reference for the round
    masks64 = build_bit_masks(ref, len(ref))
    lcs = lcs_ref_vs_queries(masks64, seqs)
    indel = (int(lens[ref_idx]) + lens - 2 * lcs).astype(np.float64)
    with np.errstate(divide="ignore"):
        dist_new = np.where(lcs > 0, indel ** 0.75 / lcs,
                            np.finfo(np.float64).max)

    dist0 = rng.random(n) * 2
    tieb0 = rng.integers(0, 2**63, size=n).astype(np.uint64)
    active = np.ones(n, dtype=bool)
    active[ref_idx] = False

    gids = np.arange(n, dtype=np.uint64)
    lo = np.minimum(gids, np.uint64(ref_idx))
    hi = np.maximum(gids, np.uint64(ref_idx))
    packed = ~((lo << np.uint64(32)) + hi)
    upd = active & ((dist_new < dist0) | ((dist_new == dist0) & (packed < tieb0)))
    exp_d = np.where(upd, dist_new, dist0)
    exp_t = np.where(upd, packed, tieb0)
    masked = np.where(active, exp_d, np.inf)
    m = masked.min()
    cand = np.nonzero(masked == m)[0]
    exp_best = cand[np.argmin(exp_t[cand])]

    mesh = make_mesh(axis="rows")
    got_d, got_t, best_idx, best_d = prim_round_sharded(
        mesh, jnp.asarray(masks), jnp.asarray(seqs.astype(np.int32)),
        jnp.asarray(lens.astype(np.int64)), np.int64(lens[ref_idx]),
        np.int64(ref_idx), jnp.asarray(dist0), jnp.asarray(tieb0),
        jnp.asarray(active))

    np.testing.assert_allclose(np.asarray(got_d), exp_d)
    assert np.array_equal(np.asarray(got_t), exp_t)
    assert int(best_idx) == exp_best
    assert float(best_d) == m


def test_dp_row_sharded_matches_sequential():
    rng = np.random.default_rng(1)
    w = 512
    pD, pH, pV = (rng.integers(-10**9, 10**9, size=w) for _ in range(3))
    t, ghs, ghc, gvs, gvc, dlt, tvx = (
        rng.integers(-10**6, 10**6, size=w) for _ in range(7))

    # sequential reference (interior 3-dir recurrence)
    D = np.empty(w, dtype=np.int64)
    V = np.empty(w, dtype=np.int64)
    H = np.empty(w, dtype=np.int64)
    for j in range(w):
        pDl = pD[j - 1] if j else NEG_INF
        pHl = pH[j - 1] if j else NEG_INF
        pVl = pV[j - 1] if j else NEG_INF
        D[j] = max(pDl + t[j], pHl + t[j] + dlt[j], pVl + t[j] + tvx[j])
        V[j] = max(pD[j] + gvs[j], pH[j] + gvs[j], pV[j] + gvc[j])
    for j in range(w):
        Dl = D[j - 1] if j else NEG_INF
        Vl = V[j - 1] if j else NEG_INF
        m = max(Dl, Vl) + ghs[j]
        Hl = H[j - 1] if j else NEG_INF
        H[j] = max(m, Hl + ghc[j])

    mesh = make_mesh(axis="cols")
    gD, gH, gV = dp_row_sharded(
        mesh, *(jnp.asarray(a.astype(np.int64))
                for a in (pD, pH, pV, t, ghs, ghc, gvs, gvc, dlt, tvx)))

    assert np.array_equal(np.asarray(gD), D)
    assert np.array_equal(np.asarray(gV), V)
    assert np.array_equal(np.asarray(gH), H)
