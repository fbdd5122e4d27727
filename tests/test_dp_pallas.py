"""Pallas DP kernel (interpreter mode on CPU) vs NumPy reference DP."""

import numpy as np
import pytest

from famsa_tpu.core.dp import dp_prof_prof, dp_seq_prof
from famsa_tpu.core.params import Params

from test_dp_jax_parity import _make_profile


@pytest.mark.parametrize("n1,n2,w1,w2", [
    (3, 4, 40, 55), (1, 5, 30, 70), (8, 2, 90, 33), (1, 1, 25, 25),
])
def test_dp_pallas_matches_numpy(n1, n2, w1, w2):
    from famsa_tpu.ops.dp_pallas import dp_profile_pallas_batched

    rng = np.random.default_rng(n1 * 100 + n2)
    params = Params()
    params.adjust(50)

    p1 = _make_profile(rng, params, n1, w1)
    p2 = _make_profile(rng, params, n2, w2)

    if n1 == 1:
        ref = dp_seq_prof(params, p1, p2)
    else:
        ref = dp_prof_prof(params, p1, p2)
    got = dp_profile_pallas_batched(params, [(p1, p2)], interpret=True)[0]

    assert ref.last == got.last
    w1r, w2r = p1.width, p2.width
    assert np.array_equal(ref.dirs_D[:w1r + 1, :w2r + 1],
                          got.dirs_D[:w1r + 1, :w2r + 1])
    assert np.array_equal(ref.dirs_H[1:w1r + 1, 1:w2r + 1],
                          got.dirs_H[1:w1r + 1, 1:w2r + 1])
    assert np.array_equal(ref.dirs_V[1:w1r + 1, 1:w2r + 1],
                          got.dirs_V[1:w1r + 1, 1:w2r + 1])


def test_dp_pallas_sublane_batch():
    """SB=8 packing: 9 merges of mixed sizes, parity vs singles."""
    from famsa_tpu.ops.dp_pallas import dp_profile_pallas_batched

    rng = np.random.default_rng(7)
    params = Params()
    params.adjust(50)

    pairs = []
    for k in range(9):
        p1 = _make_profile(rng, params, 1 + (k % 4), 25 + 9 * k)
        p2 = _make_profile(rng, params, 2 + (k % 3), 60 - 4 * k)
        pairs.append((p1, p2))

    from famsa_tpu.ops.dp_jax import dp_profile_jax

    batched = dp_profile_pallas_batched(params, pairs, sb=8, interpret=True)
    for (p1, p2), got in zip(pairs, batched):
        ref = dp_profile_jax(params, p1, p2)
        w1r, w2r = p1.width, p2.width
        assert ref.last == got.last
        assert np.array_equal(ref.dirs_D[:w1r + 1, :w2r + 1],
                              got.dirs_D[:w1r + 1, :w2r + 1])
        assert np.array_equal(ref.dirs_H[1:w1r + 1, 1:w2r + 1],
                              got.dirs_H[1:w1r + 1, 1:w2r + 1])
        assert np.array_equal(ref.dirs_V[1:w1r + 1, 1:w2r + 1],
                              got.dirs_V[1:w1r + 1, 1:w2r + 1])


def test_dp_pallas_device_traceback():
    """Device traceback path/total vs host _trace_path on the same DP."""
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.ops.dp_jax import dp_profile_jax
    from famsa_tpu.ops.dp_pallas import dp_profile_pallas_paths

    rng = np.random.default_rng(11)
    params = Params()
    params.adjust(50)

    pairs = []
    for k in range(6):
        p1 = _make_profile(rng, params, 1 + (k % 3), 30 + 11 * k)
        p2 = _make_profile(rng, params, 2 + (k % 4), 75 - 6 * k)
        pairs.append((p1, p2))

    # both upload encodings (compact CSC and dense counters) must agree
    got = dp_profile_pallas_paths(params, pairs, sb=8, interpret=True)
    got_dense = dp_profile_pallas_paths(params, pairs, sb=8, interpret=True,
                                        force_dense=True)
    for (p1, p2), g, gd in zip(pairs, got, got_dense):
        ref = dp_profile_jax(params, p1, p2)
        path, total = _trace_path(ref, p1.width, p2.width)
        assert g.total == total
        assert g.path == path
        assert gd.total == total
        assert gd.path == path


def test_build_mats_pairs_parity():
    """_build_mats_pairs (i32-pair stage 1) vs _build_mats (i64 reference)
    on synthetic inputs with large magnitudes that exercise every carry
    path (counts up to 2^20, scores up to ~2^45)."""
    import jax.numpy as jnp

    from famsa_tpu.ops import dp_pallas as dpp

    rng = np.random.default_rng(123)
    g, sb, w1p, w2p = 2, 3, 16, 24
    w2pe = w2p + dpp.LANE_PAD

    def cnt(*shape):
        return rng.integers(0, 2 ** 20, size=shape).astype(np.int64)

    def sc(*shape):
        return rng.integers(-2 ** 45, 2 ** 45, size=shape).astype(np.int64)

    colp = dict(
        s2=sc(g, sb, w2pe, 30),
        p2gaps=sc(g, sb, w2pe, 4),
        gaps2_change=sc(g, sb, w2pe),
        h0=sc(g, sb, w2pe),
        last_col_mask=(rng.integers(0, 2, size=(g, sb, w2pe))).astype(np.int64),
        g2so=cnt(g, sb, w2pe), g2se=cnt(g, sb, w2pe),
        g2sto=cnt(g, sb, w2pe), g2ste=cnt(g, sb, w2pe),
        g2ce=cnt(g, sb, w2pe), g2cte=cnt(g, sb, w2pe),
    )
    xs = dict(
        c1=rng.integers(0, 2 ** 16, size=(g, sb, w1p, 30)).astype(np.int64),
        col1nng=cnt(g, sb, w1p),
        n1c=cnt(g, sb, w1p), n1tc=cnt(g, sb, w1p),
        s1go=sc(g, sb, w1p), s1ge=sc(g, sb, w1p),
        s1gto=sc(g, sb, w1p), s1gte=sc(g, sb, w1p),
        g1so=cnt(g, sb, w1p), g1se=cnt(g, sb, w1p),
        g1sto=cnt(g, sb, w1p), g1ste=cnt(g, sb, w1p),
        g1ce=cnt(g, sb, w1p), g1cte=cnt(g, sb, w1p),
        v0_cost=sc(g, sb, w1p),
        w1m1=rng.integers(1, w1p, size=(g, sb)).astype(np.int64),
    )
    colj = {k: jnp.asarray(v) for k, v in colp.items()}
    xsj = {k: jnp.asarray(v) for k, v in xs.items()}

    ref = dpp._build_mats(colj, xsj, w1p, w2p)
    got = dpp._build_mats_pairs(colj, xsj, w1p, w2p)

    for a, b, name in [(ref[0], got[0], "w1m1"), (ref[1], got[1], "h0hi"),
                       (ref[2], got[2], "h0lo"), (ref[3], got[3], "lastm")]:
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    for k, (a, b) in enumerate(zip(ref[4], got[4])):
        assert np.array_equal(np.asarray(a), np.asarray(b)), f"mat {k}"


def test_dp_pallas_single_word_parity():
    """Forced single-word i32 stage 1 vs forced pair stage 1 vs host
    traceback reference - all three must agree exactly."""
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.ops.dp_jax import dp_profile_jax
    from famsa_tpu.ops.dp_pallas import dp_profile_pallas_paths

    rng = np.random.default_rng(17)
    params = Params()
    params.adjust(50)

    pairs = []
    for k in range(5):
        p1 = _make_profile(rng, params, 2 + (k % 3), 28 + 13 * k)
        p2 = _make_profile(rng, params, 1 + (k % 4), 70 - 7 * k)
        pairs.append((p1, p2))

    got_s = dp_profile_pallas_paths(params, pairs, sb=8, interpret=True,
                                    single=True)
    got_p = dp_profile_pallas_paths(params, pairs, sb=8, interpret=True,
                                    single=False)
    for (p1, p2), gs, gpr in zip(pairs, got_s, got_p):
        ref = dp_profile_jax(params, p1, p2)
        path, total = _trace_path(ref, p1.width, p2.width)
        assert gs.total == total and gpr.total == total
        assert gs.path == path and gpr.path == path
