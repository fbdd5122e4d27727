"""Pallas DP kernel (interpreter mode on CPU) vs NumPy reference DP.

Interpret-mode compile time scales with the statically-unrolled row count
(w1 bucket), so these tests shrink the minimum bucket to 32 and share one
batch shape per code path - each distinct (shape, mode) costs one ~15 s
XLA:CPU compile, reused across the file.
"""

import numpy as np
import pytest

from famsa_tpu.core.dp import dp_prof_prof, dp_seq_prof
from famsa_tpu.core.params import Params

from test_dp_jax_parity import _make_profile


@pytest.fixture(autouse=True)
def _small_buckets(monkeypatch):
    """Cap the pallas row bucket at 32/64 so interpret-mode graphs stay
    small (production floor is 128 for TPU lane alignment, irrelevant to
    the interpreter)."""
    from famsa_tpu.ops import dp_pallas
    from famsa_tpu.ops.dp_jax import _bucket

    monkeypatch.setattr(dp_pallas, "_pallas_bucket",
                        lambda w: 32 if w <= 32 else _bucket(w))
    yield


def _check_dirs(ref, got, w1r, w2r):
    assert ref.last == got.last
    assert np.array_equal(ref.dirs_D[:w1r + 1, :w2r + 1],
                          got.dirs_D[:w1r + 1, :w2r + 1])
    assert np.array_equal(ref.dirs_H[1:w1r + 1, 1:w2r + 1],
                          got.dirs_H[1:w1r + 1, 1:w2r + 1])
    assert np.array_equal(ref.dirs_V[1:w1r + 1, 1:w2r + 1],
                          got.dirs_V[1:w1r + 1, 1:w2r + 1])


def test_dp_pallas_sublane_batch():
    """SB=8 packing: 9 merges of mixed sizes and cardinalities (incl.
    single-sequence profile1 = the seq-prof recurrence, and a 1x1 merge),
    parity vs the NumPy reference DP."""
    from famsa_tpu.ops.dp_pallas import dp_profile_pallas_batched

    rng = np.random.default_rng(7)
    params = Params()
    params.adjust(50)

    pairs = []
    for k in range(8):
        n1 = 1 + (k % 4)
        # single-sequence profile1 = the seq-prof recurrence; like the
        # reference's leaf profiles it must be ungapped
        p1 = _make_profile(rng, params, n1, 25 + 4 * k,
                           gap_frac=0.0 if n1 == 1 else 0.2)
        p2 = _make_profile(rng, params, 2 + (k % 3), 60 - 4 * k)
        pairs.append((p1, p2))
    pairs.append((_make_profile(rng, params, 1, 25, gap_frac=0.0),
                  _make_profile(rng, params, 1, 25, gap_frac=0.0)))

    batched = dp_profile_pallas_batched(params, pairs, sb=8, interpret=True)
    for (p1, p2), got in zip(pairs, batched):
        if len(p1.data) == 1:
            ref = dp_seq_prof(params, p1, p2)
        else:
            ref = dp_prof_prof(params, p1, p2)
        _check_dirs(ref, got, p1.width, p2.width)


def test_dp_pallas_device_traceback():
    """Device traceback path/total vs host _trace_path on the same DP,
    through both upload encodings (compact CSC and dense counters) and
    both cost modes (single-word i32 and (hi,lo) pair)."""
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.ops.dp_jax import dp_profile_jax
    from famsa_tpu.ops.dp_pallas import dp_profile_pallas_paths

    rng = np.random.default_rng(11)
    params = Params()
    params.adjust(50)

    pairs = []
    for k in range(6):
        p1 = _make_profile(rng, params, 1 + (k % 3), 30 + 5 * k)
        p2 = _make_profile(rng, params, 2 + (k % 4), 60 - 6 * k)
        pairs.append((p1, p2))

    got_s = dp_profile_pallas_paths(params, pairs, sb=8, interpret=True,
                                    single=True)
    got_p = dp_profile_pallas_paths(params, pairs, sb=8, interpret=True,
                                    single=False)
    got_d = dp_profile_pallas_paths(params, pairs, sb=8, interpret=True,
                                    single=True, force_dense=True)
    for (p1, p2), gs, gpr, gd in zip(pairs, got_s, got_p, got_d):
        ref = dp_profile_jax(params, p1, p2)
        path, total = _trace_path(ref, p1.width, p2.width)
        for g in (gs, gpr, gd):
            assert g.total == total
            assert g.path == path


def test_dp_pallas_pair_big_magnitudes():
    """Pair-mode in-kernel cost computation at i64 magnitudes: a score
    matrix scaled by 2^22 pushes every cost term far beyond i32, so every
    (hi, lo) carry path of the in-kernel _k_pmul_u32/p_add chains is
    exercised.  Parity vs the NumPy reference DP (core/dp.py, exact
    int64)."""
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.ops.dp_pallas import (_single_word_ok,
                                         dp_profile_pallas_paths)

    rng = np.random.default_rng(23)
    params = Params()
    params.adjust(50)
    params.score_matrix = (params.score_matrix.astype(np.int64) << 22)
    params.gap_open <<= 22
    params.gap_ext <<= 22
    params.gap_term_open <<= 22
    params.gap_term_ext <<= 22

    pairs = []
    for k in range(3):
        p1 = _make_profile(rng, params, 2 + k, 26 + 10 * k)
        p2 = _make_profile(rng, params, 3 - (k % 2), 55 - 5 * k)
        pairs.append((p1, p2))

    assert not _single_word_ok(params, pairs)
    got = dp_profile_pallas_paths(params, pairs, sb=8, interpret=True)
    for (p1, p2), g in zip(pairs, got):
        ref = dp_prof_prof(params, p1, p2)
        path, total = _trace_path(ref, p1.width, p2.width)
        assert g.total == total
        assert g.path == path


@pytest.mark.slow
def test_dp_pallas_production_buckets():
    """Same parity at the production bucket floor (w1p = w2p = 128, the
    TPU shape): one merge through the full paths pipeline, no bucket
    monkeypatch (guards the real grid/blk geometry)."""
    import famsa_tpu.ops.dp_pallas as dpp
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.ops.dp_jax import _bucket, dp_profile_jax

    orig = dpp._pallas_bucket
    dpp._pallas_bucket = lambda w: max(128, _bucket(w))
    try:
        rng = np.random.default_rng(31)
        params = Params()
        params.adjust(50)
        pairs = [(_make_profile(rng, params, 3, 90),
                  _make_profile(rng, params, 4, 70))]
        got = dpp.dp_profile_pallas_paths(params, pairs, interpret=True)
        ref = dp_profile_jax(params, *pairs[0])
        path, total = _trace_path(ref, pairs[0][0].width, pairs[0][1].width)
        assert got[0].total == total
        assert got[0].path == path
    finally:
        dpp._pallas_bucket = orig
