"""Staggered-fold giant-merge DP kernel (interpreter mode) vs NumPy
reference DP.  Fold width is shrunk to 32 lanes so merges cross several
fold boundaries (the production LW floor of 256 is a TPU lane-alignment
concern, irrelevant to the interpreter); one (lw, w1p) shape per case
set keeps interpret-mode compiles bounded."""

import numpy as np
import pytest

from famsa_tpu.core.dp import dp_prof_prof, dp_seq_prof
from famsa_tpu.core.params import Params

from test_dp_jax_parity import _make_profile


@pytest.fixture(autouse=True)
def _small_geometry(monkeypatch):
    from famsa_tpu.ops import dp_giant
    monkeypatch.setattr(dp_giant, "_LWS", (32, 64))
    monkeypatch.setattr(dp_giant, "_w1_bucket",
                        lambda w: max(64, -(-w // 8) * 8))
    yield


def _host_ref(params, p1, p2, cm1=None, cm2=None):
    from famsa_tpu.core.construct import _trace_path
    if len(p1.data) == 1:
        res = dp_seq_prof(params, p1, p2, cm1, cm2)
    else:
        res = dp_prof_prof(params, p1, p2, cm1, cm2)
    return _trace_path(res, p1.width, p2.width)


def _run_cases(cases):
    from famsa_tpu.ops.dp_giant import dp_profile_giant_paths

    rng = np.random.default_rng(7)
    params = Params()
    params.adjust(50)
    for n1, n2, w1, w2 in cases:
        p1 = _make_profile(rng, params, n1, w1,
                           gap_frac=0.0 if n1 == 1 else 0.2)
        p2 = _make_profile(rng, params, n2, w2)
        path, total = _host_ref(params, p1, p2)
        got = dp_profile_giant_paths(params, p1, p2, interpret=True)[0]
        assert got.total == total, (n1, n2, w1, w2)
        assert got.path == path, (n1, n2, w1, w2)


def test_giant_paths_cross_folds():
    """Path + total parity across fold boundaries (fast subset): a
    4-fold prof-prof merge and a seq-prof merge ending on the last fold
    boundary column."""
    _run_cases([(3, 4, 40, 100), (1, 5, 30, 127)])


@pytest.mark.slow
def test_giant_paths_cross_folds_full():
    """Full geometry matrix: fold-edge widths, single fold, seq-seq
    sized, row-bucket-edge w1."""
    _run_cases([(2, 2, 60, 64), (4, 3, 25, 31), (1, 1, 20, 90),
                (5, 2, 64, 96)])


@pytest.mark.slow
def test_giant_pair_big_magnitudes():
    """Scores scaled by 2^22 push every cost term beyond i32: the
    (hi, lo) carry chains and the cross-fold edge words (which carry
    full pairs) are exercised."""
    from famsa_tpu.ops.dp_giant import dp_profile_giant_paths

    rng = np.random.default_rng(23)
    params = Params()
    params.adjust(50)
    params.score_matrix = (params.score_matrix.astype(np.int64) << 22)
    params.gap_open <<= 22
    params.gap_ext <<= 22
    params.gap_term_open <<= 22
    params.gap_term_ext <<= 22

    p1 = _make_profile(rng, params, 3, 40)
    p2 = _make_profile(rng, params, 2, 110)
    path, total = _host_ref(params, p1, p2)
    got = dp_profile_giant_paths(params, p1, p2, interpret=True)[0]
    assert got.total == total
    assert got.path == path


@pytest.mark.slow
def test_giant_merged_counters_and_chain():
    """Device-resident flow: merge A requests merged counters; merge B
    consumes them via dev2 without an upload.  The device counters must
    equal the host-constructed profile's, and the chained dispatch must
    match the all-host path."""
    from famsa_tpu.core.aligner import construct_profile
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.ops.dp_giant import dp_profile_giant_paths_async

    rng = np.random.default_rng(41)
    params = Params()
    params.adjust(50)

    p1 = _make_profile(rng, params, 2, 35)
    p2 = _make_profile(rng, params, 3, 80)
    pa = _make_profile(rng, params, 1, 30, gap_frac=0.0)   # leaf side

    # host flow: identical profiles via the same seed stream (construct
    # consumes its inputs, so fresh copies are required)
    rng2 = np.random.default_rng(41)
    p1h = _make_profile(rng2, params, 2, 35)
    p2h = _make_profile(rng2, params, 3, 80)
    pah = _make_profile(rng2, params, 1, 30, gap_frac=0.0)

    res_a = dp_profile_giant_paths_async(
        params, p1, p2, want_merged=True, interpret=True).resolve()[0]
    dmerge = Profile(params)
    construct_profile(dmerge, p1, p2, res_a)
    md = res_a.merged_dev
    assert md is not None
    got_c = np.asarray(md)
    assert np.array_equal(got_c[:dmerge.width + 1],
                          dmerge.counters.astype(np.int32))

    res_ah = dp_profile_giant_paths_async(
        params, p1h, p2h, interpret=True).resolve()[0]
    hmerge = Profile(params)
    construct_profile(hmerge, p1h, p2h, res_ah)
    hmerge.calculate_counters_scores()

    path_h, total_h = _host_ref(params, pah, hmerge)

    dmerge.calculate_counters_scores()
    got_b = dp_profile_giant_paths_async(
        params, pa, dmerge, dev2=md, interpret=True).resolve()[0]
    assert got_b.total == total_h
    assert got_b.path == path_h


@pytest.mark.slow
def test_giant_guided_band():
    """Banded (refinement-style) giant dispatch vs the host banded DP:
    split an aligned profile, condense for column mappings, re-align
    guided by find_row_ranges."""
    from famsa_tpu.core.aligner import align_into
    from famsa_tpu.core.dp import find_row_ranges
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.ops.dp_giant import dp_profile_giant_paths

    rng = np.random.default_rng(53)
    params = Params()
    params.adjust(50)

    p1 = _make_profile(rng, params, 3, 40)
    p2 = _make_profile(rng, params, 4, 100)
    dest = Profile(params)
    align_into(dest, p1, p2, backend="numpy")
    a, b = Profile(params), Profile(params)
    for k, gs in enumerate(dest.data):
        (a if k % 2 == 0 else b).append_raw_sequence(gs)
    _, cm1 = a.condense()
    _, cm2 = b.condense()
    a.optimize_gaps()
    b.optimize_gaps()
    a.calculate_counters_scores()
    b.calculate_counters_scores()
    cm1, cm2 = list(cm1), list(cm2)
    path, total = _host_ref(params, a, b, cm1, cm2)
    rr = find_row_ranges(cm1, cm2, params.guided_alignment_radius)
    lo = np.fromiter((r[0] for r in rr), np.int32, len(rr))
    hi = np.fromiter((r[1] for r in rr), np.int32, len(rr))
    got = dp_profile_giant_paths(params, a, b, bands=(lo, hi),
                                 interpret=True)[0]
    assert got.total == total
    assert got.path == path


@pytest.mark.slow
def test_pipeline_giant_dispatch(monkeypatch):
    """End-to-end pipeline with the giant dispatch route forced (tiny
    cell thresholds): small-group device merges ride the staggered-fold
    kernel, chained via device-resident merged counters; output must
    match the host backend byte for byte."""
    import famsa_tpu.core.aligner as aligner
    from famsa_tpu.core.params import Params
    from famsa_tpu.core.sequence import Sequence
    from famsa_tpu.ops import dp_giant
    from famsa_tpu.pipeline import compute_msa

    monkeypatch.setenv("FAMSA_TPU_DP_PALLAS", "interpret")
    monkeypatch.setenv("FAMSA_TPU_SHARD", "0")
    monkeypatch.setenv("FAMSA_TPU_GIANT_MIN_CELLS", "500")
    monkeypatch.setattr(aligner, "_JAX_MIN_CELLS", 500)
    # ONE kernel shape for the whole run (a per-width row bucket would
    # pay one interpret-mode compile per merge shape)
    monkeypatch.setattr(dp_giant, "_LWS", (32,))
    monkeypatch.setattr(dp_giant, "_w1_bucket", lambda w: 128)

    aa = "ARNDCQEGHILKMFPSTWYV"

    def make_seqs():
        rng = np.random.default_rng(91)
        return [Sequence(f">s{k}",
                         "".join(aa[rng.integers(0, 20)]
                                 for _ in range(int(rng.integers(25, 45)))),
                         k)
                for k in range(10)]

    def run(backend):
        params = Params()
        params.backend = backend
        res = compute_msa(params, make_seqs())
        return [gs.decode() for gs in res.alignment]

    host = run("numpy")
    giant = run("jax")
    assert giant == host
