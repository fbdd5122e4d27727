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


def test_dp_pallas_fast_representatives():
    """Cheap fast-suite representatives of the slow-gated kernel families
    (guided band, MXU match-score, pair-mode big magnitudes) so the
    bit-exactness invariant keeps fast-suite regression coverage: one
    minimal case per family, single shared bucket where possible."""
    from famsa_tpu.core.aligner import align_into
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.core.dp import find_row_ranges
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.ops import dp_pallas as dpp

    rng = np.random.default_rng(83)
    params = Params()
    params.adjust(50)

    # --- guided band (refinement split scenario, single mode) ---
    p1 = _make_profile(rng, params, 3, 28)
    p2 = _make_profile(rng, params, 2, 30)
    dest = Profile(params)
    align_into(dest, p1, p2, backend="numpy")
    a, b = Profile(params), Profile(params)
    for k, gs in enumerate(dest.data):
        (a if k % 2 else b).append_raw_sequence(gs)
    _, cm1 = a.condense()
    _, cm2 = b.condense()
    a.optimize_gaps()
    b.optimize_gaps()
    a.calculate_counters_scores()
    b.calculate_counters_scores()
    if len(a.data) == 1:
        ref = dp_seq_prof(params, a, b, list(cm1), list(cm2))
    else:
        ref = dp_prof_prof(params, a, b, list(cm1), list(cm2))
    path, total = _trace_path(ref, a.width, b.width)
    rr = find_row_ranges(list(cm1), list(cm2),
                         params.guided_alignment_radius)
    lo = np.fromiter((r[0] for r in rr), np.int32, len(rr))
    hi = np.fromiter((r[1] for r in rr), np.int32, len(rr))
    got = dpp.dp_profile_pallas_paths(params, [(a, b)], interpret=True,
                                      single=True, bands=[(lo, hi)])[0]
    assert got.total == total and got.path == path

    # --- MXU match-score limb path (forced config, small card) ---
    p1 = _make_profile(rng, params, 5, 28)
    p2 = _make_profile(rng, params, 4, 30)
    cfg = dpp._mxu_cfg([(p1, p2)])
    assert cfg is not None          # small cards/scores fit the limb budget
    orig = dpp._mxu_cfg
    dpp._mxu_cfg = lambda pairs: cfg    # pin: the kernel MXU path must run
    try:
        got = dpp.dp_profile_pallas_paths(params, [(p1, p2)],
                                          interpret=True, single=True)[0]
    finally:
        dpp._mxu_cfg = orig
    ref = dp_prof_prof(params, p1, p2)
    path, total = _trace_path(ref, p1.width, p2.width)
    assert got.total == total and got.path == path

    # --- pair-mode (hi,lo) carry chains at i64 magnitudes ---
    params2 = Params()
    params2.adjust(50)
    params2.score_matrix = (params2.score_matrix.astype(np.int64) << 22)
    params2.gap_open <<= 22
    params2.gap_ext <<= 22
    params2.gap_term_open <<= 22
    params2.gap_term_ext <<= 22
    p1 = _make_profile(rng, params2, 2, 28)
    p2 = _make_profile(rng, params2, 3, 30)
    assert not dpp._single_word_ok(params2, [(p1, p2)])
    got = dpp.dp_profile_pallas_paths(params2, [(p1, p2)], sb=8,
                                      interpret=True)[0]
    ref = dp_prof_prof(params2, p1, p2)
    path, total = _trace_path(ref, p1.width, p2.width)
    assert got.total == total and got.path == path


@pytest.mark.slow
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


def test_traceback_runs_matches_traceback_one():
    """Run-jumping traceback (_traceback_runs) vs the per-cell walk on
    randomized VALID direction matrices (fields 0..2 only, col 0 =
    COL0_PACK), including H-biased (chain-shaped) walks.  Lengths align
    on the common prefix: _traceback_one rounds up to 31-step tiles,
    _traceback_runs returns exactly nsteps."""
    import jax
    import jax.numpy as jnp

    from famsa_tpu.ops.dp_pallas import (COL0_PACK, _traceback_one,
                                         _traceback_runs)

    f_one = jax.jit(_traceback_one, static_argnames=("nsteps",))
    f_run = jax.jit(_traceback_runs, static_argnames=("nsteps",))
    rng = np.random.default_rng(91)
    w1p, w2pe = 40, 256
    nsteps = w1p + w2pe
    tested = 0
    for trial in range(60):
        w1 = int(rng.integers(1, w1p + 1))
        w2 = int(rng.integers(1, w2pe - 1))
        pH = 0.8 if trial % 2 else 0.34
        probs = [(1 - pH) / 2, pH, (1 - pH) / 2]
        fs = [rng.choice(3, size=(w1p, w2pe), p=probs) for _ in range(3)]
        dirs = (fs[0] | (fs[1] << 2) | (fs[2] << 4)).astype(np.int32)
        dirs[:, 0] = COL0_PACK
        dir0 = int(rng.integers(0, 3))
        dd = jnp.asarray(dirs)
        a = np.asarray(f_one(dd, jnp.int32(w1), jnp.int32(w2),
                             jnp.int32(dir0), nsteps=nsteps))
        if not (a == 3).any():
            continue                    # walk invalid for random dirs
        tested += 1
        b = np.asarray(f_run(dd, jnp.int32(w1), jnp.int32(w2),
                             jnp.int32(dir0), nsteps=nsteps))
        L = min(len(a), len(b))
        assert np.array_equal(a[:L], b[:L]), (trial, w1, w2, dir0)
        assert (a[L:] == 3).all() and (b[L:] == 3).all()
    assert tested > 20


def test_merged_counters_device_matches_construct():
    """Device-side merged-profile counters (merged_counters_device) vs the
    host construct_profile on random merges - exact equality, including
    the open->ext transfer corrections and gap-run category counts."""
    import jax.numpy as jnp

    from famsa_tpu.core.aligner import construct_profile
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.core.dp import dp_prof_prof
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.ops.dp_pallas import merged_counters_device

    rng = np.random.default_rng(41)
    params = Params()
    params.adjust(50)
    for trial in range(8):
        n1, n2 = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        p1 = _make_profile(rng, params, n1, int(rng.integers(20, 70)))
        p2 = _make_profile(rng, params, n2, int(rng.integers(20, 70)))
        c1, c2 = p1.counters.copy(), p2.counters.copy()
        W1, W2 = p1.width, p2.width
        res = dp_prof_prof(params, p1, p2)
        path, _ = _trace_path(res, W1, W2)
        dest = Profile(params)
        construct_profile(dest, p1, p2, res)
        emits = np.full(len(path) + 7, 3, dtype=np.int32)
        emits[:len(path)] = path
        got = np.asarray(merged_counters_device(
            jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(emits),
            jnp.int32(W1), jnp.int32(W2), jnp.int32(n1), jnp.int32(n2)))
        exp = dest.counters
        assert np.array_equal(got[:exp.shape[0]], exp.astype(np.int32))
        assert not got[exp.shape[0]:].any()
        # blocked monotone-gather path (the chain/giant route) must be
        # bit-identical to the one-hot matmul path
        got_b = np.asarray(merged_counters_device(
            jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(emits),
            jnp.int32(W1), jnp.int32(W2), jnp.int32(n1), jnp.int32(n2),
            blocked=True))
        assert np.array_equal(got_b, got)


@pytest.mark.slow
def test_dp_pallas_device_resident_flow():
    """Two-level merge flow with device-resident counters: level-1 merges
    request merged counters (want_merged), level 2 consumes them via
    dev_pairs without re-uploading - results must match the all-host
    flow."""
    from famsa_tpu.core.aligner import construct_profile
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.ops.dp_pallas import dp_profile_pallas_paths_async

    rng = np.random.default_rng(47)
    params = Params()
    params.adjust(50)

    def level1():
        pairs = [(_make_profile(rng.__class__(np.random.PCG64(7 + k)),
                                params, 2, 30),
                  _make_profile(rng.__class__(np.random.PCG64(70 + k)),
                                params, 3, 40)) for k in range(2)]
        return pairs

    # host flow
    ph = []
    for p1, p2 in level1():
        res = dp_profile_pallas_paths_async(
            params, [(p1, p2)], interpret=True).resolve()[0]
        d = Profile(params)
        construct_profile(d, p1, p2, res)
        ph.append(d)
    res_h = dp_profile_pallas_paths_async(
        params, [(ph[0], ph[1])], interpret=True).resolve()[0]

    # device-resident flow
    pd = []
    devs = []
    for p1, p2 in level1():
        res = dp_profile_pallas_paths_async(
            params, [(p1, p2)], interpret=True,
            want_merged=True).resolve()[0]
        d = Profile(params)
        construct_profile(d, p1, p2, res)
        pd.append(d)
        devs.append(res.merged_dev)
        # device copy must equal the host-constructed counters
        assert np.array_equal(np.asarray(res.merged_dev),
                              d.counters.astype(np.int32))
    res_d = dp_profile_pallas_paths_async(
        params, [(pd[0], pd[1])], interpret=True,
        dev_pairs=[(devs[0], devs[1])]).resolve()[0]

    assert res_h.total == res_d.total
    assert res_h.path == res_d.path


@pytest.mark.slow
def test_dp_pallas_guided_band():
    """Guided (banded) DP on the Mosaic kernel vs the host banded DP
    (find_row_ranges masks, reference profile.cpp:1320-1365 +
    profile_seq.cpp:540-545): the refinement split scenario - align two
    profiles, split the result, condense to get column mappings, and
    re-align guided.  Covers prof-prof and seq-prof, single and pair
    cost modes, and a mixed batch (one banded + one full-range)."""
    from famsa_tpu.core.aligner import align_into
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.core.dp import find_row_ranges
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.ops.dp_pallas import dp_profile_pallas_paths

    rng = np.random.default_rng(53)
    params = Params()
    params.adjust(50)

    def split_case(n1, n2, w1, w2, pick):
        p1 = _make_profile(rng, params, n1, w1)
        p2 = _make_profile(rng, params, n2, w2)
        dest = Profile(params)
        align_into(dest, p1, p2, backend="numpy")
        a, b = Profile(params), Profile(params)
        for k, gs in enumerate(dest.data):
            (a if pick(k) else b).append_raw_sequence(gs)
        _, cm1 = a.condense()
        _, cm2 = b.condense()
        a.optimize_gaps()
        b.optimize_gaps()
        a.calculate_counters_scores()
        b.calculate_counters_scores()
        return a, b, list(cm1), list(cm2)

    cases = [
        split_case(3, 4, 40, 55, lambda k: k % 2 == 0),      # prof-prof
        split_case(2, 3, 50, 45, lambda k: k == 0),          # seq-prof
    ]

    for a, b, cm1, cm2 in cases:
        if len(a.data) == 1:
            ref = dp_seq_prof(params, a, b, list(cm1), list(cm2))
        else:
            ref = dp_prof_prof(params, a, b, list(cm1), list(cm2))
        path, total = _trace_path(ref, a.width, b.width)

        rr = find_row_ranges(list(cm1), list(cm2),
                             params.guided_alignment_radius)
        lo = np.fromiter((r[0] for r in rr), np.int32, len(rr))
        hi = np.fromiter((r[1] for r in rr), np.int32, len(rr))

        for single in (True, False):
            got = dp_profile_pallas_paths(
                params, [(a, b)], interpret=True, single=single,
                bands=[(lo, hi)])[0]
            assert got.total == total, (len(a.data), single)
            assert got.path == path, (len(a.data), single)

    # mixed batch: banded + full-range merge in one dispatch
    a, b, cm1, cm2 = cases[0]
    p3 = _make_profile(rng, params, 2, 40)
    p4 = _make_profile(rng, params, 3, 50)
    rr = find_row_ranges(list(cm1), list(cm2),
                         params.guided_alignment_radius)
    lo = np.fromiter((r[0] for r in rr), np.int32, len(rr))
    hi = np.fromiter((r[1] for r in rr), np.int32, len(rr))
    got = dp_profile_pallas_paths(
        params, [(a, b), (p3, p4)], interpret=True,
        bands=[(lo, hi), None])
    ref_g = dp_prof_prof(params, a, b, list(cm1), list(cm2))
    path_g, total_g = _trace_path(ref_g, a.width, b.width)
    ref_f = dp_prof_prof(params, p3, p4)
    path_f, total_f = _trace_path(ref_f, p3.width, p4.width)
    assert got[0].total == total_g and got[0].path == path_g
    assert got[1].total == total_f and got[1].path == path_f


@pytest.mark.slow
def test_dp_pallas_guided_band_stress():
    """Randomized stress parity for the banded kernel: the host DP keeps
    the reference's 2-row-buffer clearing discipline (stale out-of-band
    cells, profile_seq.cpp:623-633), the kernel masks the FULL band
    complement to -inf.  The reference's goldens are thread-count
    invariant even though its parallel engine rotates different buffer
    counts (= different staleness), so observable results cannot depend
    on out-of-band contents; this test pins that equivalence over many
    refinement-realistic splits.  One bucket shape -> one interpret-mode
    compile."""
    from famsa_tpu.core.aligner import align_into
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.core.dp import find_row_ranges
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.ops.dp_pallas import dp_profile_pallas_paths

    rng = np.random.default_rng(61)
    params = Params()
    params.adjust(50)

    cases = []
    for t in range(12):
        p1 = _make_profile(rng, params, 2 + (t % 4), 46 + (t % 3))
        p2 = _make_profile(rng, params, 2 + ((t + 1) % 3), 50 + (t % 4))
        dest = Profile(params)
        align_into(dest, p1, p2, backend="numpy")
        a, b = Profile(params), Profile(params)
        nd = len(dest.data)
        picks = rng.integers(0, 2, nd)
        if picks.all() or not picks.any():
            picks[0] = 1 - picks[0]
        for k, gs in enumerate(dest.data):
            (a if picks[k] else b).append_raw_sequence(gs)
        _, cm1 = a.condense()
        _, cm2 = b.condense()
        a.optimize_gaps()
        b.optimize_gaps()
        a.calculate_counters_scores()
        b.calculate_counters_scores()
        # small radius -> tight bands -> many band-edge cells; the host
        # reference below must band with the SAME radius
        radius = 2 + (t % 3)
        params.guided_alignment_radius = radius
        rr = find_row_ranges(list(cm1), list(cm2), radius)
        lo = np.fromiter((r[0] for r in rr), np.int32, len(rr))
        hi = np.fromiter((r[1] for r in rr), np.int32, len(rr))
        if len(a.data) == 1:
            ref = dp_seq_prof(params, a, b, list(cm1), list(cm2))
        else:
            ref = dp_prof_prof(params, a, b, list(cm1), list(cm2))
        cases.append((a, b, lo, hi, _trace_path(ref, a.width, b.width)))

    # radius must reach the host DP too: monkey-free via explicit ranges
    got = dp_profile_pallas_paths(
        params, [(a, b) for a, b, *_ in cases], interpret=True,
        bands=[(lo, hi) for _, _, lo, hi, _ in cases])
    for (a, b, lo, hi, (path, total)), g in zip(cases, got):
        assert g.total == total
        assert g.path == path


@pytest.mark.slow
def test_dp_pallas_mxu_limbs():
    """MXU match-score path (_mxu_tb limb matmuls) at two-limb counts
    (card >= 128); parity vs the host DP.  Scores this large sit outside
    the 3-limb win region, so _mxu_cfg declines them (the 4-limb combine
    epilogue measured slower than the in-kernel MAC) - the kernel path is
    exercised by forcing the config."""
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.ops.dp_jax import dp_profile_jax
    from famsa_tpu.ops import dp_pallas as dpp

    rng = np.random.default_rng(71)
    params = Params()
    params.adjust(200)

    p1 = _make_profile(rng, params, 150, 40)    # card 150 -> l1 = 2
    p2 = _make_profile(rng, params, 130, 50)
    assert dpp._mxu_cfg([(p1, p2)]) is None     # 4 score limbs: declined
    orig = dpp._mxu_cfg
    dpp._mxu_cfg = lambda pairs: (2, 4, 27)     # force the kernel path
    try:
        got = dpp.dp_profile_pallas_paths(params, [(p1, p2)],
                                          interpret=True, single=True)[0]
    finally:
        dpp._mxu_cfg = orig
    ref = dp_profile_jax(params, p1, p2)
    path, total = _trace_path(ref, p1.width, p2.width)
    assert got.total == total
    assert got.path == path


@pytest.mark.slow
def test_dp_pallas_mxu_guided():
    """Guided band + MXU match-score together (the refinement dispatch on
    hardware)."""
    from famsa_tpu.core.aligner import align_into
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.core.dp import find_row_ranges
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.ops.dp_pallas import dp_profile_pallas_paths

    rng = np.random.default_rng(73)
    params = Params()
    params.adjust(50)
    p1 = _make_profile(rng, params, 3, 40)
    p2 = _make_profile(rng, params, 4, 50)
    dest = Profile(params)
    align_into(dest, p1, p2, backend="numpy")
    a, b = Profile(params), Profile(params)
    for k, gs in enumerate(dest.data):
        (a if k % 2 else b).append_raw_sequence(gs)
    _, cm1 = a.condense()
    _, cm2 = b.condense()
    a.optimize_gaps()
    b.optimize_gaps()
    a.calculate_counters_scores()
    b.calculate_counters_scores()

    ref = dp_prof_prof(params, a, b, list(cm1), list(cm2))
    path, total = _trace_path(ref, a.width, b.width)
    rr = find_row_ranges(list(cm1), list(cm2),
                         params.guided_alignment_radius)
    lo = np.fromiter((r[0] for r in rr), np.int32, len(rr))
    hi = np.fromiter((r[1] for r in rr), np.int32, len(rr))
    got = dp_profile_pallas_paths(params, [(a, b)], interpret=True,
                                  single=True, bands=[(lo, hi)])[0]
    assert got.total == total
    assert got.path == path
