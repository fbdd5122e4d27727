"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# 8-device CPU-mesh suites take tens of minutes on a 2-core host; the driver's dryrun_multichip covers the sharded routes end to end every round
pytestmark = pytest.mark.slow
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


def test_dp_profile_sharded_matches_host():
    """Full cross-chip merge (parallel/dp_sharded.py) vs the NumPy
    reference DP: packed directions and final D/H/V, byte-identical."""
    import sys
    sys.path.insert(0, "tests")
    from test_dp_jax_parity import _make_profile

    from famsa_tpu.core.dp import dp_prof_prof
    from famsa_tpu.core.params import Params
    from famsa_tpu.parallel.dp_sharded import dp_profile_sharded

    rng = np.random.default_rng(5)
    params = Params()
    params.adjust(50)
    mesh = make_mesh(axis="cols")

    for n1, n2, w1, w2 in [(3, 4, 45, 70), (2, 2, 30, 30)]:
        p1 = _make_profile(rng, params, n1, w1)
        p2 = _make_profile(rng, params, n2, w2)
        ref = dp_prof_prof(params, p1, p2)
        got = dp_profile_sharded(params, p1, p2, mesh)
        w1r, w2r = p1.width, p2.width
        assert ref.last == got.last
        assert np.array_equal(ref.dirs_D[:w1r + 1, :w2r + 1],
                              got.dirs_D[:w1r + 1, :w2r + 1])
        assert np.array_equal(ref.dirs_H[1:w1r + 1, 1:w2r + 1],
                              got.dirs_H[1:w1r + 1, 1:w2r + 1])
        assert np.array_equal(ref.dirs_V[1:w1r + 1, 1:w2r + 1],
                              got.dirs_V[1:w1r + 1, 1:w2r + 1])


def _random_sequences(rng, n, lmax):
    from famsa_tpu.core.sequence import Sequence
    aa = "ARNDCQEGHILKMFPSTWYV"
    seqs = []
    for k in range(n):
        l = int(rng.integers(lmax // 2, lmax))
        s = "".join(aa[rng.integers(0, 20)] for _ in range(l))
        seqs.append(Sequence(f">s{k}", s, k))
    return seqs


def test_mst_prim_tree_sharded_matches_host():
    from famsa_tpu.ops.distance import get_distance_backend
    from famsa_tpu.core.params import DIST_INDEL075_DIV_LCS
    from famsa_tpu.parallel.dist_sharded import mst_prim_tree_sharded
    from famsa_tpu.tree.mst_prim import mst_prim_tree

    rng = np.random.default_rng(11)
    n = 41                               # not a multiple of the mesh size
    seqs = _random_sequences(rng, n, 120)
    lmax = max(s.length for s in seqs)
    for s in seqs:
        s.resize(lmax)

    be = get_distance_backend(seqs, DIST_INDEL075_DIV_LCS, np.float64,
                              backend="numpy")
    tree_host = [(-1, -1)] * n
    mst_prim_tree(n, lambda ref, ids: be.row(ref, ids), tree_host)

    tree_sharded = [(-1, -1)] * n
    mst_prim_tree_sharded(seqs, tree_sharded, make_mesh(axis="rows"))
    assert tree_host == tree_sharded


def test_sharded_distance_backend_matches_host():
    from famsa_tpu.core.params import DIST_INDEL075_DIV_LCS, DIST_PID
    from famsa_tpu.ops.distance import DistanceBackend
    from famsa_tpu.parallel.dist_sharded import ShardedDistanceBackend

    rng = np.random.default_rng(13)
    seqs = _random_sequences(rng, 27, 90)
    lmax = max(s.length for s in seqs)
    for s in seqs:
        s.resize(lmax)

    mesh = make_mesh(axis="rows")
    for measure, dtype in [(DIST_INDEL075_DIV_LCS, np.float64),
                           (DIST_PID, np.float32)]:
        host = DistanceBackend(seqs, measure, dtype)
        shrd = ShardedDistanceBackend(seqs, measure, dtype, mesh, block=4)
        for i in (1, 5, 11, 26):
            assert np.array_equal(host.row_prefix(i, i), shrd.row_prefix(i, i))
        assert np.array_equal(host.row(3), shrd.row(3))


def test_end_to_end_sharded_alignment(monkeypatch):
    """A small family aligned with backend='jax' on the 8-device CPU mesh
    (sharded Prim tree + sharded distance rows + cross-chip DP merges
    forced via a tiny cell threshold) must be byte-identical to the pure
    host path."""
    import famsa_tpu.core.aligner as aligner
    from famsa_tpu.core.params import Params
    from famsa_tpu.pipeline import compute_msa

    monkeypatch.setattr(aligner, "_JAX_MIN_CELLS", 1000)
    monkeypatch.setattr(aligner, "_SHARD_DP_CELLS", 5000)

    rng = np.random.default_rng(17)

    def run(backend):
        seqs = _random_sequences(rng.__class__(np.random.PCG64(99)), 24, 100)
        params = Params()
        params.backend = backend
        res = compute_msa(params, seqs)
        return [gs.decode() for gs in res.alignment]

    host = run("numpy")
    sharded = run("jax")
    assert host == sharded


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


def test_dp_profile_sharded_paths_matches_host():
    """Device-traceback variant (dp_profile_sharded_paths): path + total
    must equal the host walk of the dirs-returning variant - the O(W^2)
    dirs matrix never leaves the device."""
    import sys
    sys.path.insert(0, "tests")
    from test_dp_jax_parity import _make_profile

    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.core.dp import dp_prof_prof
    from famsa_tpu.core.params import Params
    from famsa_tpu.parallel.dp_sharded import dp_profile_sharded_paths

    rng = np.random.default_rng(9)
    params = Params()
    params.adjust(50)
    mesh = make_mesh(axis="cols")

    # widths > 32 buckets so the tiled device traceback engages
    for n1, n2, w1, w2 in [(3, 4, 60, 90), (2, 3, 100, 40)]:
        p1 = _make_profile(rng, params, n1, w1)
        p2 = _make_profile(rng, params, n2, w2)
        ref = dp_prof_prof(params, p1, p2)
        path, total = _trace_path(ref, p1.width, p2.width)
        got = dp_profile_sharded_paths(params, p1, p2, mesh)
        assert got.total == total
        assert got.path == path


def test_dp_profile_sharded_paths_guided_matches_host():
    """Sharded DP with the guided band mask (refinement split scenario):
    path/total vs the host banded DP - the re-alignment corridor
    (find_row_ranges) must survive the column sharding."""
    import sys
    sys.path.insert(0, "tests")
    from test_dp_jax_parity import _make_profile

    from famsa_tpu.core.aligner import align_into
    from famsa_tpu.core.construct import _trace_path
    from famsa_tpu.core.dp import dp_prof_prof, dp_seq_prof, find_row_ranges
    from famsa_tpu.core.params import Params
    from famsa_tpu.core.profile import Profile
    from famsa_tpu.parallel.dp_sharded import dp_profile_sharded_paths

    rng = np.random.default_rng(13)
    params = Params()
    params.adjust(50)
    mesh = make_mesh(axis="cols")

    p1 = _make_profile(rng, params, 3, 60)
    p2 = _make_profile(rng, params, 4, 80)
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
    got = dp_profile_sharded_paths(params, a, b, mesh, bands=(lo, hi))
    assert got.total == total
    assert got.path == path
