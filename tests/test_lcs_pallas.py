"""Parity: Pallas LCS kernel (interpret mode) vs the scalar NumPy
reference (ops/lcs.py), which is itself golden-tested against the
reference FAMSA outputs."""

import numpy as np
import pytest

from famsa_tpu.ops.lcs import build_bit_masks, lcs_ref_vs_queries


def _random_seqs(rng, n, lmin, lmax):
    lens = rng.integers(lmin, lmax + 1, size=n)
    lmaxp = int(lens.max())
    padded = np.full((n, lmaxp), 22, dtype=np.int8)
    for i, l in enumerate(lens):
        padded[i, :l] = rng.integers(0, 24, size=l)   # incl. B/Z/X/* codes
    return padded, lens


@pytest.mark.parametrize("n,lmin,lmax", [(37, 5, 70), (130, 40, 300)])
def test_lcs_pallas_parity(n, lmin, lmax):
    from famsa_tpu.ops.lcs_pallas import _pick_ql, lcs_rows, pack_query_table

    rng = np.random.default_rng(7)
    padded, lens = _random_seqs(rng, n, lmin, lmax)

    w = (padded.shape[1] + 31) // 32
    ql = _pick_ql(w)
    tab, w2, nb = pack_query_table(padded, ql)
    assert w2 == w

    ref_ids = np.array([0, 1, n // 2, n - 1])
    syms = padded[ref_ids].astype(np.int32)
    import jax.numpy as jnp
    got = lcs_rows(jnp.asarray(tab), syms, w, ql, n, interpret=True)

    for k, r in enumerate(ref_ids):
        masks = build_bit_masks(padded[r][:int(lens[r])], int(lens[r]))
        want = lcs_ref_vs_queries(masks, padded)
        np.testing.assert_array_equal(got[k], want, err_msg=f"ref {r}")


def test_pallas_backend_rows_match_numpy_backend():
    from famsa_tpu.core.params import DIST_INDEL075_DIV_LCS
    from famsa_tpu.ops.distance import DistanceBackend
    from famsa_tpu.ops.lcs_pallas import PallasDistanceBackend

    class Seq:
        def __init__(self, data, length):
            self.data = data
            self.length = length
            self.data_size = len(data)

    rng = np.random.default_rng(3)
    seqs = []
    for _ in range(50):
        l = int(rng.integers(10, 120))
        seqs.append(Seq(rng.integers(0, 24, size=l).astype(np.int8), l))

    ref = DistanceBackend(seqs, DIST_INDEL075_DIV_LCS, np.float64)
    dev = PallasDistanceBackend(seqs, DIST_INDEL075_DIV_LCS, np.float64,
                                block_rows=7)
    dev._interpret = True

    # monkeypatch interpret mode through lcs_rows
    import famsa_tpu.ops.lcs_pallas as lp
    orig = lp.lcs_rows
    lp.lcs_rows = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        for i in (0, 3, 11, 49):
            np.testing.assert_array_equal(dev.row(i), ref.row(i))
            np.testing.assert_array_equal(dev.row_prefix(i, i),
                                          ref.row_prefix(i, i))
    finally:
        lp.lcs_rows = orig


def test_pallas_backend_row_nonprefix_query_ids():
    """row(ref, query_ids) where max(query_ids) reaches BEYOND the
    sequential prefetch window (ref_idx + block_rows): the dynamic grid
    must still compute those query blocks (regression: the sequential
    branch truncated ncq to ref_idx + block_rows, returning uninitialized
    columns - Prim with a non-default measure queries ALL remaining ids
    from node 0)."""
    from famsa_tpu.core.params import DIST_INDEL075_DIV_LCS
    from famsa_tpu.ops.distance import DistanceBackend
    import famsa_tpu.ops.lcs_pallas as lp

    class Seq:
        def __init__(self, data, length):
            self.data = data
            self.length = length
            self.data_size = len(data)

    rng = np.random.default_rng(11)
    seqs = []
    for _ in range(64):
        l = int(rng.integers(10, 90))
        seqs.append(Seq(rng.integers(0, 24, size=l).astype(np.int8), l))

    ref = DistanceBackend(seqs, DIST_INDEL075_DIV_LCS, np.float64)
    orig_rows, orig_ql = lp.lcs_rows, lp._pick_ql
    lp.lcs_rows = lambda *a, **k: orig_rows(*a, **{**k, "interpret": True})
    lp._pick_ql = lambda w: 2           # 16 queries/block -> nb = 4
    try:
        dev = lp.PallasDistanceBackend(seqs, DIST_INDEL075_DIV_LCS,
                                       np.float64, block_rows=4)
        assert dev.nb == 4
        # Prim-style: from row 0, query everything else (need=64 > 0+4)
        qids = np.arange(1, 64)
        np.testing.assert_array_equal(dev.row(0, qids), ref.row(0, qids))
        # sequential follow-up rows must reuse the widened cache
        qids2 = np.array([5, 20, 40, 63])
        np.testing.assert_array_equal(dev.row(1, qids2), ref.row(1, qids2))
        # and a fresh backend with a sparse far query set
        dev2 = lp.PallasDistanceBackend(seqs, DIST_INDEL075_DIV_LCS,
                                        np.float64, block_rows=4)
        qids3 = np.array([2, 50])
        np.testing.assert_array_equal(dev2.row(3, qids3), ref.row(3, qids3))
    finally:
        lp.lcs_rows = orig_rows
        lp._pick_ql = orig_ql


def test_pallas_backend_rows_batch_matches_numpy_backend():
    """rows_batch (FastTree seeds/assignment/CLARANS path) vs single rows."""
    from famsa_tpu.core.params import DIST_INDEL075_DIV_LCS
    from famsa_tpu.ops.distance import DistanceBackend
    from famsa_tpu.ops.lcs_pallas import PallasDistanceBackend

    class Seq:
        def __init__(self, data, length):
            self.data = data
            self.length = length
            self.data_size = len(data)

    rng = np.random.default_rng(5)
    seqs = []
    for _ in range(40):
        l = int(rng.integers(10, 100))
        seqs.append(Seq(rng.integers(0, 24, size=l).astype(np.int8), l))

    ref = DistanceBackend(seqs, DIST_INDEL075_DIV_LCS, np.float32)
    dev = PallasDistanceBackend(seqs, DIST_INDEL075_DIV_LCS, np.float32,
                                block_rows=7)
    import famsa_tpu.ops.lcs_pallas as lp
    orig = lp.lcs_rows
    lp.lcs_rows = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        ids = np.array([3, 0, 17, 8, 33, 39, 21, 5, 4])
        np.testing.assert_array_equal(dev.rows_batch(ids),
                                      ref.rows_batch(ids))
        qids = np.array([1, 2, 30, 7])
        np.testing.assert_array_equal(dev.rows_batch(ids, qids),
                                      ref.rows_batch(ids, qids))
    finally:
        lp.lcs_rows = orig
