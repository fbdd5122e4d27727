"""Device (jax) whole-tree Prim vs host reference Prim."""

import numpy as np
import pytest

# whole-tree device-Prim interpret programs compile for minutes on XLA:CPU
pytestmark = pytest.mark.slow
from famsa_tpu.core.sequence import Sequence


def _random_sequences(rng, n, lmax):
    seqs = []
    aa = "ARNDCQEGHILKMFPSTWYV"
    for i in range(n):
        l = int(rng.integers(10, lmax))
        s = "".join(aa[k] for k in rng.integers(0, 20, size=l))
        seqs.append(Sequence(f">s{i}", s, i))
    ml = max(s.length for s in seqs)
    for s in seqs:
        s.resize(ml)
    return seqs


def test_prim_device_matches_host():
    from famsa_tpu.ops.distance import DistanceBackend
    from famsa_tpu.ops.prim_device import mst_prim_tree_device
    from famsa_tpu.tree.mst_prim import mst_prim_tree
    from famsa_tpu.core.params import DIST_INDEL075_DIV_LCS

    rng = np.random.default_rng(3)
    seqs = _random_sequences(rng, 60, 120)

    be = DistanceBackend(seqs, DIST_INDEL075_DIV_LCS, np.float64)
    tree_host = []
    mst_prim_tree(len(seqs), lambda r, ids: be.row(r, ids), tree_host)

    tree_dev = []
    mst_prim_tree_device(seqs, tree_dev)

    assert tree_host == tree_dev


def test_prim_prefilter_identical_tree():
    """The theoretical-best prefilter (reference MSTPrim.cpp:450-467) must
    skip LCS work on heterogeneous-length families while producing the
    byte-identical tree."""
    from famsa_tpu.core.params import DIST_INDEL075_DIV_LCS
    from famsa_tpu.ops.distance import DistanceBackend
    from famsa_tpu.tree.mst_prim import mst_prim_tree

    rng = np.random.default_rng(17)
    seqs = _random_sequences(rng, 120, 300)   # lengths 10..300

    be = DistanceBackend(seqs, DIST_INDEL075_DIV_LCS, np.float64)
    calls = {"pairs": 0}

    def counting_row(ref, ids):
        calls["pairs"] += len(ids)
        return be.row(ref, ids)

    tree_plain = []
    mst_prim_tree(len(seqs), counting_row, tree_plain)
    pairs_plain = calls["pairs"]

    calls["pairs"] = 0
    tree_filt = []
    mst_prim_tree(len(seqs), counting_row, tree_filt,
                  lengths=[s.length for s in seqs],
                  measure=DIST_INDEL075_DIV_LCS)
    assert tree_filt == tree_plain
    assert calls["pairs"] < pairs_plain   # LCS work actually skipped
