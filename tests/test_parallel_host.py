"""Host-side parallel paths: pack-parallel writer, threaded FastTree.

The writer must produce byte-identical plain output regardless of pack
boundaries/thread count (reference io_service.cpp:122-254 is likewise
output-invariant), and valid (multi-member) gzip.  FastTree's concurrent
depth-0 subtree builds must yield the exact sequential tree."""

import gzip

import numpy as np
import pytest

from famsa_tpu.core import io_service
from famsa_tpu.core.sequence import encode_gapped


def _mk_gapped(n=700, width=97, seed=0):
    rng = np.random.default_rng(seed)
    aa = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    out = []
    for k in range(n):
        gap = rng.random(width) < 0.3
        row = np.where(gap, np.uint8(ord("-")), aa[rng.integers(0, 20, width)])
        if gap.all():
            row[0] = ord("A")
        out.append(encode_gapped(f">s{k}", row.tobytes().decode(), k))
    return out


def test_writer_pack_invariance(tmp_path, monkeypatch):
    gs = _mk_gapped()
    a, b = tmp_path / "a.fasta", tmp_path / "b.fasta"
    io_service.save_alignment(str(a), gs)
    monkeypatch.setattr(io_service, "WRITER_PACK", 7)
    io_service.save_alignment(str(b), gs)
    assert a.read_bytes() == b.read_bytes()
    # sanity: record count survives the pack split
    assert a.read_bytes().count(b">") == len(gs)


def test_writer_gzip_multimember(tmp_path):
    gs = _mk_gapped(n=600)
    plain, gz = tmp_path / "p.fasta", tmp_path / "p.fasta.gz"
    io_service.save_alignment(str(plain), gs)
    io_service.save_alignment(str(gz), gs, gzip_level=6)
    assert gzip.decompress(gz.read_bytes()) == plain.read_bytes()


@pytest.mark.parametrize("method", ["parttree", "medoidtree"])
def test_fast_tree_thread_invariance(method):
    from famsa_tpu.core.params import Params
    from famsa_tpu.core.sequence import Sequence
    from famsa_tpu.pipeline import build_guide_tree
    from famsa_tpu.tree.guide_tree import GuideTree
    from famsa_tpu.tree import fast_tree

    rng = np.random.default_rng(3)
    aa = "ARNDCQEGHILKMFPSTWYV"
    seqs = []
    for k in range(400):
        ln = int(rng.integers(40, 90))
        seqs.append(Sequence(
            f">s{k}", "".join(aa[rng.integers(0, 20)] for _ in range(ln)), k))
    lmax = max(s.data_size for s in seqs)
    for s in seqs:
        s.resize(lmax)

    def build(n_threads):
        params = Params()
        params.backend = "numpy"
        params.gt_heuristic = ("medoidtree" if method == "medoidtree"
                               else "parttree")
        params.medoid.threshold = 50
        params.medoid.subtree_size = 20
        params.medoid.sample_size = 100
        orig = fast_tree.FastTree.__init__

        def patched(self, *a, **kw):
            kw["n_threads"] = n_threads
            orig(self, *a, **kw)

        fast_tree.FastTree.__init__ = patched
        try:
            tree = GuideTree()
            build_guide_tree(params, seqs, tree)
        finally:
            fast_tree.FastTree.__init__ = orig
        return list(tree.tree)

    assert build(1) == build(4)


@pytest.mark.parametrize("method", ["parttree", "medoidtree"])
def test_fast_tree_device_distances_parity(method, monkeypatch):
    """FastTree with the device distance backend (seeds/assignment/CLARANS
    sample matrix through rows_batch, reference FastTree.cpp:302-436) must
    produce the exact host-backend tree."""
    from famsa_tpu.core.params import Params
    from famsa_tpu.core.sequence import Sequence
    from famsa_tpu.pipeline import build_guide_tree
    from famsa_tpu.tree.guide_tree import GuideTree

    monkeypatch.setenv("FAMSA_TPU_FASTTREE_DEV_MIN", "16")

    rng = np.random.default_rng(11)
    aa = "ARNDCQEGHILKMFPSTWYV"
    seqs = []
    for k in range(300):
        ln = int(rng.integers(40, 90))
        seqs.append(Sequence(
            f">s{k}", "".join(aa[rng.integers(0, 20)] for _ in range(ln)), k))
    lmax = max(s.data_size for s in seqs)
    for s in seqs:
        s.resize(lmax)

    def build(backend):
        params = Params()
        params.backend = backend
        params.gt_heuristic = method
        params.medoid.threshold = 50
        params.medoid.subtree_size = 20
        params.medoid.sample_size = 60
        tree = GuideTree()
        build_guide_tree(params, seqs, tree)
        return list(tree.tree)

    assert build("numpy") == build("jax")


def test_apply_column_inserts_native_batch():
    """Native batched gap-column insertion (apply_column_inserts_batch)
    vs the per-member Python path - identical n_gaps on random members."""
    import numpy as np

    from famsa_tpu.core.sequence import encode_gapped
    from famsa_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(123)
    aa = "ARNDCQEGHILKMFPSTWYV"
    w_old = 60
    members = []
    for k in range(50):
        chars = ["-" if rng.random() < 0.3 else aa[rng.integers(0, 20)]
                 for _ in range(w_old)]
        if all(c == "-" for c in chars):
            chars[0] = "A"
        members.append(encode_gapped(f">s{k}", "".join(chars), k))

    sel = np.sort(rng.choice(np.arange(1, w_old + 1), size=5, replace=False))
    idxs = sel.astype(np.int64)
    deltas = rng.integers(1, 4, size=5).astype(np.int64)
    trail = 3

    ref = [m.n_gaps.copy() for m in members]
    for m in members:
        m.apply_column_inserts(idxs, deltas, trail)
    expected = [m.n_gaps.copy() for m in members]
    for m, r in zip(members, ref):
        m.n_gaps = r.copy()
        m._cum = None

    ptrs = np.fromiter((m.n_gaps.ctypes.data for m in members), np.uint64,
                       len(members))
    sizes = np.fromiter((m.size for m in members), np.int64, len(members))
    lib.apply_column_inserts_batch(ptrs, sizes, len(members),
                                   np.ascontiguousarray(idxs),
                                   np.ascontiguousarray(deltas),
                                   len(idxs), trail)
    for m, e in zip(members, expected):
        assert np.array_equal(m.n_gaps, e)
