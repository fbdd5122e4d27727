"""Device-resident chain dispatcher (ops/dp_chain.py) in interpreter
mode vs the all-host alignment on caterpillar guide trees - the
serialized merge chains the 100k flagship is made of.

Geometry is shrunk (fold width 32, chain row bucket 64) so the
interpret-mode Mosaic compiles stay bounded; the chain program itself
(scan + lax.cond + device-resident carry) is exactly the production
one."""

import numpy as np
import pytest

from famsa_tpu.core.params import Params
from famsa_tpu.core.sequence import GappedSequence, Sequence


@pytest.fixture(autouse=True)
def _small_geometry(monkeypatch):
    from famsa_tpu.ops import dp_chain, dp_giant
    monkeypatch.setattr(dp_giant, "_LWS", (32, 64))
    monkeypatch.setattr(dp_giant, "GMAX_ROWS", 8 * 64 + 1)
    monkeypatch.setattr(dp_giant, "_w1_bucket",
                        lambda w: max(64, -(-w // 8) * 8))
    monkeypatch.setattr(dp_chain, "CHAIN_W1P", 64)
    monkeypatch.setattr(dp_chain, "CHAIN_K", 4)
    monkeypatch.setattr(dp_chain, "CHAIN_MIN_W2", 40)
    monkeypatch.setattr(dp_chain, "CHAIN_MIN_LEN", 3)
    monkeypatch.setattr(dp_chain, "CHAIN_MARGIN", 16)
    yield


def _mk_seqs(rng, n, lmin=20, lmax=45):
    aa = "ARNDCQEGHILKMFPSTWYV"
    seqs = []
    for k in range(n):
        ln = int(rng.integers(lmin, lmax))
        s = "".join(aa[rng.integers(0, 20)] for _ in range(ln))
        seqs.append(Sequence(f">s{k}", s, k))
    return seqs


def _caterpillar(n, leaf_first=True):
    """tree_list for a pure chain: node n = (0, 1); node n+k merges
    node n+k-1 with leaf k+1.  leaf_first alternates the child order so
    both (leaf, prev) and (prev, leaf) links are exercised."""
    tree = [(-1, -1)] * n
    tree.append((0, 1))
    for k in range(2, n):
        prev = n + k - 2
        tree.append((k, prev) if (leaf_first and k % 2 == 0)
                    else (prev, k))
    return tree


def _align_with_tree(params, seqs, tree_list, backend):
    from famsa_tpu.pipeline import compute_alignment
    gapped = [GappedSequence.from_sequence(s) for s in seqs]
    for i, g in enumerate(gapped):
        g.sequence_no = i
    params.backend = backend
    prof = compute_alignment(params, gapped, tree_list)
    from famsa_tpu.core.construct_fast import drain_gap_queue
    drain_gap_queue()
    ordered = [None] * len(prof.data)
    for gs in prof.data:
        ordered[gs.sequence_no] = gs
    return [gs.decode() for gs in ordered]


@pytest.mark.parametrize("leaf_first", [True, False])
def test_chain_route_matches_host(monkeypatch, leaf_first):
    monkeypatch.setenv("FAMSA_TPU_DP_PALLAS", "interpret")
    monkeypatch.setenv("FAMSA_TPU_CHAIN", "1")
    monkeypatch.setenv("FAMSA_TPU_GIANT", "0")

    rng = np.random.default_rng(11 if leaf_first else 13)
    n = 12
    seqs = _mk_seqs(rng, n)
    tree = _caterpillar(n, leaf_first)

    params_h = Params()
    params_h.adjust(n)
    want = _align_with_tree(params_h, _mk_seqs(rng.__class__(
        np.random.PCG64(11 if leaf_first else 13)), n), tree, "numpy")

    params_d = Params()
    params_d.adjust(n)
    got = _align_with_tree(params_d, seqs, tree, "jax")
    assert got == want


def test_chain_route_width_abort(monkeypatch):
    """A chain whose width outgrows the shrunken fold kernel mid-run:
    the dispatcher must abort cleanly and hand the remaining merges to
    the normal routes, byte-identically."""
    monkeypatch.setenv("FAMSA_TPU_DP_PALLAS", "interpret")
    monkeypatch.setenv("FAMSA_TPU_CHAIN", "1")
    monkeypatch.setenv("FAMSA_TPU_GIANT", "0")
    from famsa_tpu.ops import dp_giant
    # tighten so the chain aborts partway (8*32 - 128 pad < total width)
    monkeypatch.setattr(dp_giant, "_LWS", (32,))
    monkeypatch.setattr(dp_giant, "GMAX_ROWS", 8 * 32 + 1)

    rng = np.random.default_rng(29)
    n = 10
    seqs = _mk_seqs(rng, n, lmin=24, lmax=40)
    tree = _caterpillar(n)

    params_h = Params()
    params_h.adjust(n)
    want = _align_with_tree(params_h, _mk_seqs(rng.__class__(
        np.random.PCG64(29)), n, lmin=24, lmax=40), tree, "numpy")

    params_d = Params()
    params_d.adjust(n)
    got = _align_with_tree(params_d, seqs, tree, "jax")
    assert got == want


def test_chain_route_overflow_recovery(monkeypatch):
    """Chain merges whose OUTPUT width overflows the optimistically
    chosen fold capacity mid-chunk: resolve must detect it (output >
    cap), requeue the un-built merges, and re-seed the device carry from
    the last good host profile - byte-identically.  Random (dissimilar)
    sequences make the alignment width grow by tens of columns per
    merge, guaranteeing overflows against the shrunken 128-column
    capacity."""
    monkeypatch.setenv("FAMSA_TPU_DP_PALLAS", "interpret")
    monkeypatch.setenv("FAMSA_TPU_CHAIN", "1")
    monkeypatch.setenv("FAMSA_TPU_GIANT", "0")
    from famsa_tpu.ops import dp_chain, dp_giant
    monkeypatch.setattr(dp_giant, "_LWS", (32,))
    monkeypatch.setattr(dp_giant, "GMAX_ROWS", 8 * 32 + 1)
    monkeypatch.setattr(dp_chain, "CHAIN_MIN_W2", 30)

    rng = np.random.default_rng(37)
    n = 12
    seqs = _mk_seqs(rng, n, lmin=30, lmax=45)
    tree = _caterpillar(n)

    params_h = Params()
    params_h.adjust(n)
    want = _align_with_tree(params_h, _mk_seqs(rng.__class__(
        np.random.PCG64(37)), n, lmin=30, lmax=45), tree, "numpy")

    params_d = Params()
    params_d.adjust(n)
    got = _align_with_tree(params_d, seqs, tree, "jax")
    assert got == want
