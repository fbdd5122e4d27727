"""Whole-tree MST-Prim on device.

The reference builds the default guide tree with N rounds of batched LCS
distance scans (MSTPrim.cpp:330-538).  Host-driven rounds would cost one
device dispatch each; instead the ENTIRE Prim loop runs as one compiled
program: a lax.scan over rounds, each round computing the bit-parallel LCS
of the newly added vertex against all sequences (lane-parallel), folding
the per-vertex best (distance, ~packed-id) pair, and taking the
deterministic lexicographic argmin.  Per-symbol bit masks for every
sequence are precomputed once as a [N, 20, W] uint32 tensor in HBM.

Outputs (edge endpoints, negated distances, prim orders) feed the host-side
dendrogram construction (tree/mst_prim.py), bit-identical to the reference.
"""

import functools

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ..core.defs import NO_VALID_AMINOACIDS

BV32 = 32
U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def build_all_masks(padded, lengths):
    """[N, 20, W] uint32 per-symbol occupancy masks for all sequences.
    padded: [N, L] int8 (pad symbol >= 20)."""
    n, lmax = padded.shape
    w = (lmax + BV32 - 1) // BV32
    masks = np.zeros((n, NO_VALID_AMINOACIDS, w), dtype=np.uint32)
    sym = padded.astype(np.int64)
    t = np.arange(lmax)
    words = t // BV32
    bits = (np.uint32(1) << (t % BV32).astype(np.uint32))
    valid = (sym >= 0) & (sym < NO_VALID_AMINOACIDS)
    rows, cols = np.nonzero(valid)
    np.bitwise_or.at(masks, (rows, sym[rows, cols], words[cols]), bits[cols])
    return masks


@functools.partial(jax.jit, static_argnames=("unroll",))
def prim_device(all_masks, queries, lengths, unroll=1):
    """Run all n-1 Prim rounds on device.

    all_masks: [N, 20, W] uint32; queries: [N, L] int32; lengths: [N] int64.
    Returns (edge_p1, edge_p2, edge_dist_neg, prim_orders) - see
    tree/mst_prim.py for the host dendrogram step."""
    n, lmax = queries.shape
    w = all_masks.shape[2]

    def lcs_round(masks_ref, x_syms):
        # masks_ref: [20, W]; returns [N] int64 LCS lengths
        masks_full = jnp.zeros((32, w), jnp.uint32).at[:NO_VALID_AMINOACIDS].set(masks_ref)
        x = jnp.full((n, w), jnp.uint32(0xFFFFFFFF))

        def pos_step(xc, syms):
            sb = masks_full[syms]
            carry = jnp.zeros((n,), jnp.uint32)
            cols = []
            for k in range(w):
                v = xc[:, k]
                tb = v & sb[:, k]
                v2 = v + tb + carry
                carry = (v2 < v).astype(jnp.uint32)
                cols.append(v2 | (v - tb))
            return jnp.stack(cols, axis=1), None

        xf, _ = jax.lax.scan(pos_step, x, x_syms.T, unroll=unroll)
        return jax.lax.population_count(~xf).astype(jnp.int64).sum(axis=1)

    ids = jnp.arange(n, dtype=jnp.uint64)

    def round_step(state, _):
        cur, dist, tieb, active = state
        masks_ref = all_masks[cur]
        lcs = lcs_round(masks_ref, queries)
        rlen = lengths[cur]
        indel = (rlen + lengths - 2 * lcs).astype(jnp.float64)
        lcs_f = lcs.astype(jnp.float64)
        d_new = jnp.where(lcs > 0, indel ** 0.75 / lcs_f,
                          jnp.finfo(jnp.float64).max)

        curu = cur.astype(jnp.uint64)
        lo = jnp.minimum(ids, curu)
        hi = jnp.maximum(ids, curu)
        packed = ~((lo << np.uint64(32)) + hi)

        upd = active & ((d_new < dist) | ((d_new == dist) & (packed < tieb)))
        dist = jnp.where(upd, d_new, dist)
        tieb = jnp.where(upd, packed, tieb)

        # lexicographic argmin over active vertices
        d_m = jnp.where(active, dist, jnp.inf)
        m = jnp.min(d_m)
        t_m = jnp.where(d_m == m, tieb, U64_MAX)
        best = jnp.argmin(t_m).astype(jnp.int64)

        best_packed = (~tieb[best]) & U64_MAX
        p1 = (best_packed >> np.uint64(32)).astype(jnp.int64)
        p2 = (best_packed & np.uint64(0xFFFFFFFF)).astype(jnp.int64)
        # uint64_to_id orders (min, max)
        e1 = jnp.minimum(p1, p2)
        e2 = jnp.maximum(p1, p2)

        active = active.at[best].set(False)
        return (best, dist, tieb, active), (e1, e2, -dist[best], best)

    dist0 = jnp.full(n, jnp.finfo(jnp.float64).max)
    tieb0 = jnp.zeros(n, dtype=jnp.uint64)
    active0 = jnp.ones(n, dtype=bool).at[0].set(False)

    _, (e1, e2, dneg, bests) = jax.lax.scan(
        round_step, (jnp.int64(0), dist0, tieb0, active0), None, length=n - 1)
    return e1, e2, dneg, bests


def mst_prim_tree_device(sequences, tree, measure=None):
    """Device MST-Prim + host dendrogram (drop-in for tree/mst_prim.py)."""
    from ..tree.mst_prim import _mst_to_dendrogram

    n = len(sequences)
    if n == 1:
        return
    lmax = max(s.data_size for s in sequences)
    lmax = ((lmax + BV32 - 1) // BV32) * BV32
    padded = np.full((n, lmax), 22, dtype=np.int8)
    for k, s in enumerate(sequences):
        padded[k, :len(s.data)] = s.data
    lengths = np.array([s.length for s in sequences], dtype=np.int64)

    masks = build_all_masks(padded, lengths)
    e1, e2, dneg, bests = prim_device(
        jnp.asarray(masks), jnp.asarray(padded.astype(np.int32)),
        jnp.asarray(lengths))
    e1 = np.asarray(e1)
    e2 = np.asarray(e2)
    dneg = np.asarray(dneg)
    bests = np.asarray(bests)

    prim_orders = np.full(n, n, dtype=np.int64)
    prim_orders[0] = 0
    edges_from = [0]
    edges_to = [0]
    edges_dist = [0.0]
    order = 1
    for k in range(n - 1):
        p1, p2 = int(e1[k]), int(e2[k])
        edges_from.append(p1)
        edges_to.append(p2)
        edges_dist.append(float(dneg[k]))
        if prim_orders[p1] == n:
            prim_orders[p1] = order
        else:
            prim_orders[p2] = order
        order += 1

    _mst_to_dendrogram(np.array(edges_from), np.array(edges_to),
                       np.array(edges_dist), prim_orders, tree)
