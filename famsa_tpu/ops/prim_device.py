"""Whole-tree MST-Prim on device.

The reference builds the default guide tree with N rounds of batched LCS
distance scans (MSTPrim.cpp:330-538).  Host-driven rounds would cost one
device dispatch each; instead the ENTIRE Prim loop runs as one compiled
program: a lax.scan over rounds, each round computing the bit-parallel LCS
of the newly added vertex against all sequences (lane-parallel), folding
the per-vertex best (distance, ~packed-id) pair, and taking the
deterministic lexicographic argmin.

Symmetric-LCS layout (see ops/lcs_jax.py): per-symbol bit masks of ALL
sequences are precomputed once as a [32, N, W] uint32 table in HBM; each
round streams the new vertex's SYMBOLS, so every position needs only
table[sym] - a scalar-indexed slice instead of an [N]-vector gather.

Outputs (edge endpoints, negated distances, prim orders) feed the host-side
dendrogram construction (tree/mst_prim.py), bit-identical to the reference.
"""

import functools

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from .lcs_jax import build_query_mask_table, hyyro_step

BV32 = 32
U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


@functools.partial(jax.jit,
                   static_argnames=("k_rounds", "unroll", "pallas_meta"))
def _prim_device_chunk(table, queries, lengths, cur, dist, tieb, active,
                       k_rounds, unroll=1, pallas_meta=None):
    """k_rounds Prim rounds with carried state.  The whole tree is run as
    a HOST loop over bounded chunks (state stays device-resident between
    dispatches): a single n-round program trips the TPU worker's
    long-running-program watchdog at n ~ 1e5."""
    n, lmax = queries.shape

    if pallas_meta is not None:
        w, ql, interp = pallas_meta

        def lcs_round(ref_syms):
            from .lcs_pallas import _lcs_pallas_impl
            out = _lcs_pallas_impl(table, ref_syms[None, :], w, lmax, ql,
                                   interpret=interp)
            return out.reshape(-1)[:n].astype(jnp.int64)
    else:
        w = table.shape[2]

        def lcs_round(ref_syms):
            x0 = jnp.full((n, w), jnp.uint32(0xFFFFFFFF))

            def pos_step(x, sym):
                return hyyro_step(x, table[sym], n, w), None

            xf, _ = jax.lax.scan(pos_step, x0, ref_syms, unroll=unroll)
            return jax.lax.population_count(~xf).astype(jnp.int64).sum(axis=1)

    ids = jnp.arange(n, dtype=jnp.uint64)

    def round_step(state, _):
        cur, dist, tieb, active = state
        lcs = lcs_round(queries[cur])
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

    (cur, dist, tieb, active), (e1, e2, dneg, bests) = jax.lax.scan(
        round_step, (cur, dist, tieb, active), None, length=k_rounds)
    return cur, dist, tieb, active, e1, e2, dneg, bests


def prim_device(table, queries, lengths, unroll=1, pallas_meta=None,
                chunk=None, after_first_chunk=None):
    """Run all n-1 Prim rounds on device, chunked (see _prim_device_chunk).

    table: [32, N, W] uint32 query masks (XLA path) or the packed
    [NB, 32*W, 8, QL] int32 layout when pallas_meta=(w, ql) is given
    (ops/lcs_pallas.py); queries: [N, L] int32; lengths: [N] int64.
    Returns (edge_p1, edge_p2, edge_dist_neg, prim_orders) - see
    tree/mst_prim.py for the host dendrogram step."""
    import os

    n = queries.shape[0]
    if chunk is None:
        chunk = int(os.environ.get("FAMSA_TPU_PRIM_CHUNK", "2048"))
    state = (jnp.int64(0),
             jnp.full(n, jnp.finfo(jnp.float64).max),
             jnp.zeros(n, dtype=jnp.uint64),
             jnp.ones(n, dtype=bool).at[0].set(False))
    outs = []
    done = 0
    while done < n - 1:
        k = min(chunk, n - 1 - done)
        *state, e1, e2, dneg, bests = _prim_device_chunk(
            table, queries, lengths, *state, k_rounds=k, unroll=unroll,
            pallas_meta=pallas_meta)
        state = tuple(state)
        outs.append((e1, e2, dneg, bests))
        done += k
        if after_first_chunk is not None:
            # the round program is compiled now and the remaining chunks
            # execute without the AOT helper - the caller can start
            # compiling the ALIGNMENT stage's programs in the shadow of
            # the remaining tree rounds
            cb, after_first_chunk = after_first_chunk, None
            cb()
    if len(outs) == 1:
        return outs[0]
    return tuple(jnp.concatenate([o[i] for o in outs]) for i in range(4))


def mst_prim_tree_device(sequences, tree, measure=None, use_pallas=None,
                         after_first_chunk=None):
    """Device MST-Prim + host dendrogram (drop-in for tree/mst_prim.py).

    use_pallas: run the per-round LCS as the Mosaic kernel
    (ops/lcs_pallas.py) instead of the XLA scan - default on TPU.
    after_first_chunk: called once when the round program is compiled
    and executing (see prim_device) - the pipeline hooks its DP-program
    prewarm here so alignment-stage compiles hide under tree rounds."""
    import jax as _jax
    from ..tree.mst_prim import _mst_to_dendrogram

    import os

    n = len(sequences)
    if n == 1:
        return
    if use_pallas is None:
        # FAMSA_TPU_PRIM_PALLAS=0 falls back to the XLA-scan LCS rounds
        use_pallas = (_jax.default_backend() == "tpu"
                      and os.environ.get("FAMSA_TPU_PRIM_PALLAS", "1") == "1")
    lmax = max(s.data_size for s in sequences)
    lmax = ((lmax + BV32 - 1) // BV32) * BV32
    padded = np.full((n, lmax), 22, dtype=np.int8)
    for k, s in enumerate(sequences):
        padded[k, :len(s.data)] = s.data
    lengths = np.array([s.length for s in sequences], dtype=np.int64)

    if use_pallas:
        from .lcs_pallas import _pick_ql, pack_query_table
        w = lmax // BV32
        ql = _pick_ql(w)
        tab, _, _ = pack_query_table(padded, ql)
        e1, e2, dneg, bests = prim_device(
            jnp.asarray(tab), jnp.asarray(padded.astype(np.int32)),
            jnp.asarray(lengths), pallas_meta=(w, ql, False),
            after_first_chunk=after_first_chunk)
    else:
        table = build_query_mask_table(padded)
        e1, e2, dneg, bests = prim_device(
            jnp.asarray(table), jnp.asarray(padded.astype(np.int32)),
            jnp.asarray(lengths), after_first_chunk=after_first_chunk)
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
