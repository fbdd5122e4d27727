"""Multi-chip distance layer: row-sharded LCS + sharded whole-tree Prim.

Maps the reference's row-parallel distance threads (SingleLinkage.cpp:47-82,
UPGMA.cpp:82-108, DistanceCalculator.cpp:28-82) and partition-parallel Prim
rounds (MSTPrim.cpp:330-441) onto a 1-D device mesh:

 - the per-symbol query-mask table ([32, N, W] uint32, ops/lcs_jax.py's
   symmetric-LCS layout) is sharded over the sequence axis: each device
   keeps masks for N/S sequences and computes that slice of every distance
   row locally - pure data parallelism, no communication until reduction;
 - MST-Prim's per-round argmin is a lexicographic (distance, ~packed-ids)
   reduction: each shard reduces locally, one all_gather of (S, 3) scalars
   over ICI picks the global winner - the whole N-1-round loop stays in a
   single compiled program (lax.scan inside shard_map);
 - SLINK/UPGMA/NJ/dist-export consume full rows: ShardedDistanceBackend
   computes row BLOCKS (all shards in parallel), gathers them, and applies
   the float64/float32 distance transforms on host - bit-identical to the
   single-device backends (same elementwise arithmetic).
"""

import functools

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.lcs_jax import BV32, build_query_mask_table, hyyro_step

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _pad_rows(padded, lengths, n_pad):
    n = padded.shape[0]
    if n_pad == n:
        return padded, lengths
    pp = np.full((n_pad, padded.shape[1]), 22, dtype=padded.dtype)
    pp[:n] = padded
    ll = np.zeros(n_pad, dtype=lengths.dtype)
    ll[:n] = lengths
    return pp, ll


# ----------------------------------------------------------------------
# Whole-tree MST-Prim over the mesh
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=8)
def _prim_program(mesh, n_pad, n_real, lmax, w, axis):
    S = mesh.devices.size
    nloc = n_pad // S

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)
    def run(table, queries, lengths):
        idx = jax.lax.axis_index(axis)
        base = idx.astype(jnp.int64) * nloc
        gids = base + jnp.arange(nloc, dtype=jnp.int64)
        ids_u = gids.astype(jnp.uint64)
        lens_loc = jax.lax.dynamic_slice(lengths, (base,), (nloc,))

        def lcs_round(ref_syms):
            x0 = jnp.full((nloc, w), jnp.uint32(0xFFFFFFFF))

            def pos_step(x, sym):
                return hyyro_step(x, table[sym], nloc, w), None

            xf, _ = jax.lax.scan(pos_step, x0, ref_syms)
            return jax.lax.population_count(~xf).astype(jnp.int64).sum(axis=1)

        def round_step(state, _):
            cur, dist, tieb, active = state
            lcs = lcs_round(queries[cur])
            rlen = lengths[cur]
            indel = (rlen + lens_loc - 2 * lcs).astype(jnp.float64)
            lcs_f = lcs.astype(jnp.float64)
            d_new = jnp.where(lcs > 0, indel ** 0.75 / lcs_f,
                              jnp.finfo(jnp.float64).max)

            curu = cur.astype(jnp.uint64)
            lo = jnp.minimum(ids_u, curu)
            hi = jnp.maximum(ids_u, curu)
            packed = ~((lo << np.uint64(32)) + hi)

            upd = active & ((d_new < dist)
                            | ((d_new == dist) & (packed < tieb)))
            dist = jnp.where(upd, d_new, dist)
            tieb = jnp.where(upd, packed, tieb)

            # local lexicographic argmin, then a global (S, 3) reduction
            d_m = jnp.where(active, dist, jnp.inf)
            m = jnp.min(d_m)
            t_m = jnp.where(d_m == m, tieb, U64_MAX)
            k = jnp.argmin(t_m)
            if S > 1:
                cand_d = jax.lax.all_gather(m, axis)
                cand_t = jax.lax.all_gather(t_m[k], axis)
                cand_i = jax.lax.all_gather(gids[k], axis)
                gm = jnp.min(cand_d)
                gt = jnp.where(cand_d == gm, cand_t, U64_MAX)
                gk = jnp.argmin(gt)
                best = cand_i[gk]
                best_t = gt[gk]
            else:
                gm = m
                best = gids[k]
                best_t = t_m[k]

            best_packed = (~best_t) & U64_MAX
            p1 = (best_packed >> np.uint64(32)).astype(jnp.int64)
            p2 = (best_packed & np.uint64(0xFFFFFFFF)).astype(jnp.int64)
            e1 = jnp.minimum(p1, p2)
            e2 = jnp.maximum(p1, p2)

            active = active & (gids != best)
            return (best, dist, tieb, active), (e1, e2, -gm, best)

        dist0 = jnp.full(nloc, jnp.finfo(jnp.float64).max)
        tieb0 = jnp.zeros(nloc, dtype=jnp.uint64)
        active0 = (gids != 0) & (gids < n_real)

        _, (e1, e2, dneg, bests) = jax.lax.scan(
            round_step, (jnp.int64(0), dist0, tieb0, active0), None,
            length=n_real - 1)
        return e1, e2, dneg, bests

    return jax.jit(run)


def mst_prim_tree_sharded(sequences, tree, mesh, axis="rows"):
    """Sharded drop-in for ops/prim_device.py:mst_prim_tree_device
    (indel075 distance).  Byte-identical dendrogram."""
    from ..tree.mst_prim import _mst_to_dendrogram

    n = len(sequences)
    if n == 1:
        return
    S = mesh.devices.size
    lmax = max(s.data_size for s in sequences)
    lmax = ((lmax + BV32 - 1) // BV32) * BV32
    padded = np.full((n, lmax), 22, dtype=np.int8)
    for k, s in enumerate(sequences):
        padded[k, :len(s.data)] = s.data
    lengths = np.array([s.length for s in sequences], dtype=np.int64)
    n_pad = -(-n // S) * S
    padded, lengths = _pad_rows(padded, lengths, n_pad)

    table = build_query_mask_table(padded)
    prog = _prim_program(mesh, n_pad, n, lmax, lmax // BV32, axis)
    e1, e2, dneg, bests = prog(jnp.asarray(table),
                               jnp.asarray(padded.astype(np.int32)),
                               jnp.asarray(lengths))
    e1, e2 = np.asarray(e1), np.asarray(e2)
    dneg = np.asarray(dneg)

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


# ----------------------------------------------------------------------
# Sharded distance-row backend (SLINK / UPGMA / NJ / dist-export)
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=8)
def _rows_program(mesh, n_pad, w, nrefs, axis):
    S = mesh.devices.size
    nloc = n_pad // S

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=P(None, axis),
        check_vma=False)
    def run(table, refs_syms):
        def one(ref_syms):
            x0 = jnp.full((nloc, w), jnp.uint32(0xFFFFFFFF))

            def pos_step(x, sym):
                return hyyro_step(x, table[sym], nloc, w), None

            xf, _ = jax.lax.scan(pos_step, x0, ref_syms)
            return jax.lax.population_count(~xf).astype(jnp.int32).sum(axis=1)

        _, out = jax.lax.scan(lambda c, r: (c, one(r)), 0, refs_syms)
        return out                                     # [nrefs, nloc]

    return jax.jit(run)


class ShardedDistanceBackend:
    """Row-sharded drop-in for ops.distance.DistanceBackend: LCS of row
    blocks over the mesh, distance transforms on host.  Rows are computed
    in blocks of `block` refs per dispatch and cached (SLINK/UPGMA consume
    rows sequentially)."""

    def __init__(self, sequences, measure, dtype, mesh, axis="rows",
                 block=16):
        from ..ops.distance import transform_distances
        self._transform = transform_distances
        self.sequences = sequences
        self.measure = measure
        self.dtype = dtype
        self.mesh = mesh
        self.axis = axis
        self.block = block
        n = len(sequences)
        self.n = n
        S = mesh.devices.size
        self.n_pad = -(-n // S) * S if n else 0
        if n:
            lmax = max(s.data_size for s in sequences)
            lmax = ((lmax + BV32 - 1) // BV32) * BV32
            padded = np.full((n, lmax), 22, dtype=np.int8)
            for k, s in enumerate(sequences):
                padded[k, :len(s.data)] = s.data
            lengths = np.array([s.length for s in sequences], dtype=np.int64)
            padded, _ = _pad_rows(padded, lengths, self.n_pad)
            self.lengths = lengths
            self._queries = padded.astype(np.int32)
            self.table_dev = jnp.asarray(build_query_mask_table(padded))
            self.w = lmax // BV32
        self._cache = {}

    def _lcs_all(self, ref_idx):
        if ref_idx not in self._cache:
            blk = [ref_idx + k for k in range(self.block)]
            blk = [min(i, self.n - 1) for i in blk]
            prog = _rows_program(self.mesh, self.n_pad, self.w,
                                 self.block, self.axis)
            out = np.asarray(prog(
                self.table_dev, jnp.asarray(self._queries[blk])))
            self._cache = {i: out[k, :self.n].astype(np.int64)
                           for k, i in enumerate(blk)}
        return self._cache[ref_idx]

    def row(self, ref_idx, query_ids=None):
        lcs = self._lcs_all(ref_idx)
        ref_len = int(self.sequences[ref_idx].length)
        if query_ids is None:
            return self._transform(self.measure, lcs, ref_len, self.lengths,
                                   self.dtype)
        return self._transform(self.measure, lcs[query_ids], ref_len,
                               self.lengths[query_ids], self.dtype)

    def row_prefix(self, ref_idx, count):
        if count == 0:
            return np.zeros(0, dtype=self.dtype)
        return self.row(ref_idx, np.arange(count))

    def rows_batch(self, ref_ids, query_ids=None):
        return np.stack([self.row(int(r), query_ids) for r in ref_ids])
