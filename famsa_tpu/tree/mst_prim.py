"""Single linkage via Prim's MST on the implicit complete graph.

Port of /root/reference/src/tree/MSTPrim.cpp (the default `-gt sl` method).
The reference's thread-partitioned candidate scan reduces to: each round,
compute distances from the newly added vertex to all remaining vertices,
fold them into the per-vertex best (distance, ~packed-ids) pair, and take
the lexicographic argmin - which is thread-count invariant because the
packed-id component makes the order total.  Here each round's distance
batch is one backend call (one device launch on TPU); the dendrogram
recursion (mst_to_dendogram, MSTPrim.cpp:784-833) runs on host.
"""

import numpy as np

from ..utils import logger
from .tree_defs import U64_MASK, uint64_to_id

_DMAX = np.finfo(np.float64).max


def mst_prim_tree(n_seq, row_fn, tree, lengths=None, measure=None):
    """row_fn(ref_idx, ids) -> float64 distances ref vs sequences[ids].

    Appends n_seq-1 merge nodes to `tree`.

    lengths/measure (optional): enables the reference's theoretical-best
    prefilter (MSTPrim.cpp:450-467, USE_THEORETICAL_BEST_POSSIBLE_DIST):
    a pair whose best possible distance (at lcs = min(len1, len2)) already
    exceeds the vertex's current best can never update it - its LCS is
    skipped.  Exact: the transform is decreasing in lcs, so actual >=
    theoretical-best > current best implies no update even via the
    tie-break (which requires equality).  A large constant-factor win on
    heterogeneous-length families; byte-identical trees."""
    if n_seq == 1:
        return

    prefilter = None
    if lengths is not None and measure is not None:
        from ..ops.distance import transform_distances
        lengths = np.asarray(lengths, dtype=np.int64)

        def prefilter(cur, ids, cur_best):
            best_lcs = np.minimum(lengths[cur], lengths[ids])
            tb = transform_distances(measure, best_lcs, int(lengths[cur]),
                                     lengths[ids], np.float64)
            return tb <= cur_best

    dist = np.full(n_seq, _DMAX, dtype=np.float64)
    tieb = np.zeros(n_seq, dtype=np.uint64)
    remaining = np.ones(n_seq, dtype=bool)

    # ~ids_to_uint64(cur, id) precomputation helpers
    ids_all = np.arange(n_seq, dtype=np.uint64)

    prim_orders = np.full(n_seq, n_seq, dtype=np.int64)
    edges_from = [0]
    edges_to = [0]
    edges_dist = [0.0]          # stored negated, dummy edge at prim order 0
    prim_orders[0] = 0
    cur = 0
    remaining[0] = False
    cur_prim_order = 1

    for c_seq in range(n_seq - 1):
        if c_seq % 100 == 0:
            # reference progress line (MSTPrim.cpp:427-429): fraction of
            # the triangular candidate-scan work done, at -vv
            logger.progress(
                "Computing guide tree - "
                f"{100.0 * (c_seq * (2 * n_seq - c_seq + 1) / 2) / (n_seq * (n_seq + 1) / 2):.1f}%"
                f"    ({c_seq} of {n_seq})  ")
        ids = np.nonzero(remaining)[0]
        if prefilter is not None:
            ids = ids[prefilter(cur, ids, dist[ids])]
        if len(ids):
            d = row_fn(cur, ids)

            lo = np.minimum(ids_all[ids], np.uint64(cur))
            hi = np.maximum(ids_all[ids], np.uint64(cur))
            packed = (~((lo << np.uint64(32)) + hi)) & np.uint64(U64_MASK)

            upd = (d < dist[ids]) | ((d == dist[ids]) & (packed < tieb[ids]))
            uids = ids[upd]
            dist[uids] = d[upd]
            tieb[uids] = packed[upd]
        ids = np.nonzero(remaining)[0]

        # lexicographic argmin over remaining by (dist, tieb)
        sub_d = dist[ids]
        m = sub_d.min()
        cand = ids[sub_d == m]
        best = int(cand[np.argmin(tieb[cand])])

        p1, p2 = uint64_to_id((~int(tieb[best])) & U64_MASK)
        edges_from.append(p1)
        edges_to.append(p2)
        edges_dist.append(-float(dist[best]))
        if prim_orders[p1] == n_seq:
            prim_orders[p1] = cur_prim_order
        else:
            prim_orders[p2] = cur_prim_order
        cur_prim_order += 1

        remaining[best] = False
        cur = best

    _mst_to_dendrogram(np.array(edges_from), np.array(edges_to),
                       np.array(edges_dist), prim_orders, tree)


def _mst_to_dendrogram(e_from, e_to, e_dist, prim_orders, tree):
    """MSTPrim::mst_to_dendogram (MSTPrim.cpp:784-833): recursively split
    the Prim order at the max-weight edge (max under the reference's
    reversed comparator = lexicographic min of (stored_dist, packed))."""
    from collections import deque
    from .tree_defs import ids_to_uint64

    n_seq = len(e_from)
    rev = np.empty(len(prim_orders), dtype=np.int64)
    rev[prim_orders] = np.arange(len(prim_orders))

    packed = np.array([ids_to_uint64(int(a), int(b)) for a, b in zip(e_from, e_to)],
                      dtype=np.uint64)

    out = [None] * (2 * n_seq - 1)
    cur_id = 2 * n_seq - 2
    q = deque()
    q.append((cur_id, 0, n_seq))
    cur_id -= 1

    while q:
        rid, pf, pt = q.popleft()
        # max element in edges[pf+1 : pt] under reversed order
        seg_d = e_dist[pf + 1:pt]
        m = seg_d.min()
        cand = np.nonzero(seg_d == m)[0]
        k = cand[np.argmin(packed[pf + 1:pt][cand])] + pf + 1
        prim_split = int(k)

        if pf + 1 == prim_split:
            id_left = int(rev[pf])
        else:
            id_left = cur_id
            cur_id -= 1
            q.append((id_left, min(pf, prim_split), max(pf, prim_split)))

        if prim_split + 1 == pt:
            id_right = int(rev[prim_split])
        else:
            id_right = cur_id
            cur_id -= 1
            q.append((id_right, min(prim_split, pt), max(prim_split, pt)))

        out[rid] = (id_left, id_right)

    n_leaves = n_seq
    for node in out[n_leaves:]:
        tree.append(node)
