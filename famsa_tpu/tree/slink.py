"""SLINK single-linkage clustering with deterministic tie handling.

Port of /root/reference/src/tree/SingleLinkage.cpp (SLINK_HANDLE_TIES
variant): lambda/dist entries are (distance, packed-id) pairs ordered by
increasing distance, DECREASING packed id on ties (SingleLinkage.h:18-38).
Distance rows are produced by the pluggable distance backend (device-
batched on TPU); the O(N^2) pointer-update recurrence stays on host.
"""

import numpy as np

from .tree_defs import ids_to_uint64

_DMAX = np.finfo(np.float64).max


def _pair_less(d1, p1, d2, p2):
    if d1 == d2:
        return p1 > p2
    return d1 < d2


def _pair_leq(d1, p1, d2, p2):
    if d1 == d2:
        return p1 >= p2
    return d1 <= d2


def slink_tree(n_seq, row_fn, tree):
    """row_fn(i) -> float64 distances from seq i to seqs 0..i-1.

    Appends n_seq-1 merge nodes to `tree`."""
    from ..native import get_lib
    lib = get_lib()

    pi = np.zeros(n_seq, dtype=np.int64)
    lam_d = np.full(n_seq, _DMAX, dtype=np.float64)
    lam_p = np.zeros(n_seq, dtype=np.uint64)

    ids = np.arange(n_seq, dtype=np.uint64)

    for i in range(n_seq):
        pi[i] = i
        lam_d[i] = _DMAX
        lam_p[i] = 0

        loc = row_fn(i)
        dv_d = np.ascontiguousarray(loc[:i], dtype=np.float64)
        # packed tie-break ids: ids_to_uint64(j, i) with j < i
        dv_p = (ids[:i] << np.uint64(32)) + np.uint64(i)

        if lib is not None:
            lib.slink_update_row(i, dv_d, dv_p, pi, lam_d, lam_p)
            continue

        for j in range(i):
            nxt = pi[j]
            if _pair_less(lam_d[j], lam_p[j], dv_d[j], dv_p[j]):
                # x = min(x, dist_vector[j])
                if _pair_less(dv_d[j], dv_p[j], dv_d[nxt], dv_p[nxt]):
                    dv_d[nxt] = dv_d[j]
                    dv_p[nxt] = dv_p[j]
            else:
                if _pair_less(lam_d[j], lam_p[j], dv_d[nxt], dv_p[nxt]):
                    dv_d[nxt] = lam_d[j]
                    dv_p[nxt] = lam_p[j]
                pi[j] = i
                lam_d[j] = dv_d[j]
                lam_p[j] = dv_p[j]

        for j in range(i):
            nxt = pi[j]
            if _pair_leq(lam_d[nxt], lam_p[nxt], lam_d[j], lam_p[j]):
                pi[j] = i

    # dendrogram from stable-sorted lambda (SingleLinkage.cpp:166-189)
    elements = list(range(n_seq - 1))
    elements.sort(key=lambda x: (lam_d[x], -int(lam_p[x])))
    index = list(range(n_seq))
    for i in range(n_seq - 1):
        j = elements[i]
        nxt = int(pi[j])
        tree.append((index[j], index[nxt]))
        index[nxt] = n_seq + i
