"""CLARANS/FastPAM-style k-medoids (port of /root/reference/src/tree/Clustering.cpp).

float32 arithmetic and the mt19937/det_uniform_int draw sequence are
replicated exactly; per-candidate delta updates keep the reference's
element-wise float add ordering."""

import numpy as np

from ..utils.mt19937 import MT19937, det_uniform_int, partial_shuffle

_F32MAX = np.float32(np.finfo(np.float32).max)
MIN_MAX_NEIGHBOR = 250


def _update_assignment(x, candidate, n_medoids, dmat):
    """Find two closest medoids of x (Clustering.cpp:264-299)."""
    dn = _F32MAX
    ds = _F32MAX
    an = -1
    as_ = -1
    for mm in range(n_medoids):
        m = candidate[mm]
        d = dmat[m, x]
        if d < dn:
            ds = dn
            as_ = an
            dn = d
            an = mm
        elif d < ds:
            ds = d
            as_ = mm
    return dn, ds, an, as_


def clarans(dmat, n_elems, n_medoids, n_fixed_medoids, medoids,
            explore_fraction, num_local):
    """dmat: square float32 distance matrix. medoids: int array out [n_medoids]."""
    n_swaps = (n_elems - n_medoids) * n_medoids
    if n_swaps < MIN_MAX_NEIGHBOR:
        max_neighbor = n_swaps
    else:
        max_neighbor = max(int(explore_fraction * n_swaps), MIN_MAX_NEIGHBOR)
    corrected_max_neighbor = max_neighbor // n_medoids

    from ..native import get_lib
    lib = get_lib()

    candidate = list(range(n_elems))
    best_cost = _F32MAX
    best_candidate = None
    cur_candidate = None

    dists_nearest = np.zeros(n_elems, dtype=np.float32)
    dists_second = np.zeros(n_elems, dtype=np.float32)
    assign_nearest = np.zeros(n_elems, dtype=np.int64)
    assign_second = np.zeros(n_elems, dtype=np.int64)
    deltas = np.zeros(n_medoids, dtype=np.float32)

    gen_nodes = MT19937()
    gen_positions = MT19937()

    for _ in range(num_local):
        partial_shuffle(candidate, n_fixed_medoids, n_elems, n_elems, gen_nodes)
        cur_candidate = list(candidate)

        for mm in range(n_medoids):
            m = candidate[mm]
            dists_nearest[m] = 0
            dists_second[m] = -1
            assign_nearest[m] = -1
            assign_second[m] = -1

        cand_arr = np.array(candidate, dtype=np.int64)
        if lib is not None:
            cur_cost = np.float32(lib.clarans_init(
                dmat, n_elems, n_medoids, cand_arr, dists_nearest,
                dists_second, assign_nearest, assign_second))
        else:
            cur_cost = np.float32(0)
            for xx in range(n_medoids, n_elems):
                x = candidate[xx]
                dn, ds, an, as_ = _update_assignment(x, candidate, n_medoids, dmat)
                dists_nearest[x] = dn
                dists_second[x] = ds
                assign_nearest[x] = an
                assign_second[x] = as_
                cur_cost = np.float32(cur_cost + dn)

        step = 0
        while step < corrected_max_neighbor:
            xx = det_uniform_int(gen_positions, n_medoids, n_elems - 1)
            x = candidate[xx]

            if lib is not None:
                cand_arr = np.array(candidate, dtype=np.int64)
                lib.clarans_deltas(dmat, n_elems, n_medoids, xx, cand_arr,
                                   dists_nearest, dists_second,
                                   assign_nearest, deltas)
            else:
                deltas[:] = 0
                for yy in range(n_medoids, n_elems):
                    if yy == xx:
                        continue
                    y = candidate[yy]
                    dxy = dmat[x, y]
                    nn = assign_nearest[y]
                    dn = dists_nearest[y]
                    ds = dists_second[y]

                    change = np.float32(dxy - dn)
                    if change < 0:
                        keep = np.float32(deltas[nn] + np.float32(min(dxy, ds) - dn))
                        deltas += change
                        deltas[nn] = keep
                    else:
                        deltas[nn] = np.float32(deltas[nn] + np.float32(min(dxy, ds) - dn))

            mm_new = n_fixed_medoids + int(np.argmin(
                deltas[n_fixed_medoids:n_medoids].astype(np.float64)))
            delta = deltas[mm_new]

            if delta < 0 and lib is not None:
                cand_arr = np.array(candidate, dtype=np.int64)
                cur_cost = np.float32(lib.clarans_apply_swap(
                    dmat, n_elems, n_medoids, xx, mm_new, cand_arr,
                    dists_nearest, dists_second, assign_nearest,
                    assign_second, cur_cost))
                candidate[:] = cand_arr.tolist()
                cur_candidate[mm_new], cur_candidate[xx] = (
                    cur_candidate[xx], cur_candidate[mm_new])
                step = 0
            elif delta < 0:
                candidate[mm_new], candidate[xx] = candidate[xx], candidate[mm_new]
                m_new = candidate[mm_new]

                cur_cost = np.float32(cur_cost - dists_nearest[m_new])
                dists_nearest[m_new] = 0
                dists_second[m_new] = -1
                assign_nearest[m_new] = -1
                assign_second[m_new] = -1

                for yy in range(n_medoids, n_elems):
                    y = candidate[yy]
                    d_new = dmat[m_new, y]
                    dn = dists_nearest[y]
                    an = assign_nearest[y]

                    if yy == xx:
                        res = _update_assignment(y, candidate, n_medoids, dmat)
                        dists_nearest[y], dists_second[y], assign_nearest[y], assign_second[y] = res
                        cur_cost = np.float32(cur_cost + dists_nearest[y])
                        continue

                    if an == mm_new:
                        ds = dists_second[y]
                        if d_new < ds:
                            dists_nearest[y] = d_new
                            assign_nearest[y] = mm_new
                            cur_cost = np.float32(cur_cost + np.float32(d_new - dn))
                        else:
                            res = _update_assignment(y, candidate, n_medoids, dmat)
                            dists_nearest[y], dists_second[y], assign_nearest[y], assign_second[y] = res
                            cur_cost = np.float32(cur_cost + np.float32(ds - dn))
                    elif d_new < dn:
                        dists_second[y] = dn
                        assign_second[y] = an
                        dists_nearest[y] = d_new
                        assign_nearest[y] = mm_new
                        cur_cost = np.float32(cur_cost + np.float32(d_new - dn))
                    else:
                        ds = dists_second[y]
                        as_ = assign_second[y]
                        if as_ != mm_new and d_new < ds:
                            dists_second[y] = d_new
                            assign_second[y] = mm_new
                        else:
                            res = _update_assignment(y, candidate, n_medoids, dmat)
                            dists_nearest[y], dists_second[y], assign_nearest[y], assign_second[y] = res

                cur_candidate[mm_new], cur_candidate[xx] = cur_candidate[xx], cur_candidate[mm_new]
                step = 0

            step += 1

        if cur_cost < best_cost:
            best_cost = cur_cost
            best_candidate = list(cur_candidate[:n_medoids])

    if best_candidate is not None:
        medoids[:n_medoids] = best_candidate
    return medoids
