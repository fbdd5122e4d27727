"""Run-vectorized profile construction.

Equivalent to core/construct.py (the validated per-column port) but
processes the traceback path as maximal D/H/V runs with vectorized
counter/score merging - O(#runs) Python steps instead of O(width).

Key simplification (derived from the reference's gap-category recurrence,
profile.cpp:1116-1146): within a gap run the per-column category counts
converge after two columns -
  col 1: SolveGapsProblemWhenStarting;
  col 2: te2 = to1 + te1, ext2 = open1 + ext1, open2 = card - ext2 - te2;
  col m>=3: te = te2, ext = card - te2, open = 0 (interior runs)
           or te = card (boundary runs),
so whole runs merge with three vectorized adds."""

import numpy as np

from ..native import get_lib
from .construct import _solve_starting, _trace_path
from .defs import (GAP, GAP_EXT, GAP_OPEN, GAP_TERM_EXT, GAP_TERM_OPEN,
                   NO_AMINOACIDS, NO_SYMBOLS, SCORE_DTYPE)
from .dp import D, H, V
from .profile import Profile


def _gap_ptr_cache(profile):
    """[card] uint64 raw pointers + [card] int64 sizes of the members'
    n_gaps arrays, cached on the Profile (construct concatenates the
    parents' caches, so steady state is one memcpy per merge)."""
    if (profile._gap_ptrs is None
            or len(profile._gap_ptrs) != len(profile.data)):
        profile._gap_ptrs = np.fromiter(
            (gs.n_gaps.ctypes.data for gs in profile.data), np.uint64,
            len(profile.data))
        profile._gap_sizes = np.fromiter(
            (gs.size for gs in profile.data), np.int64, len(profile.data))
    return profile._gap_ptrs, profile._gap_sizes


def _path_runs(path):
    """Yield (dir, start_index, length) maximal runs."""
    runs = []
    k = 0
    n = len(path)
    while k < n:
        d = path[k]
        j = k + 1
        while j < n and path[j] == d:
            j += 1
        runs.append((d, k, j - k))
        k = j
    return runs


def construct_profile_fast(dest: Profile, profile1: Profile, profile2: Profile, res):
    p = dest.params
    go, ge = p.gap_open, p.gap_ext
    gto, gte = p.gap_term_open, p.gap_term_ext

    w1, w2 = profile1.width, profile2.width
    size1, size2 = len(profile1.data), len(profile2.data)
    counters1, counters2 = profile1.counters, profile2.counters
    scores1, scores2 = profile1.scores, profile2.scores

    path, total_score = _trace_path(res, w1, w2)
    width = len(path)
    dest.total_score = total_score
    dest.width = width

    counters = np.zeros((width + 1, NO_SYMBOLS), dtype=np.int64)
    scores = np.zeros((width + 1, NO_SYMBOLS), dtype=SCORE_DTYPE)

    colmap1 = np.zeros(w1 + 1, dtype=np.int64)
    colmap2 = np.zeros(w2 + 1, dtype=np.int64)

    tr1 = tr1_term = 0
    tr2 = tr2_term = 0
    i = j = 0

    def apply_transfer(which, col):
        nonlocal tr1, tr1_term, tr2, tr2_term
        if which == 1:
            t, tt = tr1, tr1_term
            cnt, sc = counters1, scores1
        else:
            t, tt = tr2, tr2_term
            cnt, sc = counters2, scores2
        if t or tt:
            cnt[col, GAP_EXT] += t
            cnt[col, GAP_OPEN] -= t
            cnt[col, GAP_TERM_EXT] += tt
            cnt[col, GAP_TERM_OPEN] -= tt
            sc[col, :NO_AMINOACIDS] += t * (ge - go) + tt * (gte - gto)
        if which == 1:
            tr1 = tr1_term = 0
        else:
            tr2 = tr2_term = 0

    def gap_run_categories(first, card, length):
        """Per-column (open, ext, term_open, term_ext) for a gap run of
        `length` columns whose first column has categories `first`."""
        o1, e1, to1, te1 = first
        cats = [first]
        if length >= 2:
            te2 = to1 + te1
            e2 = o1 + e1
            o2 = card - e2 - te2
            cats.append((o2, e2, 0, te2))
        if length >= 3:
            te3 = te2
            e3 = o2 + e2
            o3 = card - e3 - te3
            cats.append((o3, e3, 0, te3))
            # from col 4 on the recurrence is stationary:
            # te const, ext_{m+1} = open_m + ext_m = card - te, open = 0
            if length >= 4:
                te_c = te3
                e_c = o3 + e3
                o_c = card - e_c - te_c
                cats.extend([(o_c, e_c, 0, te_c)] * (length - 3))
        return cats

    for dir_, start, length in _path_runs(path):
        cols = np.arange(start + 1, start + 1 + length)
        if dir_ == D:
            i_range = np.arange(i + 1, i + 1 + length)
            j_range = np.arange(j + 1, j + 1 + length)
            apply_transfer(1, i + 1)
            apply_transfer(2, j + 1)
            counters[cols] += counters1[i_range]
            counters[cols] += counters2[j_range]
            scores[cols] += scores1[i_range]
            scores[cols] += scores2[j_range]
            colmap1[i_range] = cols
            colmap2[j_range] = cols
            i += length
            j += length
        elif dir_ == H:
            # gap run in profile1; consumes j+1..j+length of profile2
            boundary = (i == w1 or i == 0)
            o, e, to, te, t, tt = _solve_starting(i, w1, size1, counters1)
            tr1 += t
            tr1_term = tt
            if boundary:
                cats = [(o, e, to, te)]
                cats.extend([(0, 0, 0, size1)] * (length - 1))
            else:
                cats = gap_run_categories((o, e, to, te), size1, length)
            cat_arr = np.array(cats, dtype=np.int64)
            counters[cols, GAP_OPEN] += cat_arr[:, 0]
            counters[cols, GAP_EXT] += cat_arr[:, 1]
            counters[cols, GAP_TERM_OPEN] += cat_arr[:, 2]
            counters[cols, GAP_TERM_EXT] += cat_arr[:, 3]
            counters[cols, GAP] += size1
            gap_cost = (cat_arr[:, 0] * go + cat_arr[:, 1] * ge
                        + cat_arr[:, 2] * gto + cat_arr[:, 3] * gte)
            scores[np.ix_(cols, np.arange(NO_AMINOACIDS))] += gap_cost[:, None]

            apply_transfer(2, j + 1)
            j_range = np.arange(j + 1, j + 1 + length)
            counters[cols] += counters2[j_range]
            scores[cols] += scores2[j_range]
            colmap2[j_range] = cols
            j += length
        else:
            boundary = (j == w2 or j == 0)
            o, e, to, te, t, tt = _solve_starting(j, w2, size2, counters2)
            tr2 += t
            tr2_term = tt
            if boundary:
                cats = [(o, e, to, te)]
                cats.extend([(0, 0, 0, size2)] * (length - 1))
            else:
                cats = gap_run_categories((o, e, to, te), size2, length)
            cat_arr = np.array(cats, dtype=np.int64)

            apply_transfer(1, i + 1)
            i_range = np.arange(i + 1, i + 1 + length)
            counters[cols] += counters1[i_range]
            scores[cols] += scores1[i_range]
            colmap1[i_range] = cols
            i += length

            counters[cols, GAP_OPEN] += cat_arr[:, 0]
            counters[cols, GAP_EXT] += cat_arr[:, 1]
            counters[cols, GAP_TERM_OPEN] += cat_arr[:, 2]
            counters[cols, GAP_TERM_EXT] += cat_arr[:, 3]
            counters[cols, GAP] += size2
            gap_cost = (cat_arr[:, 0] * go + cat_arr[:, 1] * ge
                        + cat_arr[:, 2] * gto + cat_arr[:, 3] * gte)
            scores[np.ix_(cols, np.arange(NO_AMINOACIDS))] += gap_cost[:, None]

    assert i == w1 and j == w2

    # apply only the INSERTED gap-column runs to member sequences (the
    # reference's FinalizeGaps discipline, profile.cpp:1052-1106): a side
    # whose columns all survived contiguously costs ZERO per member -
    # remap_columns was O(card * size) per merge, which on chained guide
    # trees (sum of merge cardinalities ~n^2/2) dominated the 100k run
    def apply_side(profile, colmap, w_old):
        members = profile.data
        deltas_all = np.diff(colmap[:w_old + 1]) - 1
        sel = deltas_all > 0
        idxs = np.nonzero(sel)[0] + 1        # insert before OLD column i
        deltas = deltas_all[sel]
        trail = int(width - colmap[w_old])
        if len(idxs) == 0 and trail == 0:
            return
        lib = get_lib()
        if (lib is not None and len(members) > 1024
                and p.thr_internal_refinement == 0):
            # native batch (reference multithreads FinalizeGaps at the
            # same >=1024 threshold).  Safe because these members have
            # never been probed: position-line caches (_cum) are only
            # built by refinement/decode probes, and profiles that were
            # probed are <= 1000 members (refinement skip rule) or -ri
            # products (excluded by the thr_internal_refinement gate)
            ptrs, sizes = _gap_ptr_cache(profile)
            lib.apply_column_inserts_batch(
                ptrs, sizes, len(members),
                np.ascontiguousarray(idxs, dtype=np.int64),
                np.ascontiguousarray(deltas, dtype=np.int64),
                len(idxs), trail)
            return
        for gs in members:
            gs.apply_column_inserts(idxs, deltas, trail)

    apply_side(profile2, colmap2, w2)
    apply_side(profile1, colmap1, w1)

    dest.data = profile2.data + profile1.data
    if profile2._gap_ptrs is not None and profile1._gap_ptrs is not None:
        # carry the member-pointer cache forward: one concatenate instead
        # of an O(card) per-member rebuild at the next merge
        dest._gap_ptrs = np.concatenate([profile2._gap_ptrs,
                                         profile1._gap_ptrs])
        dest._gap_sizes = np.concatenate([profile2._gap_sizes,
                                          profile1._gap_sizes])
    profile1.data = []
    profile2.data = []

    n = len(dest.data)
    scores[0, GAP_OPEN] = go * n
    scores[0, GAP_EXT] = ge * n
    scores[0, GAP_TERM_OPEN] = gto * n
    scores[0, GAP_TERM_EXT] = gte * n

    dest.counters = counters
    dest.scores = scores
    return dest
