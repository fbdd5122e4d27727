"""Traceback + merged-profile construction.

Port of CProfile::ConstructProfile (/root/reference/src/core/profile.cpp:694-1002)
with one TPU-native substitution: instead of per-sequence incremental gap
insertion (the reference's DPS trees + v_gaps batches), the traceback emits
an old-column -> new-column map per child profile, and every member sequence
is rewritten with a single vectorized cumsum/diff (GappedSequence.remap_columns).
The column-level counter/score merging, including the gap-category transfer
corrections (profile.cpp:840-975), follows the reference step for step.
"""

import numpy as np

from .defs import (GAP, GAP_EXT, GAP_OPEN, GAP_TERM_EXT, GAP_TERM_OPEN,
                   NO_AMINOACIDS, NO_SYMBOLS, SCORE_DTYPE)
from .dp import D, H, V
from .profile import Profile


def _trace_path(res, w1, w2):
    """Walk the direction matrices from (w1,w2) to (0,0); returns the
    forward move list (length = new width).  Results from the device
    traceback (ops/dp_pallas.py:JaxPathResult) carry the path directly."""
    if getattr(res, "path", None) is not None:
        return res.path, res.total
    d0, h0, v0 = res.last
    if d0 >= h0 and d0 >= v0:
        dir_ = D
        total = d0
    elif h0 > v0:
        dir_ = H
        total = h0
    else:
        dir_ = V
        total = v0

    i, j = w1, w2
    path = [dir_]
    while i or j:
        if dir_ == D:
            dir_ = int(res.dirs_D[i, j])
            i -= 1
            j -= 1
        elif dir_ == H:
            dir_ = int(res.dirs_H[i, j])
            j -= 1
        else:
            dir_ = int(res.dirs_V[i, j])
            i -= 1
        path.append(dir_)
    path.reverse()
    # path[0] is the move into the boundary (cut); forward moves = path[1:]
    return path[1:], total


def _solve_starting(i, prof_width, prof_size, counters):
    """SolveGapsProblemWhenStarting (profile.cpp:1149-1220).
    Returns (n_open, n_ext, n_term_open, n_term_ext, tr, tr_term)."""
    if i == 0:
        return (0, 0, prof_size, 0, 0, int(counters[1, GAP_TERM_OPEN]))
    if i >= prof_width:
        cnt = int(counters[i, GAP_TERM_OPEN] + counters[i, GAP_TERM_EXT])
        return (0, 0, prof_size - cnt, cnt, 0, 0)
    n_term_open = int(counters[i + 1, GAP_TERM_OPEN])
    tr_term = n_term_open
    n_term_ext = int(counters[i, GAP_TERM_OPEN] + counters[i, GAP_TERM_EXT])
    n_ext = int(counters[i, GAP_OPEN] + counters[i, GAP_EXT])
    tr = int(counters[i + 1, GAP_OPEN])
    n_open = prof_size - n_ext - n_term_open - n_term_ext
    return (n_open, n_ext, n_term_open, n_term_ext, tr, tr_term)


def _solve_continuing(i, prof_width, prof_size, at_left):
    """SolveGapsProblemWhenContinuing (profile.cpp:1116-1146)."""
    if i == prof_width or i == 0:
        return (0, 0, 0, prof_size)
    ao, ae, ato, ate = at_left
    n_term_ext = ato + ate
    n_ext = ao + ae
    n_open = prof_size - n_ext - n_term_ext
    return (n_open, n_ext, 0, n_term_ext)


def construct_profile(dest: Profile, profile1: Profile, profile2: Profile, res):
    """Merge profile1/profile2 along the traceback into dest."""
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
    at_left1 = (0, 0, 0, 0)
    at_left2 = (0, 0, 0, 0)
    prev_dir = D
    i = j = 0

    def apply_transfer1(col):
        nonlocal tr1, tr1_term
        if tr1 or tr1_term:
            counters1[col, GAP_EXT] += tr1
            counters1[col, GAP_OPEN] -= tr1
            counters1[col, GAP_TERM_EXT] += tr1_term
            counters1[col, GAP_TERM_OPEN] -= tr1_term
            gap_cost = tr1 * (ge - go) + tr1_term * (gte - gto)
            scores1[col, :NO_AMINOACIDS] += gap_cost
            tr1 = tr1_term = 0

    def apply_transfer2(col):
        nonlocal tr2, tr2_term
        if tr2 or tr2_term:
            counters2[col, GAP_EXT] += tr2
            counters2[col, GAP_OPEN] -= tr2
            counters2[col, GAP_TERM_EXT] += tr2_term
            counters2[col, GAP_TERM_OPEN] -= tr2_term
            gap_cost = tr2 * (ge - go) + tr2_term * (gte - gto)
            scores2[col, :NO_AMINOACIDS] += gap_cost
            tr2 = tr2_term = 0

    for col0, dir_ in enumerate(path):
        col = col0 + 1
        if dir_ == D:
            i += 1
            j += 1
            apply_transfer1(i)
            apply_transfer2(j)
            at_left1 = (0, 0, 0, 0)
            at_left2 = (0, 0, 0, 0)
            counters[col] += counters1[i]
            counters[col] += counters2[j]
            scores[col] += scores1[i]
            scores[col] += scores2[j]
            colmap1[i] = col
            colmap2[j] = col
            prev_dir = D
        elif dir_ == H:
            # gap column inserted into profile1
            if prev_dir == H:
                n_open, n_ext, n_to, n_te = _solve_continuing(i, w1, size1, at_left1)
            else:
                n_open, n_ext, n_to, n_te, t, tt = _solve_starting(i, w1, size1, counters1)
                tr1 += t
                tr1_term = tt
            at_left1 = (n_open, n_ext, n_to, n_te)
            prev_dir = H
            counters[col, GAP_OPEN] += n_open
            counters[col, GAP_EXT] += n_ext
            counters[col, GAP_TERM_OPEN] += n_to
            counters[col, GAP_TERM_EXT] += n_te
            counters[col, GAP] += size1
            gap_cost = n_open * go + n_ext * ge + n_to * gto + n_te * gte
            scores[col, :NO_AMINOACIDS] += gap_cost
            apply_transfer2(j + 1)
            j += 1
            counters[col] += counters2[j]
            scores[col] += scores2[j]
            colmap2[j] = col
        else:
            # gap column inserted into profile2
            if prev_dir == V:
                n_open, n_ext, n_to, n_te = _solve_continuing(j, w2, size2, at_left2)
            else:
                n_open, n_ext, n_to, n_te, t, tt = _solve_starting(j, w2, size2, counters2)
                tr2 += t
                tr2_term = tt
            at_left2 = (n_open, n_ext, n_to, n_te)
            prev_dir = V
            apply_transfer1(i + 1)
            i += 1
            counters[col] += counters1[i]
            scores[col] += scores1[i]
            colmap1[i] = col
            counters[col, GAP_OPEN] += n_open
            counters[col, GAP_EXT] += n_ext
            counters[col, GAP_TERM_OPEN] += n_to
            counters[col, GAP_TERM_EXT] += n_te
            counters[col, GAP] += size2
            gap_cost = n_open * go + n_ext * ge + n_to * gto + n_te * gte
            scores[col, :NO_AMINOACIDS] += gap_cost

    assert i == w1 and j == w2

    # rewrite member sequences via the column maps
    for gs in profile2.data:
        gs.remap_columns(colmap2, width)
    for gs in profile1.data:
        gs.remap_columns(colmap1, width)

    dest.data = profile2.data + profile1.data
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
