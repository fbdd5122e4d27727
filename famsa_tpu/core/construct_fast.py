"""Vectorized profile construction.

Equivalent to core/construct.py (the validated per-column port) but
merges counters/scores in ONE numpy pass over the whole path - O(1)
Python steps per merge (_merge_columns) instead of O(width) or O(#runs).

Key simplification (derived from the reference's gap-category recurrence,
profile.cpp:1116-1146): within a gap run the per-column category counts
converge after two columns -
  col 1: SolveGapsProblemWhenStarting;
  col 2: te2 = to1 + te1, ext2 = open1 + ext1, open2 = card - ext2 - te2;
  col m>=3: te = te2, ext = card - te2, open = 0 (interior runs)
           or te = card (boundary runs),
so whole runs merge with three vectorized adds."""

import concurrent.futures as _cf
import os as _os

import numpy as np

from ..native import get_lib
from .construct import _trace_path
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


def _may_probe(p, card):
    """True when the refinement stage may re-split/probe a profile of
    this cardinality (forced 'on', or 'auto' within the size limit):
    such members must never carry deferred or _cum-stale gap state."""
    mode = getattr(p, "refinement_mode", "auto")
    if mode == "off":
        return False
    if mode == "auto":
        return card <= p.thr_refinement
    return True


def _merge_columns(path, counters1, scores1, counters2, scores2,
                   w1, w2, size1, size2, go, ge, gto, gte):
    """Fully vectorized column merge: one numpy pass over the path
    instead of a Python loop over D/H/V runs (chained guide trees have
    hundreds of runs per merge; the run loop's ~15 numpy calls per run
    dominated the 100k alignment stage).  Exact port of
    core/construct.py's per-column recurrence using the closed forms in
    the module docstring; transfers are applied to the OUTPUT at the
    target column's consumption step instead of mutating the parents
    (each parent column is consumed exactly once, and later
    _solve_starting reads only transfer-invariant sums)."""
    e = np.asarray(path, dtype=np.int64)
    S = len(e)
    if S == 0:
        # degenerate merge of two zero-width parents: no columns
        return (np.zeros((1, NO_SYMBOLS), dtype=np.int64),
                np.zeros((1, NO_SYMBOLS), dtype=SCORE_DTYPE),
                np.zeros(w1 + 1, dtype=np.int64),
                np.zeros(w2 + 1, dtype=np.int64))
    isH = e == H
    isV = e == V
    adv1 = ~isH
    adv2 = ~isV
    i_k = np.cumsum(adv1)
    j_k = np.cumsum(adv2)
    prev = np.empty(S, np.int64)
    prev[0] = D
    prev[1:] = e[:-1]

    counters = np.zeros((S + 1, NO_SYMBOLS), dtype=np.int64)
    scores = np.zeros((S + 1, NO_SYMBOLS), dtype=SCORE_DTYPE)
    colmap1 = np.zeros(w1 + 1, dtype=np.int64)
    colmap2 = np.zeros(w2 + 1, dtype=np.int64)
    karr = np.arange(S)

    def side(c, s, w, size, isR, run_start, pos, colmap, adv):
        ak = np.nonzero(adv)[0]
        pc = pos[ak]
        counters[ak + 1] += c[pc]
        scores[ak + 1] += s[pc]
        colmap[pc] = ak + 1
        rk = np.nonzero(isR)[0]
        if len(rk) == 0:
            return
        st = np.nonzero(run_start)[0]
        pos_s = pos[st]
        nxt = np.minimum(pos_s + 1, w)
        on = pos_s < w
        t = np.where(on & (pos_s > 0), c[nxt, GAP_OPEN], 0)
        tt = np.where(on, c[nxt, GAP_TERM_OPEN], 0)
        sel = (t != 0) | (tt != 0)
        if sel.any():
            mcs = colmap[nxt[sel]]
            ts, tts = t[sel], tt[sel]
            counters[mcs, GAP_EXT] += ts
            counters[mcs, GAP_OPEN] -= ts
            counters[mcs, GAP_TERM_EXT] += tts
            counters[mcs, GAP_TERM_OPEN] -= tts
            scores[mcs, :NO_AMINOACIDS] += (ts * (ge - go)
                                            + tts * (gte - gto))[:, None]

        # run-start categories (_solve_starting, all three branches)
        cpos = c[pos_s]
        at0 = pos_s == 0
        atw = pos_s >= w
        te1 = np.where(at0, 0, cpos[:, GAP_TERM_OPEN] + cpos[:, GAP_TERM_EXT])
        to1 = np.where(at0, size,
                       np.where(atw, size - te1, c[nxt, GAP_TERM_OPEN]))
        e1 = np.where(at0 | atw, 0,
                      cpos[:, GAP_OPEN] + cpos[:, GAP_EXT])
        o1 = np.where(at0 | atw, 0, size - e1 - to1 - te1)
        te2 = to1 + te1
        e2 = o1 + e1
        o2 = size - e2 - te2
        bnd_s = at0 | atw

        # per-column values via run id + 1-based position in run
        seg = np.maximum.accumulate(np.where(run_start, karr, -1))
        q = karr - seg + 1
        run_id = np.cumsum(run_start) - 1
        rid = run_id[rk]
        qq = q[rk]
        o = np.where(qq == 1, o1[rid], np.where(qq == 2, o2[rid], 0))
        ee = np.where(qq == 1, e1[rid],
                      np.where(qq == 2, e2[rid], size - te2[rid]))
        to = np.where(qq == 1, to1[rid], 0)
        te = np.where(qq == 1, te1[rid], te2[rid])
        cont = (qq > 1) & bnd_s[rid]
        o = np.where(cont, 0, o)
        ee = np.where(cont, 0, ee)
        to = np.where(cont, 0, to)
        te = np.where(cont, size, te)
        counters[rk + 1, GAP_OPEN] += o
        counters[rk + 1, GAP_EXT] += ee
        counters[rk + 1, GAP_TERM_OPEN] += to
        counters[rk + 1, GAP_TERM_EXT] += te
        counters[rk + 1, GAP] += size
        gap_cost = o * go + ee * ge + to * gto + te * gte
        scores[rk + 1, :NO_AMINOACIDS] += gap_cost[:, None]

    side(counters1, scores1, w1, size1, isH, isH & (prev != H), i_k,
         colmap1, adv1)
    side(counters2, scores2, w2, size2, isV, isV & (prev != V), j_k,
         colmap2, adv2)
    return counters, scores, colmap1, colmap2


# deferred member gap application: the alignment stage's serial (chain)
# sections leave a core idle while the main thread runs DP(k+1); the
# FinalizeGaps-style member updates of merge k are order-independent of
# DP/counter work (DP needs only counters/scores), so they run on ONE
# background worker in submission order (FIFO = construct order = the
# per-member apply order, preserving byte identity).  Gated to runs
# where no member is probed mid-alignment (no refinement products).
_GAP_POOL = None
_GAP_FUTS = []
_GAP_LOCK = __import__("threading").Lock()
_DEFER_GAPS = _os.environ.get("FAMSA_TPU_DEFER_GAPS", "1") == "1"


def _gap_worker():
    global _GAP_POOL
    if _GAP_POOL is None:
        with _GAP_LOCK:
            if _GAP_POOL is None:
                # ONE worker: FIFO submission order = construct order =
                # the per-member apply order (constructs that touch the
                # same members are happens-before ordered by the
                # scheduler's child-before-parent dependency)
                _GAP_POOL = _cf.ThreadPoolExecutor(max_workers=1)
    return _GAP_POOL


def drain_gap_queue():
    """Block until every deferred member gap application has run
    (call before anything probes member sequences: refinement, decode,
    total-score, output)."""
    global _GAP_FUTS
    futs, _GAP_FUTS = _GAP_FUTS, []
    for f in futs:
        f.result()


def reset_gap_queue():
    """Discard any deferred applications left over from a FAILED run
    (call at alignment start: a compute_msa that raised mid-stage leaves
    stale futures whose exceptions would surface in the NEXT run)."""
    global _GAP_FUTS
    futs, _GAP_FUTS = _GAP_FUTS, []
    for f in futs:
        f.cancel()
        if not f.cancelled():
            try:
                f.result()
            except Exception:
                pass


def construct_profile_fast(dest: Profile, profile1: Profile, profile2: Profile, res):
    p = dest.params
    go, ge = p.gap_open, p.gap_ext
    gto, gte = p.gap_term_open, p.gap_term_ext

    w1, w2 = profile1.width, profile2.width
    size1, size2 = len(profile1.data), len(profile2.data)

    path, total_score = _trace_path(res, w1, w2)
    width = len(path)
    dest.total_score = total_score
    dest.width = width

    counters, scores, colmap1, colmap2 = _merge_columns(
        path, profile1.counters, profile1.scores,
        profile2.counters, profile2.scores,
        w1, w2, size1, size2, go, ge, gto, gte)

    # every parent column must have been consumed exactly once
    assert len(path) == 0 or (colmap1[w1] > 0 or w1 == 0)
    assert len(path) == 0 or (colmap2[w2] > 0 or w2 == 0)

    # apply only the INSERTED gap-column runs to member sequences (the
    # reference's FinalizeGaps discipline, profile.cpp:1052-1106): a side
    # whose columns all survived contiguously costs ZERO per member -
    # remap_columns was O(card * size) per merge, which on chained guide
    # trees (sum of merge cardinalities ~n^2/2) dominated the 100k run
    def plan_side(profile, colmap, w_old):
        """(members, ptrs|None, idxs, deltas, trail) - everything the
        (possibly deferred) execution needs, captured on the main thread
        BEFORE the parent's data list is cleared."""
        members = profile.data
        deltas_all = np.diff(colmap[:w_old + 1]) - 1
        sel = deltas_all > 0
        idxs = np.ascontiguousarray(np.nonzero(sel)[0] + 1, dtype=np.int64)
        deltas = np.ascontiguousarray(deltas_all[sel], dtype=np.int64)
        trail = int(width - colmap[w_old])
        if len(idxs) == 0 and trail == 0:
            return None
        ptrs = None
        if (get_lib() is not None and len(members) > 1024
                and p.thr_internal_refinement == 0
                and not _may_probe(p, len(members))):
            # native batch (reference multithreads FinalizeGaps at the
            # same >=1024 threshold).  Safe because these members have
            # never been probed: position-line caches (_cum) are only
            # built by refinement/decode probes, and profiles that were
            # probed are <= 1000 members (refinement skip rule) or -ri
            # products (excluded by the thr_internal_refinement gate)
            ptrs = _gap_ptr_cache(profile)
        return members, ptrs, idxs, deltas, trail

    def exec_side(plan):
        if plan is None:
            return
        members, ptrs, idxs, deltas, trail = plan
        if ptrs is not None:
            ptr_a, sizes = ptrs
            get_lib().apply_column_inserts_batch(
                ptr_a, sizes, len(members), idxs, deltas, len(idxs), trail)
            return
        for gs in members:
            gs.apply_column_inserts(idxs, deltas, trail)

    plan2 = plan_side(profile2, colmap2, w2)
    plan1 = plan_side(profile1, colmap1, w1)
    # defer only when refinement can never probe these members after
    # this construct (cards only grow up the tree, so a small merge's
    # ancestors were never deferred either)
    if _DEFER_GAPS and p.thr_internal_refinement == 0 \
            and size1 + size2 > 1024 \
            and not _may_probe(p, size1 + size2) \
            and (plan1 is not None or plan2 is not None):

        def _apply_deferred():
            exec_side(plan2)
            exec_side(plan1)

        _GAP_FUTS.append(_gap_worker().submit(_apply_deferred))
    else:
        exec_side(plan2)
        exec_side(plan1)

    dest.data = profile2.data + profile1.data
    if len(dest.data) > 256:
        # carry the member-pointer cache forward: one concatenate instead
        # of an O(card) per-member rebuild at the next merge.  Missing
        # parent caches (leaves, small host merges) are built here while
        # they are CHEAP - waiting until both parents happen to have one
        # meant a full O(card) rebuild on every prof-leaf chain merge
        ptrs2, sizes2 = _gap_ptr_cache(profile2)
        ptrs1, sizes1 = _gap_ptr_cache(profile1)
        dest._gap_ptrs = np.concatenate([ptrs2, ptrs1])
        dest._gap_sizes = np.concatenate([sizes2, sizes1])
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
