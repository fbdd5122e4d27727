"""Native (C++) DP dispatch with NumPy fallback.

The native kernels are scalar ports of the validated NumPy reference DP
(core/dp.py); the seq-prof case runs through the prof-prof kernel (same
recurrence for cardinality-1 profiles, incl. guided bands)."""

import numpy as np

from ..native import get_lib
from . import dp as dp_np
from .dp import DPResult, find_row_ranges
from .profile import Profile


class NativeDPResult:
    __slots__ = ("dirs_D", "dirs_H", "dirs_V", "last", "path", "total")


def _finish(lib, dirs, w1, w2, last):
    """Native traceback on the packed direction matrix: construct's
    _trace_path short-circuits on .path, skipping both the O(W^2)
    unpack and the per-step Python walk."""
    res = NativeDPResult()
    res.last = (int(last[0]), int(last[1]), int(last[2]))
    buf = np.empty(w1 + w2 + 2, dtype=np.int64)
    tot = np.empty(1, dtype=np.int64)
    n = lib.trace_path(dirs, w1, w2, res.last[0], res.last[1], res.last[2],
                       buf, tot)
    res.path = buf[1:n]
    res.total = int(tot[0])
    res.dirs_D = res.dirs_H = res.dirs_V = None
    return res


def _row_ranges_array(params, w1, column_mapping1, column_mapping2):
    if column_mapping1 is None or column_mapping2 is None:
        return None
    rr = find_row_ranges(column_mapping1, column_mapping2,
                         params.guided_alignment_radius)
    out = np.zeros((w1 + 2, 2), dtype=np.int64)
    for i, (lo, hi) in enumerate(rr[:w1 + 2]):
        out[i, 0] = lo
        out[i, 1] = hi
    return out


def dp_seq_seq(params, profile1, profile2):
    lib = get_lib()
    if lib is None:
        return dp_np.dp_seq_seq(params, profile1, profile2)
    w1, w2 = profile1.width, profile2.width
    seq1 = np.ascontiguousarray(profile1.data[0].symbols)
    seq2 = np.ascontiguousarray(profile2.data[0].symbols)
    dirs = np.empty((w1 + 1, w2 + 1), dtype=np.uint8)
    last = np.empty(3, dtype=np.int64)
    lib.dp_seq_seq(seq1, seq2, w1, w2,
                   np.ascontiguousarray(params.score_matrix),
                   params.gap_open, params.gap_ext,
                   params.gap_term_open, params.gap_term_ext, dirs, last)
    return _finish(lib, dirs, w1, w2, last)


def _dp_profile(params, profile1, profile2, column_mapping1, column_mapping2):
    lib = get_lib()
    w1, w2 = profile1.width, profile2.width
    rr = _row_ranges_array(params, w1, column_mapping1, column_mapping2)
    dirs = np.empty((w1 + 1, w2 + 1), dtype=np.uint8)
    last = np.empty(3, dtype=np.int64)
    rr_ptr = rr.ctypes.data if rr is not None else None
    lib.dp_prof_prof(
        np.ascontiguousarray(profile1.counters),
        np.ascontiguousarray(profile1.scores), w1, len(profile1.data),
        np.ascontiguousarray(profile2.counters),
        np.ascontiguousarray(profile2.scores), w2, len(profile2.data),
        params.gap_open, params.gap_ext,
        params.gap_term_open, params.gap_term_ext,
        rr_ptr, dirs, last)
    return _finish(lib, dirs, w1, w2, last)


def dp_seq_prof(params, profile1, profile2, column_mapping1=None,
                column_mapping2=None):
    if get_lib() is None:
        return dp_np.dp_seq_prof(params, profile1, profile2,
                                 column_mapping1, column_mapping2)
    return _dp_profile(params, profile1, profile2,
                       column_mapping1, column_mapping2)


def dp_prof_prof(params, profile1, profile2, column_mapping1=None,
                 column_mapping2=None):
    if get_lib() is None:
        return dp_np.dp_prof_prof(params, profile1, profile2,
                                  column_mapping1, column_mapping2)
    return _dp_profile(params, profile1, profile2,
                       column_mapping1, column_mapping2)
