"""Scoring-matrix selection and fixed-point conversion.

Mirrors /root/reference/src/core/scoring_matrix.h:130-172 (matrix registry)
and /root/reference/src/msa.cpp:59-79 (conversion to int64 fixed point via
round(value * 1000)).
"""

import numpy as np

from .defs import NO_AMINOACIDS, SCORE_DTYPE, COST_CAST_FACTOR, cpp_round
from . import scoring_data

_MATRICES = {
    "MIQS": scoring_data.MIQS,
    "PFASUM31": scoring_data.PFASUM31,
    "PFASUM43": scoring_data.PFASUM43,
    "PFASUM60": scoring_data.PFASUM60,
}


def matrix_from_name(name: str):
    key = name.upper()
    if key not in _MATRICES:
        raise ValueError(f"Error: Illegal scoring matrix type: {name}")
    return key


def get_score_matrix_int(name: str) -> np.ndarray:
    """[24,24] int64 matrix of round(score * 1000)."""
    raw = _MATRICES[matrix_from_name(name)]
    out = np.zeros((NO_AMINOACIDS, NO_AMINOACIDS), dtype=SCORE_DTYPE)
    for i in range(NO_AMINOACIDS):
        for j in range(NO_AMINOACIDS):
            out[i, j] = cpp_round(raw[i][j] * COST_CAST_FACTOR)
    return out
