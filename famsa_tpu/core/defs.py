"""Alphabet, score-type and gap-category constants.

Semantics mirror the reference FAMSA data model
(/root/reference/src/core/defs.h:36-94): a 32-symbol alphabet where codes
0..23 are amino acids in the order "ARNDCQEGHILKMFPSTWYVBZX*", codes 25..28
are the four gap *categories* used by the profile machinery, 30 is a plain
gap and 31 a guard sentinel.  Scores are int64 fixed-point values obtained by
multiplying real-valued costs by COST_CAST_FACTOR=1000.
"""

import numpy as np

# fixed-point score representation
SCORE_DTYPE = np.int64
COST_CAST_FACTOR = 1000.0
INFTY = np.int64(1) << np.int64(62)

# symbol codes
GAP = 30
GAP_OPEN = 25
GAP_EXT = 26
GAP_TERM_EXT = 27
GAP_TERM_OPEN = 28
UNKNOWN_SYMBOL = 22
NO_SYMBOLS = 32
GUARD = NO_SYMBOLS - 1            # 31
NO_AMINOACIDS = 24
NO_VALID_AMINOACIDS = 20
NO_AMINOACIDS_AND_GAPS = 30

# "ARNDCQEGHILKMFPSTWYVBZX*" -> codes 0..23
MAPPING_TABLE = "ARNDCQEGHILKMFPSTWYVBZX*"
CHAR_TO_CODE = {c: i for i, c in enumerate(MAPPING_TABLE)}

# bit-vector word width used by the bit-parallel LCS
BV_SIZE = 64


def cpp_round(x: float) -> int:
    """C++ std::round - half away from zero (Python round() is banker's)."""
    import math
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def cpp_trunc(x: float) -> int:
    """C++ (int64_t) cast of a double - truncation toward zero."""
    return int(x)
