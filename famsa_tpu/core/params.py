"""Run-time parameters and FAMSA-compatible CLI parsing.

Mirrors /root/reference/src/core/params.{h,cpp}: identical flags, defaults
and fixed-point gap-cost derivation (round(-1000*base)), plus the gap-cost
rescaling by 1 + log2(n/45)/7 from /root/reference/src/msa.cpp:83-106.
"""

import math
from dataclasses import dataclass, field

import numpy as np

from .defs import SCORE_DTYPE, COST_CAST_FACTOR, cpp_round, cpp_trunc
from .scoring import get_score_matrix_int

REFINE_ON, REFINE_OFF, REFINE_AUTO = "on", "off", "auto"

GT_SLINK = "slink"
GT_MST_PRIM = "sl"          # default; CLI name "sl" maps to MST+Prim
GT_UPGMA = "upgma"
GT_UPGMA_MODIFIED = "upgma_modified"
GT_NJ = "nj"
GT_IMPORTED = "import"

HEUR_NONE = "none"
HEUR_PARTTREE = "parttree"
HEUR_MEDOIDTREE = "medoidtree"

DIST_INDEL_DIV_LCS = "indel_div_lcs"
DIST_INDEL075_DIV_LCS = "indel075_div_lcs"
DIST_PID = "pairwise_identity"


@dataclass
class MedoidParams:
    subtree_size: int = 100
    sample_size: int = 2000
    num_evaluations: int = 1
    threshold: int = 2000
    cluster_fraction: float = 0.1
    cluster_iters: int = 2


@dataclass
class Params:
    # gap cost bases (positive; stored costs are negative fixed-point)
    gap_open_base: float = 14.85
    gap_ext_base: float = 1.25
    gap_term_open_base: float = 0.66
    gap_term_ext_base: float = 0.66

    matrix_type: str = "PFASUM43"

    # derived int64 costs (negative)
    gap_open: int = 0
    gap_ext: int = 0
    gap_term_open: int = 0
    gap_term_ext: int = 0

    scaler_div: int = 7
    scaler_log: int = 45
    guided_alignment_radius: int = 50

    enable_gap_rescaling: bool = True
    enable_gap_optimization: bool = True
    enable_total_score_calculation: bool = True

    refinement_mode: str = REFINE_AUTO
    n_refinements: int = 100
    thr_refinement: int = 1000
    thr_internal_refinement: int = 0

    gt_method: str = GT_MST_PRIM
    gt_heuristic: str = HEUR_NONE
    distance: str = DIST_INDEL075_DIV_LCS
    guide_tree_seed: int = 0
    medoid: MedoidParams = field(default_factory=MedoidParams)

    guide_tree_in_file: str = ""
    export_distances: bool = False
    export_tree: bool = False
    generate_square_matrix: bool = False
    calculate_pid: bool = False
    keep_duplicates: bool = False

    n_threads: int = 0
    gzipped_output: bool = False
    gzip_level: int = 7
    remove_rare_columns: bool = False
    rare_column_threshold: float = 0.1

    verbose_mode: bool = False
    very_verbose_mode: bool = False

    profile_aligning: bool = False
    input_file_name: str = ""
    input_file_name_2: str = ""
    output_file_name: str = ""
    seed_file_name: str = ""
    stats_file_name: str = ""

    # compute backend: "numpy" (scalar reference) or "jax" (TPU path)
    backend: str = "auto"

    score_matrix: np.ndarray = None     # [24,24] int64

    def __post_init__(self):
        self.recompute_gap_costs()

    def recompute_gap_costs(self):
        self.gap_open = cpp_round(-COST_CAST_FACTOR * self.gap_open_base)
        self.gap_ext = cpp_round(-COST_CAST_FACTOR * self.gap_ext_base)
        self.gap_term_open = cpp_round(-COST_CAST_FACTOR * self.gap_term_open_base)
        self.gap_term_ext = cpp_round(-COST_CAST_FACTOR * self.gap_term_ext_base)

    def resolve_backend(self):
        """'auto' -> 'jax' when the default JAX backend is a TPU (the
        production device path: Pallas DP/LCS kernels, device Prim), else
        'numpy' (the exact host reference).  Both produce byte-identical
        output; 'auto' simply dispatches to the accelerator when one is
        attached."""
        if self.backend == "auto":
            try:
                import jax
                self.backend = ("jax" if jax.default_backend() == "tpu"
                                else "numpy")
            except Exception:
                self.backend = "numpy"
        return self.backend

    def adjust(self, n_seqs: int):
        """Gap rescaling + heuristic gating + score-matrix materialization
        (reference CFAMSA::adjustParams, msa.cpp:83-106)."""
        self.resolve_backend()
        if self.gt_heuristic != HEUR_NONE and n_seqs < self.medoid.threshold:
            self.gt_heuristic = HEUR_NONE

        if self.enable_gap_rescaling:
            if n_seqs < self.scaler_log:
                gap_scaler = 1.0
            else:
                gap_scaler = 1.0 + (math.log2(n_seqs / float(self.scaler_log)) / self.scaler_div)
            self.gap_ext = cpp_trunc(self.gap_ext * gap_scaler)
            self.gap_open = cpp_trunc(self.gap_open * gap_scaler)
            self.gap_term_ext = cpp_trunc(self.gap_term_ext * gap_scaler)
            self.gap_term_open = cpp_trunc(self.gap_term_open * gap_scaler)

        self.score_matrix = get_score_matrix_int(self.matrix_type)


_GT_FROM_STRING = {
    "sl": GT_MST_PRIM,
    "slink": GT_SLINK,
    "upgma": GT_UPGMA,
    "upgma_modified": GT_UPGMA_MODIFIED,
    "nj": GT_NJ,
    "import": GT_IMPORTED,
}


def _find_switch(args, name):
    if name in args:
        args.remove(name)
        return True
    return False


def _find_option(args, name, cast):
    """Reference findOption: search up to (not incl.) the last element."""
    for i in range(len(args) - 1):
        if args[i] == name:
            try:
                v = cast(args[i + 1])
            except ValueError:
                return None
            del args[i:i + 2]
            return v
    return None


def parse_args(argv):
    """Parse FAMSA-style argv (without program name).

    Returns (params, ok). On failure params holds defaults, ok False.
    """
    p = Params()
    args = list(argv)

    if _find_switch(args, "-help"):
        return p, False
    if len(args) < 2:
        return p, False

    for name, attr, cast in [
        ("-go", "gap_open_base", float), ("-ge", "gap_ext_base", float),
        ("-tgo", "gap_term_open_base", float), ("-tge", "gap_term_ext_base", float),
        ("-gsd", "scaler_div", int), ("-gsl", "scaler_log", int),
        ("-r", "n_refinements", int), ("-rt", "thr_refinement", int),
        ("-ri", "thr_internal_refinement", int),
        ("-t", "n_threads", int),
    ]:
        v = _find_option(args, name, cast)
        if v is not None:
            setattr(p, attr, v)

    p.enable_gap_rescaling = not _find_switch(args, "-dgr")
    p.enable_gap_optimization = not _find_switch(args, "-dgo")
    p.enable_total_score_calculation = not _find_switch(args, "-dsp")

    v = _find_option(args, "-refine_mode", str)
    if v is not None:
        if v not in (REFINE_ON, REFINE_OFF, REFINE_AUTO):
            raise ValueError("Error: Illegal refinement mode.")
        p.refinement_mode = v

    v = _find_option(args, "-sm", str)
    if v is not None:
        from .scoring import matrix_from_name
        p.matrix_type = matrix_from_name(v)

    # "-gt <method>"; for "import" the file name follows immediately
    for i in range(len(args) - 1):
        if args[i] == "-gt":
            v = args[i + 1]
            if v not in _GT_FROM_STRING:
                raise ValueError("Error: Illegal guide tree method.")
            p.gt_method = _GT_FROM_STRING[v]
            del args[i:i + 2]
            if p.gt_method == GT_IMPORTED and i < len(args):
                p.guide_tree_in_file = args.pop(i)
            break

    v = _find_option(args, "-dist", str)
    if v is not None:
        if v not in (DIST_INDEL_DIV_LCS, DIST_INDEL075_DIV_LCS):
            raise ValueError("Error: Illegal pairwise distance measure.")
        p.distance = v

    if _find_switch(args, "-parttree"):
        p.gt_heuristic = HEUR_PARTTREE
    if _find_switch(args, "-medoidtree"):
        p.gt_heuristic = HEUR_MEDOIDTREE

    for name, attr, cast in [
        ("-medoid_threshold", "threshold", int), ("-subtree_size", "subtree_size", int),
        ("-sample_size", "sample_size", int), ("-num_evals", "num_evaluations", int),
        ("-cluster_fraction", "cluster_fraction", float), ("-cluster_iters", "cluster_iters", int),
    ]:
        v2 = _find_option(args, name, cast)
        if v2 is not None:
            setattr(p.medoid, attr, v2)

    p.export_tree = _find_switch(args, "-gt_export")
    p.export_distances = _find_switch(args, "-dist_export")
    p.generate_square_matrix = _find_switch(args, "-square_matrix")
    p.calculate_pid = _find_switch(args, "-pid")
    p.gzipped_output = _find_switch(args, "-gz")

    v = _find_option(args, "-dump_seeds", str)
    if v is not None:
        p.seed_file_name = v

    g_lev = _find_option(args, "-gz-lev", int)
    if g_lev is None:
        g_lev = _find_option(args, "-gz_lev", int)
    if g_lev is not None and 0 <= g_lev <= 12:
        p.gzip_level = g_lev

    rct = _find_option(args, "-trim_columns", float)
    if rct is not None and 0 <= rct < 1.0:
        p.remove_rare_columns = True
        p.rare_column_threshold = rct

    p.keep_duplicates = _find_switch(args, "-keep-duplicates") or _find_switch(args, "-keep_duplicates")

    p.verbose_mode = _find_switch(args, "-v")
    p.very_verbose_mode = _find_switch(args, "-vv")

    v = _find_option(args, "-stats", str)
    if v is not None:
        p.stats_file_name = v

    v = _find_option(args, "-backend", str)
    if v is not None:
        p.backend = v

    if p.gt_method == GT_IMPORTED and not p.guide_tree_in_file:
        return p, False

    if len(args) < 2 or len(args) > 3:
        return p, False
    if len(args) == 2:
        p.input_file_name, p.output_file_name = args
    else:
        p.input_file_name, p.input_file_name_2, p.output_file_name = args
        p.profile_aligning = True

    p.recompute_gap_costs()

    if p.n_threads == 0:
        import os
        p.n_threads = max(1, (os.cpu_count() or 2) // 2)

    return p, True
