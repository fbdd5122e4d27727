"""FAMSA-compatible command-line interface (port of src/famsa.cpp)."""

import sys
import time

from .core.io_service import (iter_fasta_records, load_fasta_records,
                              save_alignment)
from .core.params import parse_args
from .core.sequence import Sequence
from .pipeline import align_profiles, compute_msa
from .utils import logger


def main(argv=None):
    """Top-level entry with the reference's error handling
    (famsa.cpp:160-163: catch runtime errors, print a one-line
    "[ERROR] ..." message, exit -1 instead of a traceback)."""
    try:
        return _run(argv)
    except (RuntimeError, OSError, ValueError) as err:
        sys.stderr.write(f"\n[ERROR] {err}\n")
        return -1


def _run(argv=None):
    if argv is None:
        argv = sys.argv[1:]

    params, ok = parse_args(argv)
    if not ok:
        sys.stderr.write("Usage: famsa_tpu [options] <input_file> "
                         "[<input_file_2>] <output_file>\n")
        return 0

    if params.verbose_mode or params.very_verbose_mode:
        logger.enable(logger.LEVEL_VERBOSE)
    if params.very_verbose_mode:
        logger.enable(logger.LEVEL_DEBUG)
    t_total = time.perf_counter()

    if params.profile_aligning:
        recs1 = load_fasta_records(params.input_file_name)
        recs2 = load_fasta_records(params.input_file_name_2)
        for recs in (recs1, recs2):
            if not recs or len({len(s) for _, s in recs}) != 1:
                raise RuntimeError("Incorrect profile")
        params.adjust(len(recs1) + len(recs2))
        result = align_profiles(params, recs1, recs2)
        save_alignment(params.output_file_name, result,
                       params.gzip_level if params.gzipped_output else -1,
                       params.rare_column_threshold if params.remove_rare_columns else 1.0)
        return 0

    # streaming: sequences are built record by record, so peak RSS is the
    # encoded sequence storage, not 2x the (gunzipped) file size
    sequences = [Sequence(rid, rseq, i) for i, (rid, rseq)
                 in enumerate(iter_fasta_records(params.input_file_name))]
    if not sequences:
        raise RuntimeError("No (or incorrect) input file.")
    n_input = len(sequences)
    result = compute_msa(params, sequences)

    t_save = 0.0
    if result.alignment is not None:
        t0 = time.perf_counter()
        save_alignment(params.output_file_name, result.alignment,
                       params.gzip_level if params.gzipped_output else -1,
                       params.rare_column_threshold if params.remove_rare_columns else 1.0)
        t_save = time.perf_counter() - t0
        result.statistics.put("alignment.length", result.alignment[0].gapped_size)

    st = result.statistics
    st.put("input.n_sequences", n_input)
    st.put("time.save", t_save)
    st.put("time.total", time.perf_counter() - t_total)
    if params.verbose_mode or params.very_verbose_mode:
        logger.verbose("\n\nStatistics:\n" + st.to_string())
    if params.stats_file_name:
        with open(params.stats_file_name, "w") as f:
            f.write("[stats]\n" + st.to_string())
    return 0


if __name__ == "__main__":
    sys.exit(main())
