"""Three-level logger (reference src/utils/log.h: NORMAL/VERBOSE/DEBUG)."""

import sys

LEVEL_NORMAL, LEVEL_VERBOSE, LEVEL_DEBUG = 0, 1, 2
_enabled = {LEVEL_NORMAL}


def enable(level):
    _enabled.add(level)


def log(level, msg, end="\n"):
    if level in _enabled:
        sys.stderr.write(msg + end)
        sys.stderr.flush()


def normal(msg, end="\n"):
    log(LEVEL_NORMAL, msg, end)


def verbose(msg, end="\n"):
    log(LEVEL_VERBOSE, msg, end)


def debug(msg, end="\n"):
    log(LEVEL_DEBUG, msg, end)


def progress(msg, level=LEVEL_DEBUG):
    """\\r-style progress line (reference MSTPrim.cpp:427-429,
    msa.cpp:412-424): rewrites the current line; shown at -vv like the
    reference's show_log/very_verbose gates."""
    if level in _enabled:
        sys.stderr.write(msg + "\r")
        sys.stderr.flush()


def progress_done(level=LEVEL_DEBUG):
    """Terminate a progress line."""
    if level in _enabled:
        sys.stderr.write("\n")
        sys.stderr.flush()
