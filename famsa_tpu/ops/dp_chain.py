"""Device-resident chain dispatcher: K consecutive serial merges in ONE
device program.

The adversarial case for progressive alignment is a chained (caterpillar)
guide tree: merge k+1 consumes merge k's profile, so the ~26 ms axon
round trip cannot be amortized by batching INDEPENDENT merges - at 100k
sequences ~99.9% of merges ran on the host for this reason (round-4
scheduler stats) and the chip idled through the alignment stage.  This
module runs a CHUNK of K chain merges inside one jitted lax.scan:

 - the chain profile's counters, width, and cardinality live on device
   across steps (the reference keeps the growing profile in memory the
   same way, queues.cpp:66-124 - here the "memory" is HBM);
 - each step is the width-agnostic giant kernel (ops/dp_giant.py
   _giant_core: staggered-fold DP, run-jumping traceback, on-device
   merged counters) against one LEAF row (chains merge one sequence at
   a time; the leaf ships as w1p symbol bytes in the scan xs);
 - only the packed O(W) paths leave the device - one pull per K merges
   instead of one round trip per merge; consecutive chunks chain through
   the carried device state, so chunk i+1 dispatches before chunk i is
   pulled and the device never drains;
 - a `valid` lane per step lets ONE compiled program serve every chunk
   length (invalid steps pass the carry through via lax.cond).

Host constructs (core/construct_fast.py) replay the pulled paths - the
same code as every other route, so probing/refinement semantics and the
byte-identical output contract are unchanged.
"""

import functools
import os

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from .dp_giant import BLK, FOLDS, _giant_core, lw_for
from .dp_pallas import MergedRef, PendingPaths

# chain leaf rows: every chain merges ONE sequence into the profile, so
# the row bucket only needs to cover a single padded sequence
CHAIN_W1P = 1024

CHAIN_K = int(os.environ.get("FAMSA_TPU_CHAIN_K", "32"))
# chains engage above this chain-profile width: below it the column
# padding of the fold kernel (8*lw lanes regardless of true width)
# costs more than the host's native DP on the true cells
CHAIN_MIN_W2 = int(os.environ.get("FAMSA_TPU_CHAIN_MIN_W2", "1536"))
# minimum chain-run length worth routing through the scan program.
# Measured on the 100k flagship (PERF.md round 5): per-RUN overheads
# (chain-state seed upload ~40-70 ms at spine widths, chunk dispatch +
# pull round trips) amortize only over long runs - the 100k tree's
# spine breaks into ~8-20-merge runs, where the device chain loses to
# the native host DP (76 ms vs ~8 ms per merge), so the default engages
# only on strongly-caterpillar trees (the adversarial case this route
# exists for; on multi-chip production hosts without the ~26 ms tunnel
# round trip the break-even run length is far lower - tune via env)
CHAIN_MIN_LEN = int(os.environ.get("FAMSA_TPU_CHAIN_MIN_LEN", "64"))
# optimistic per-in-flight-chunk width-growth margin for picking the
# fold variant (real growth is a few columns per chunk; overflow is
# detected at resolve and recovered)
CHAIN_MARGIN = int(os.environ.get("FAMSA_TPU_CHAIN_MARGIN", "512"))


def _npack(lw):
    s = CHAIN_W1P + FOLDS * lw
    return (-(-s // 16)) + 3


@functools.partial(jax.jit, static_argnames=("lw", "nl", "interpret"))
def _dp_chain_scan(chain_c, chain_w, chain_card, leaf_syms, leaf_w, valid,
                   sm, gp, lw, nl, interpret=False):
    """chain_c [GMAX_ROWS, 32] i32, chain_w/chain_card i32 scalars,
    leaf_syms [K, CHAIN_W1P] i8, leaf_w/valid [K] i32.  Returns
    (packs [K, npack] i32, final_c, final_w, final_card)."""
    npk = _npack(lw)

    def real(cc, cw, ccard, syms, lwid):
        packed, mc, m = _giant_core(
            None, syms, cc, None, lwid, cw, jnp.int32(1), ccard, sm, gp,
            lw=lw, w1p=CHAIN_W1P, blk=BLK, interpret=interpret,
            merged=True, nl=nl, want_width=True)
        return mc, m.astype(jnp.int32), ccard + jnp.int32(1), packed[0]

    def passthrough(cc, cw, ccard, syms, lwid):
        return cc, cw, ccard, jnp.zeros((npk,), jnp.int32)

    def step(carry, x):
        cc, cw, ccard = carry
        syms, lwid, v = x
        mc, nw, ncard, packed = jax.lax.cond(
            v != 0, real, passthrough, cc, cw, ccard, syms, lwid)
        return (mc, nw, ncard), packed

    (cfin, wfin, cardfin), packs = jax.lax.scan(
        step, (chain_c, chain_w.astype(jnp.int32),
               chain_card.astype(jnp.int32)),
        (leaf_syms, leaf_w.astype(jnp.int32), valid.astype(jnp.int32)))
    return packs, cfin, wfin, cardfin


@functools.partial(jax.jit, static_argnames=("rows",))
def _seed_state(counters, rows):
    """Upload/standardize a chain-start counter tensor to the fixed
    [rows, 32] carry shape (rows = dp_giant.GMAX_ROWS)."""
    out = jnp.zeros((rows, 32), jnp.int32)
    r = min(counters.shape[0], rows)
    return out.at[:r].set(counters[:r].astype(jnp.int32))


_SM_CACHE = {}


def _sm_dev(params):
    """Device copy of the score matrix, uploaded once per process (a
    fresh jnp.asarray per chunk costs a dispatch through the tunnel)."""
    key = id(params.score_matrix)
    hit = _SM_CACHE.get(key)
    if hit is None:
        hit = jnp.asarray(np.asarray(params.score_matrix, dtype=np.int64))
        _SM_CACHE.clear()
        _SM_CACHE[key] = hit
    return hit


class ChainState:
    """Device-resident chain carry between chunks."""
    __slots__ = ("c", "w", "card", "w_host", "card_host")

    def __init__(self, c, w, card, w_host, card_host):
        self.c = c                  # [GMAX_ROWS, 32] i32 device
        self.w = w                  # i32 device scalar
        self.card = card            # i32 device scalar
        self.w_host = w_host        # host width KNOWN at last resolve
        self.card_host = card_host

    @classmethod
    def seed(cls, profile, dev=None):
        """Start a chain from a profile: reuse its device-resident
        counters when present (a previous giant/chain result), else
        upload the host counters once."""
        from . import dp_giant
        rows = dp_giant.GMAX_ROWS
        if isinstance(dev, MergedRef) and dev.batch.shape[0] == 1 \
                and dev.batch.shape[1] == rows:
            c = dev.batch[0]
        elif dev is not None:
            t = dev.tensor() if isinstance(dev, MergedRef) else dev
            c = _seed_state(t, rows)
        else:
            c = _seed_state(jnp.asarray(profile.counters.astype(np.int32)),
                            rows)
        w = jnp.int32(profile.width)
        card = jnp.int32(len(profile.data))
        return cls(c, w, card, profile.width, len(profile.data))


def dispatch_chain_chunk(params, state, leaf_profiles, lw, card_bound,
                         interpret=False):
    """One chunk: merge len(leaf_profiles) leaves into the chain.
    Advances `state`'s device carry (c/w/card); the caller owns the
    host-side width/card bookkeeping (it must bound the chain width
    across in-flight chunks before picking lw).  Returns a PendingPaths
    whose resolve() yields the chunk's JaxPathResults in chain order."""
    k = CHAIN_K
    n = len(leaf_profiles)
    assert n <= k
    syms = np.full((k, CHAIN_W1P), 31, dtype=np.int8)
    lws = np.zeros(k, dtype=np.int32)
    valid = np.zeros(k, dtype=np.int32)
    for i, p in enumerate(leaf_profiles):
        gs = p.data[0]
        syms[i, :gs.size] = gs.symbols
        lws[i] = gs.size
        valid[i] = 1

    gp = (np.int64(params.gap_open), np.int64(params.gap_ext),
          np.int64(params.gap_term_open), np.int64(params.gap_term_ext))
    sm = _sm_dev(params)
    # 7-bit limb count for the merged-counter matmuls
    nl = 3 if card_bound < (1 << 21) else 4

    packs, cfin, wfin, cardfin = _dp_chain_scan(
        state.c, state.w, state.card, jnp.asarray(syms), jnp.asarray(lws),
        jnp.asarray(valid), sm, gp, lw=lw, nl=nl, interpret=interpret)

    state.c, state.w, state.card = cfin, wfin, cardfin
    return PendingPaths(packs[:n], n)


_PREWARMED = False


def prewarm(block=False):
    """Compile + first-execute the chain-scan programs (one per fold
    width) on tiny inputs, in a daemon thread, so the first real chain
    chunk of a run finds them warm (the remote AOT helper charges the
    first execution of each distinct program minutes)."""
    global _PREWARMED
    if _PREWARMED or os.environ.get("FAMSA_TPU_PREWARM", "1") != "1":
        return None
    if jax.default_backend() != "tpu":
        # Mosaic programs only exist on TPU; compiling them on the CPU
        # fallback backend wastes minutes and leaves a daemon compile
        # thread alive at interpreter exit (observed SIGABRT)
        return None
    _PREWARMED = True
    import threading

    from ..core.params import Params
    from . import dp_giant

    params = Params()
    params.adjust(100)
    gp = (np.int64(params.gap_open), np.int64(params.gap_ext),
          np.int64(params.gap_term_open), np.int64(params.gap_term_ext))
    sm = jnp.asarray(np.asarray(params.score_matrix, dtype=np.int64))
    rows = dp_giant.GMAX_ROWS

    def one(lw):
        k = CHAIN_K
        syms = np.full((k, CHAIN_W1P), 31, dtype=np.int8)
        syms[:, :8] = 0
        c = jnp.zeros((rows, 32), jnp.int32)
        out = _dp_chain_scan(
            c, jnp.int32(8), jnp.int32(2), jnp.asarray(syms),
            jnp.full((k,), 8, jnp.int32),
            jnp.concatenate([jnp.ones((1,), jnp.int32),
                             jnp.zeros((k - 1,), jnp.int32)]),
            sm, gp, lw=lw, nl=3)
        jax.block_until_ready(out)

    def run():
        for lw in dp_giant._LWS:
            try:
                one(lw)
            except Exception:
                pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    if block:
        t.join()
    return t
