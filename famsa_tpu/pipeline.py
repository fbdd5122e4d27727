"""End-to-end MSA pipeline (port of /root/reference/src/msa.cpp CFAMSA).

Stages: sort+dedup -> guide tree (device-batched distances) -> progressive
profile alignment up the tree -> iterative refinement -> duplicate
restoration and input-order output."""

import os
import sys

import numpy as np

from .utils import logger
from .utils.stats import Statistics, StopWatch

from .core import params as P
from .core.aligner import align_into
from .core.defs import UNKNOWN_SYMBOL
from .core.profile import Profile
from .core.refinement import refine_alignment
from .core.sequence import GappedSequence, Sequence
from .ops.distance import get_distance_backend
from .tree.fast_tree import FastTree
from .tree.guide_tree import GuideTree
from .tree.mst_prim import mst_prim_tree
from .tree.nj import nj_tree
from .tree.slink import slink_tree
from .tree.upgma import upgma_distance_matrix, upgma_tree


# ----------------------------------------------------------------------
def sort_and_extend(sequences):
    """Stable sort by (length desc, data lexicographic asc) + pad to max
    (msa.cpp:245-279)."""
    order = sorted(range(len(sequences)),
                   key=lambda i: (-sequences[i].length,
                                  sequences[i].data.tobytes()))
    out = [sequences[i] for i in order]
    max_len = out[0].length if out else 0
    for s in out:
        s.resize(max_len, UNKNOWN_SYMBOL)
    return out


def remove_duplicates(sorted_seqs, original2sorted):
    """msa.cpp:338-356; sorted_seqs filtered in place."""
    uniq = [sorted_seqs[0]]
    cur = 0
    for i in range(1, len(sorted_seqs)):
        a, b = sorted_seqs[i], sorted_seqs[i - 1]
        same = (a.length == b.length
                and np.array_equal(a.data[:a.length], b.data[:b.length]))
        if not same:
            cur += 1
            uniq.append(sorted_seqs[i])
        original2sorted[i] = cur
    return uniq


# ----------------------------------------------------------------------
def _make_partial_generator(params, measure):
    """Partial generator used by FastTree (createTreeGenerator semantics)."""
    method = params.gt_method
    backend = params.backend

    def partial(seqs, tree_list):
        if len(seqs) < 2:
            return
        if method in (P.GT_SLINK, P.GT_MST_PRIM):
            be = get_distance_backend(seqs, measure, np.float64, backend)
            slink_tree(len(seqs), lambda i: be.row_prefix(i, i), tree_list)
        elif method in (P.GT_UPGMA, P.GT_UPGMA_MODIFIED):
            be = get_distance_backend(seqs, measure, np.float32, backend)
            dmat = upgma_distance_matrix(len(seqs), lambda i: be.row_prefix(i, i))
            upgma_tree(dmat, len(seqs), tree_list,
                       modified=(method == P.GT_UPGMA_MODIFIED))
        elif method == P.GT_NJ:
            be = get_distance_backend(seqs, measure, np.float32, backend)
            dmat = upgma_distance_matrix(len(seqs), lambda i: be.row_prefix(i, i))
            nj_tree(dmat, len(seqs), tree_list)
        else:
            raise ValueError("Error: Illegal guide tree method.")

    return partial


def build_guide_tree(params, sequences, tree: GuideTree):
    """createTreeGenerator + run (msa.cpp:109-242, 570-573)."""
    measure = params.distance
    backend = params.backend
    n = len(sequences)
    tree.init_leaves(n)
    tree_list = tree.tree

    if params.gt_heuristic != P.HEUR_NONE:
        ft = FastTree(
            measure,
            _make_partial_generator(params, measure),
            params.medoid.subtree_size,
            params.medoid.sample_size,
            params.medoid.num_evaluations,
            params.medoid.threshold,
            use_clustering=(params.gt_heuristic == P.HEUR_MEDOIDTREE),
            cluster_fraction=params.medoid.cluster_fraction,
            cluster_iters=params.medoid.cluster_iters,
            seed_observer=_make_seed_dumper(params) if params.seed_file_name else None,
            # concurrent depth-0 subtree builds on the host path; the jax
            # backend serializes on the one device, so keep it sequential
            n_threads=1 if backend == "jax" else (os.cpu_count() or 1),
            # medoid-path distances (seeds/assignment/CLARANS sample) ride
            # the device LCS kernel on the jax backend
            # (reference FastTree.cpp:302-330, 385-436)
            backend_factory=(
                (lambda seqs, dtype: get_distance_backend(
                    seqs, measure, dtype, backend))
                if backend == "jax" else None),
        )
        ft.run(sequences, tree_list)
        return

    if params.gt_method == P.GT_SLINK:
        be = get_distance_backend(sequences, measure, np.float64, backend)
        slink_tree(n, lambda i: be.row_prefix(i, i), tree_list)
    elif params.gt_method == P.GT_MST_PRIM:
        if backend == "jax" and measure == P.DIST_INDEL075_DIV_LCS:
            from .parallel.mesh import auto_mesh
            mesh = auto_mesh("rows")
            if mesh is not None and n >= mesh.devices.size:
                # multi-chip: whole Prim loop sharded over the mesh
                from .parallel.dist_sharded import mst_prim_tree_sharded
                mst_prim_tree_sharded(sequences, tree_list, mesh)
            else:
                # whole-tree Prim in one device program (ops/prim_device.py)
                from .ops.prim_device import mst_prim_tree_device

                cb = None
                if not params.export_tree:
                    # alignment follows: compile its device programs in
                    # the shadow of the remaining tree rounds (the AOT
                    # helper is serial, so this must start only after
                    # the Prim round program itself is compiled)
                    def cb():
                        from .ops.dp_chain import prewarm as chain_prewarm
                        from .ops.dp_giant import prewarm as giant_prewarm
                        giant_prewarm()
                        chain_prewarm()
                mst_prim_tree_device(sequences, tree_list,
                                     after_first_chunk=cb)
        else:
            be = get_distance_backend(sequences, measure, np.float64, backend)
            mst_prim_tree(n, lambda ref, ids: be.row(ref, ids), tree_list,
                          lengths=[s.length for s in sequences],
                          measure=measure)
    elif params.gt_method in (P.GT_UPGMA, P.GT_UPGMA_MODIFIED):
        be = get_distance_backend(sequences, measure, np.float32, backend)
        dmat = upgma_distance_matrix(n, lambda i: be.row_prefix(i, i))
        upgma_tree(dmat, n, tree_list,
                   modified=(params.gt_method == P.GT_UPGMA_MODIFIED))
    elif params.gt_method == P.GT_NJ:
        be = get_distance_backend(sequences, measure, np.float32, backend)
        dmat = upgma_distance_matrix(n, lambda i: be.row_prefix(i, i))
        nj_tree(dmat, n, tree_list)
    else:
        raise ValueError("Error: Illegal guide tree method.")


def _make_seed_dumper(params):
    f = open(params.seed_file_name, "w")

    def dump(seeds, depth):
        if depth == 0:
            for s in seeds:
                f.write(s.id[1:] + "\n")
            f.flush()
    return dump


# ----------------------------------------------------------------------
def compute_alignment(params, gapped_sequences, tree_list):
    """Progressive alignment up the guide tree (msa.cpp:360-438).

    gapped_sequences: list of GappedSequence for leaves (mapped order).
    Any topological order yields identical output because each merge is
    deterministic; with the jax backend, independent merges of a level are
    batched into single vmapped device launches (the TPU analog of the
    reference's CProfileQueue task parallelism, queues.cpp:66-124)."""
    from .core.construct_fast import reset_gap_queue
    reset_gap_queue()          # discard stale futures from a failed run
    if params.backend == "jax" and len(gapped_sequences) > 2:
        return _compute_alignment_batched(params, gapped_sequences, tree_list)

    n = len(gapped_sequences)
    profiles = {}
    ref_thr = params.thr_internal_refinement
    n_done = n

    for node_id in range(len(tree_list)):
        a, b = tree_list[node_id]
        if node_id < n:
            continue
        n_done += 1
        if n_done % 100 == 0:
            logger.progress(f"Computing alignment - "
                            f"{100.0 * n_done / (2 * n - 1):.1f}%"
                            f"    ({n_done} of {2 * n - 1})")
        for child in (a, b):
            if child < n and child not in profiles:
                profiles[child] = Profile.from_gapped_sequence(
                    gapped_sequences[child], params)
        prof1 = profiles.pop(a)
        prof2 = profiles.pop(b)

        if ref_thr and prof1.size() + prof2.size() > ref_thr:
            if 2 < prof1.size() <= ref_thr:
                prof1 = refine_alignment(prof1, params, backend=params.backend)
            if 2 < prof2.size() <= ref_thr:
                prof2 = refine_alignment(prof2, params, backend=params.backend)

        dest = Profile(params)
        align_into(dest, prof1, prof2, backend=params.backend)
        profiles[node_id] = dest

    if not profiles:
        # single leaf
        return Profile.from_gapped_sequence(gapped_sequences[0], params)
    assert len(profiles) == 1
    return profiles.popitem()[1]


def _compute_alignment_batched(params, gapped_sequences, tree_list):
    """Ready-queue schedule (reference CProfileQueue, queues.cpp:27-124):
    a merge becomes dispatchable the moment both children resolve.  Ready
    merges are grouped by bucket shape and dispatched as vmapped device
    kernels WITHOUT waiting for the rest of their tree level; batches
    resolve in dispatch order while new work keeps entering the pipeline,
    so caterpillar-shaped dendrograms (one merge per level) still overlap
    host construct with device compute.  Small merges run on the native
    host DP and release their parents immediately."""
    import os
    from collections import deque

    import jax as _jax

    from .core.aligner import _JAX_MIN_CELLS
    from .core.aligner import construct_profile as _construct
    from .ops.dp_jax import _bucket, dp_profile_jax_batched

    pallas_mode = os.environ.get("FAMSA_TPU_DP_PALLAS", "1")
    use_pallas = (_jax.default_backend() == "tpu" and pallas_mode == "1") \
        or pallas_mode == "interpret"
    use_giant = use_pallas and os.environ.get("FAMSA_TPU_GIANT", "1") == "1"
    # below ~2e7 cells the native host DP (~3.6e8 cells/s) beats a
    # serialized device round trip through the tunnel; the giant kernel
    # pays off for the truly wide merges and amortizes its per-process
    # setup over them
    giant_min_cells = int(float(os.environ.get("FAMSA_TPU_GIANT_MIN_CELLS",
                                               "2e7")))
    if use_pallas:
        # Mosaic DP + on-device traceback: only O(W) path bytes are pulled;
        # async dispatch pipelines the level's batches through the tunnel.
        # FAMSA_TPU_DP_PALLAS=interpret forces this dispatch path through
        # the pallas interpreter on CPU (CI coverage of the production
        # scheduler + upload encodings without a TPU).
        from .ops.dp_giant import dp_profile_giant_paths_async, lw_for
        from .ops.dp_pallas import dp_profile_pallas_paths_async
        _interp = pallas_mode == "interpret"

        def _dispatch(params, prs):
            # device-resident counters: sides merged on device upload
            # nothing; each result's merged counters stay on device for
            # the parent's merge (Profile.dev_counters)
            dev = []
            for p1, p2 in prs:
                dev.append((p1.dev_counters, p2.dev_counters))
                p1.dev_counters = None
                p2.dev_counters = None
            return dp_profile_pallas_paths_async(params, prs,
                                                 interpret=_interp,
                                                 dev_pairs=dev,
                                                 want_merged=True)

        def _dispatch_giant(params, p1, p2):
            dev1, dev2 = p1.dev_counters, p2.dev_counters
            p1.dev_counters = None
            p2.dev_counters = None
            return dp_profile_giant_paths_async(
                params, p1, p2, dev1=dev1, dev2=dev2,
                want_merged=True, interpret=_interp)

        def _giant_ok(p1, p2):
            return (lw_for(p2.width) is not None and p1.width <= 16384
                    and p1.width * p2.width >= giant_min_cells)

        if not _interp:
            from .ops.dp_chain import prewarm as _chain_prewarm
            from .ops.dp_giant import prewarm
            prewarm()
            _chain_prewarm()
    else:
        class _SyncPending:
            def __init__(self, results):
                self._results = results

            def resolve(self):
                return self._results

        def _dispatch(params, prs):
            return _SyncPending(dp_profile_jax_batched(params, prs))

    max_batch = int(os.environ.get("FAMSA_TPU_MAX_BATCH", "16"))
    n = len(gapped_sequences)
    ref_thr = params.thr_internal_refinement

    # reference progress line (msa.cpp:412-424): computed profiles out of
    # 2n-1 (leaves + merges), every 100, at -vv
    n_prog = [n]

    def _tick():
        n_prog[0] += 1
        if n_prog[0] % 100 == 0 or n_prog[0] == 2 * n - 1:
            logger.progress(f"Computing alignment - "
                            f"{100.0 * n_prog[0] / (2 * n - 1):.1f}%"
                            f"    ({n_prog[0]} of {2 * n - 1})")

    import heapq

    children = {}
    n_pending = {}
    done = {}
    for node_id in range(n, len(tree_list)):
        a, b = tree_list[node_id]
        children[node_id] = (a, b)
        n_pending[node_id] = (a >= n) + (b >= n)

    parent_of = {}
    for node_id, (a, b) in children.items():
        parent_of[a] = node_id
        parent_of[b] = node_id

    # deepest-first priority (reference CProfileQueue, queues.cpp:27-40):
    # finishing one subtree before starting the next bounds the live
    # profile frontier - draining a whole tree level at once materializes
    # O(n) [W, 32] counter/score tensors (~15 GB at 100k sequences)
    depth = {}
    for node_id in range(len(tree_list) - 1, n - 1, -1):
        d = depth.get(node_id, 0)
        a, b = children[node_id]
        if a >= n:
            depth[a] = d + 1
        if b >= n:
            depth[b] = d + 1
    heap = [(-depth.get(v, 0), v) for v in children if n_pending[v] == 0]
    heapq.heapify(heap)

    def get_profile(child):
        if child < n:
            return Profile.from_gapped_sequence(gapped_sequences[child], params)
        return done.pop(child)

    def release(node_id):
        parent = parent_of.get(node_id)
        if parent is not None:
            n_pending[parent] -= 1
            if n_pending[parent] == 0:
                heapq.heappush(heap, (-depth.get(parent, 0), parent))

    chunk_nodes = max_batch * 4
    max_inflight = 4
    pending = deque()
    # env-gated route accounting: cumulative wall + task counts per
    # dispatch route, printed at the end (perf diagnosis at scale)
    stats_on = os.environ.get("FAMSA_TPU_SCHED_STATS", "0") == "1"
    import time as _time
    rt = {"host": [0, 0.0], "giant": [0, 0.0], "batched": [0, 0.0],
          "sharded": [0, 0.0], "chain": [0, 0.0], "materialize": [0, 0.0],
          "resolve_giant": [0, 0.0],
          "resolve_batched": [0, 0.0], "prep": [0, 0.0]}

    # ---- chain-run detection (ops/dp_chain.py): maximal sequences of
    # merges where each consumes the previous merge plus ONE tree leaf -
    # the serialized caterpillar sections where per-merge device round
    # trips (~26 ms) would otherwise force the host route
    chain_by_start = {}
    use_chain = (use_pallas and ref_thr == 0
                 and os.environ.get("FAMSA_TPU_CHAIN", "1") == "1")
    if use_chain:
        from .ops.dp_chain import CHAIN_MIN_LEN, CHAIN_W1P
        runs_by_tail = {}
        for v in sorted(children):
            a, b = children[v]
            la, lb = a < n, b < n
            if la == lb:
                continue                      # leaf-leaf or internal pair
            leaf, internal = (a, b) if la else (b, a)
            if gapped_sequences[leaf].size > CHAIN_W1P:
                continue
            if internal in runs_by_tail and parent_of.get(internal) == v:
                run = runs_by_tail.pop(internal)
            else:
                run = []
            run.append((v, leaf))
            runs_by_tail[v] = run
        for run in runs_by_tail.values():
            if len(run) >= CHAIN_MIN_LEN:
                chain_by_start[run[0][0]] = run

    def _run_chain(run):
        """Process one chain run: host route below the width floor, then
        device-resident chunks (one round trip per CHAIN_K merges).
        Suppresses intra-chain release() - the chain IS the dependency
        order - and releases only the last node it completes."""
        from .ops.dp_chain import (CHAIN_K, CHAIN_MARGIN, CHAIN_MIN_W2,
                                   ChainState, dispatch_chain_chunk, lw_for)
        from .ops.dp_pallas import MergedRef

        t0c = _time.perf_counter()
        v0, leaf0 = run[0]
        a0, b0 = children[v0]
        start_id = a0 if b0 == leaf0 else b0
        chain_prof = get_profile(start_id)
        if chain_prof.counters is None:
            chain_prof.calculate_counters_scores()

        idx = 0
        last_v = None
        # narrow prefix: the fold kernel's 8*lw column padding loses to
        # the native host DP below the width floor
        while idx < len(run) and chain_prof.width < CHAIN_MIN_W2:
            v, leaf = run[idx]
            aa, bb = children[v]
            lp = get_profile(leaf)
            dest = Profile(params)
            if aa == leaf:
                align_into(dest, lp, chain_prof, backend="numpy")
            else:
                align_into(dest, chain_prof, lp, backend="numpy")
            chain_prof = dest
            last_v = v
            idx += 1
            _tick()

        if idx < len(run):
            from collections import deque as _dq

            from .ops.dp_giant import FOLDS, LANE_PAD

            state = ChainState.seed(chain_prof, dev=chain_prof.dev_counters)
            chain_prof.dev_counters = None
            todo = _dq((v, get_profile(leaf)) for v, leaf in run[idx:])
            idx = len(run)
            inflight = deque()          # ([(v, lp)], pending, cap)
            aborted = False
            # the width BOUND (resolved + in-flight leaf sums) would
            # force the wide fold variant almost always (a chunk's leaf
            # sum ~ 9600 vs real growth of a few columns); instead lw is
            # chosen OPTIMISTICALLY with a per-chunk margin, and resolve
            # detects the (rare) overflow - the first merge whose output
            # width exceeds the chunk's capacity poisons the device
            # carry, so the un-built remainder re-queues and the state
            # re-seeds from the last good host profile

            def resolve_one():
                nonlocal chain_prof, last_v
                chunk, pend, cap = inflight.popleft()
                results = pend.resolve()
                overflow = None
                redo = []
                for t, ((v, lp), res) in enumerate(zip(chunk, results)):
                    if overflow is not None:
                        redo.append((v, lp))
                        continue
                    if lp.counters is None:
                        lp.calculate_counters_scores()
                    dest = Profile(params)
                    _construct(dest, lp, chain_prof, res)
                    chain_prof = dest
                    last_v = v
                    _tick()
                    if dest.width > cap:
                        overflow = t
                if overflow is not None:
                    # the device carry past the overflow is poisoned:
                    # requeue everything un-built (in order) and re-seed
                    # from the last good host profile at next dispatch
                    while inflight:
                        later, _p, _c = inflight.popleft()
                        redo.extend(later)
                    for item in reversed(redo):
                        todo.appendleft(item)
                    state.c = None
                state.w_host = chain_prof.width

            while todo or inflight:
                if todo and len(inflight) < 2 and not aborted:
                    lw = lw_for(state.w_host
                                + CHAIN_MARGIN * (len(inflight) + 1))
                    if lw is None:
                        if inflight:
                            resolve_one()
                            continue
                        aborted = True
                        break
                    if state.c is None:
                        state = ChainState.seed(chain_prof)
                    chunk = [todo.popleft()
                             for _ in range(min(len(todo), CHAIN_K))]
                    pend = dispatch_chain_chunk(
                        params, state, [lp for _, lp in chunk], lw,
                        card_bound=len(chain_prof.data) + len(todo)
                        + CHAIN_K * 3,
                        interpret=_interp)
                    inflight.append((chunk, pend,
                                     FOLDS * lw - LANE_PAD))
                    continue
                resolve_one()
            # on abort the unprocessed merges re-enter normal routing:
            # release(last_v) pushes the next chain node onto the heap
            if not aborted and last_v == run[-1][0]:
                # final profile keeps its device-resident counters for
                # the post-chain merge
                chain_prof.dev_counters = MergedRef(
                    state.c[None], 0, chain_prof.width + 1)

        if last_v is None:
            # nothing completed (start already too wide for the fold
            # kernel): restore the start profile and let v0 route
            # normally
            done[start_id] = chain_prof
            heapq.heappush(heap, (-depth.get(v0, 0), v0))
        else:
            done[last_v] = chain_prof
            release(last_v)
        rt["chain"][0] += idx
        rt["chain"][1] += _time.perf_counter() - t0c
    n_workers = min(os.cpu_count() or 1, 8)
    if n_workers > 1:
        from concurrent.futures import ThreadPoolExecutor
        host_pool = ThreadPoolExecutor(max_workers=n_workers)
    else:
        host_pool = None
    while heap or pending:
        # materialize + dispatch a bounded chunk of the deepest ready
        # work; resolve the oldest in-flight batch when the dispatch
        # window is full (or nothing is ready), which releases new work
        if heap and len(pending) < max_inflight:
            batch_nodes = [heapq.heappop(heap)[1]
                           for _ in range(min(len(heap), chunk_nodes))]

            if chain_by_start:
                rest = []
                for node_id in batch_nodes:
                    run = chain_by_start.pop(node_id, None)
                    if run is not None:
                        _run_chain(run)
                    else:
                        rest.append(node_id)
                batch_nodes = rest

            t0s = _time.perf_counter()
            tasks = []
            for node_id in batch_nodes:
                a, b = children[node_id]
                prof1 = get_profile(a)
                prof2 = get_profile(b)
                if ref_thr and prof1.size() + prof2.size() > ref_thr:
                    if 2 < prof1.size() <= ref_thr:
                        prof1 = refine_alignment(prof1, params,
                                                 backend=params.backend)
                    if 2 < prof2.size() <= ref_thr:
                        prof2 = refine_alignment(prof2, params,
                                                 backend=params.backend)
                if prof1.counters is None:
                    prof1.calculate_counters_scores()
                if prof2.counters is None:
                    prof2.calculate_counters_scores()
                tasks.append((node_id, prof1, prof2))
            rt["materialize"][0] += len(tasks)
            rt["materialize"][1] += _time.perf_counter() - t0s

            # split into device-worthy (dispatch-ordered like
            # CProfile::Align), cross-chip (giant), and host tasks
            from .core.aligner import _SHARD_DP_CELLS
            from .parallel.mesh import auto_mesh
            have_mesh = auto_mesh("cols") is not None
            device = []
            host = []
            sharded = []
            for node_id, p1, p2 in tasks:
                cells = p1.width * p2.width
                if (have_mesh and cells >= _SHARD_DP_CELLS
                        and p1.size() + p2.size() > 2):
                    sharded.append((node_id, p1, p2))
                elif cells >= _JAX_MIN_CELLS and p1.size() + p2.size() > 2:
                    device.append((node_id, p1, p2))
                else:
                    host.append((node_id, p1, p2))

            t0s = _time.perf_counter()
            if len(host) > 1 and host_pool is not None:
                # independent merges: the native DP releases the GIL, so
                # a small pool overlaps DP with construct (the reference
                # runs these tasks on its worker threads, msa.cpp:375)
                futs = [(node_id, host_pool.submit(
                    align_into, Profile(params), p1, p2, backend="numpy"))
                    for node_id, p1, p2 in host]
                for node_id, fut in futs:
                    done[node_id] = fut.result()
                    release(node_id)
                    _tick()
            else:
                for node_id, p1, p2 in host:
                    dest = Profile(params)
                    align_into(dest, p1, p2, backend="numpy")
                    done[node_id] = dest
                    release(node_id)
                    _tick()

            rt["host"][0] += len(host)
            rt["host"][1] += _time.perf_counter() - t0s
            t0s = _time.perf_counter()
            for node_id, p1, p2 in sharded:
                # column-striped cross-chip DP (align_into routes on size)
                dest = Profile(params)
                align_into(dest, p1, p2, backend=params.backend)
                done[node_id] = dest
                release(node_id)
                _tick()

            rt["sharded"][0] += len(sharded)
            rt["sharded"][1] += _time.perf_counter() - t0s
            t0s = _time.perf_counter()
            # group device tasks by bucket pair after the reference's
            # operand swap rule (nnz1*w2 < nnz2*w1)
            groups = {}
            for node_id, p1, p2 in device:
                nnz1 = int(np.count_nonzero(p1.counters))
                nnz2 = int(np.count_nonzero(p2.counters))
                if not (nnz1 * p2.width < nnz2 * p1.width):
                    p1, p2 = p2, p1
                key = (_bucket(p1.width), _bucket(p2.width))
                groups.setdefault(key, []).append((node_id, p1, p2))

            for key, items in groups.items():
                if use_giant and (len(items) < 5 or max(key) > 2048):
                    # small groups would run the batched kernel at sb=1
                    # (1/8 sublane utilization, one Mosaic compile per
                    # bucket pair); the width-agnostic staggered-fold
                    # kernel covers them all with a handful of compiled
                    # programs (ops/dp_giant.py)
                    rest = []
                    for node_id, p1, p2 in items:
                        if _giant_ok(p1, p2):
                            t0g = _time.perf_counter()
                            pending.append((
                                [(node_id, p1, p2)],
                                _dispatch_giant(params, p1, p2)))
                            rt["giant"][0] += 1
                            rt["giant"][1] += _time.perf_counter() - t0g
                        else:
                            rest.append((node_id, p1, p2))
                    items = rest
                for k0 in range(0, len(items), max_batch):
                    chunk = items[k0:k0 + max_batch]
                    pending.append((chunk, _dispatch(
                        params, [(p1, p2) for _, p1, p2 in chunk])))
            rt["prep"][1] += _time.perf_counter() - t0s

        # resolve the oldest in-flight batch (uploads/compute of younger
        # batches overlap this pull + host construct), then loop back to
        # dispatch whatever it readied
        elif pending:
            t0s = _time.perf_counter()
            chunk, pnd = pending.popleft()
            for (node_id, p1, p2), res in zip(chunk, pnd.resolve()):
                dest = Profile(params)
                _construct(dest, p1, p2, res)
                if getattr(res, "merged_dev", None) is not None:
                    dest.dev_counters = res.merged_dev
                done[node_id] = dest
                release(node_id)
                _tick()
            key = "resolve_giant" if len(chunk) == 1 else "resolve_batched"
            rt[key][0] += len(chunk)
            rt[key][1] += _time.perf_counter() - t0s

    if host_pool is not None:
        host_pool.shutdown()
    if stats_on:
        import sys as _sys
        for k, (cnt, t) in rt.items():
            print(f"sched {k}: n={cnt} t={t:.1f} s", file=_sys.stderr)
    assert len(done) == 1
    return done.popitem()[1]


# ----------------------------------------------------------------------
class MSAResult:
    def __init__(self):
        self.alignment = None      # list[GappedSequence] in input order
        self.tree = None
        self.statistics = Statistics()


def compute_msa(params, sequences):
    """Full pipeline (msa.cpp:470-672). `sequences` is a list of Sequence
    in input order; consumed. Returns MSAResult."""
    result = MSAResult()
    params.adjust(len(sequences))

    tree = GuideTree()

    if params.export_distances:
        from .tree.distance_export import export_distances
        max_len = max(s.length for s in sequences)
        for s in sequences:
            s.resize(max_len, UNKNOWN_SYMBOL)
        export_distances(params, sequences)
        return result

    t_sort = StopWatch()
    t_sort.start()
    logger.verbose("Sorting sequences...", end="")
    sequences = sort_and_extend(sequences)
    t_sort.stop()
    logger.verbose(" [OK]")
    original2mapped = list(range(len(sequences)))

    dups = 0
    if not params.keep_duplicates:
        mapped_seqs = remove_duplicates(sequences, original2mapped)
        dups = len(sequences) - len(mapped_seqs)
        logger.verbose(f"Duplicate removal... {len(mapped_seqs)}/{len(sequences)} "
                       "sequences retained.")
    else:
        mapped_seqs = list(sequences)

    if len(mapped_seqs) == 1:
        final = [GappedSequence.from_sequence(s) for s in sequences]
        result.alignment = final
        return result

    for i, s in enumerate(mapped_seqs):
        s.sequence_no = i

    t_tree = StopWatch()
    t_tree.start()
    if params.gt_method == P.GT_IMPORTED:
        # Newick import works in sorted-sequence space (msa.cpp:564-567)
        logger.verbose(f"Importing guide tree from: {params.guide_tree_in_file}")
        tree.load_newick(params.guide_tree_in_file, [s.id for s in sequences])
        tree.to_unique(original2mapped, len(mapped_seqs))
    else:
        logger.verbose("Computing guide tree...", end="")
        build_guide_tree(params, mapped_seqs, tree)
        logger.verbose(" [OK]")
    t_tree.stop()

    # shrink sequences back to true length (msa.cpp:574)
    for s in sequences:
        s.resize(s.length, UNKNOWN_SYMBOL)

    result.tree = tree

    if params.export_tree:
        # tree store works in sorted-sequence space (msa.cpp:578-586)
        t_store = StopWatch()
        t_store.start()
        tree.from_unique(original2mapped)
        tree.save_newick(params.output_file_name, [s.id for s in sequences])
        t_store.stop()
        result.statistics.put("time.tree_store", t_store.elapsed)
        result.statistics.put("time.sort", t_sort.elapsed)
        result.statistics.put("time.tree_build", t_tree.elapsed)
        return result

    # gapped conversion (sorted order)
    gapped_sequences = [GappedSequence.from_sequence(s) for s in sequences]
    mapped_gapped = [None] * len(mapped_seqs)
    for i, gs in enumerate(gapped_sequences):
        if mapped_gapped[original2mapped[i]] is None:
            mapped_gapped[original2mapped[i]] = gs

    t_align = StopWatch()
    t_align.start()
    logger.verbose("Computing alignment...", end="")
    final_profile = compute_alignment(params, mapped_gapped, tree.raw())
    from .core.construct_fast import drain_gap_queue
    drain_gap_queue()          # deferred member gap applications
    t_align.stop()
    logger.verbose("[OK]")

    t_refine = StopWatch()
    t_refine.start()
    logger.verbose("Computing refinement...", end="")
    final_profile = refine_alignment(final_profile, params, backend=params.backend)
    t_refine.stop()
    logger.verbose("[OK]")

    if final_profile.size() != len(mapped_gapped):
        raise RuntimeError("Error: incomplete guide tree - report a bug")

    # order unique alignment by mapped id
    ordered_unique = [None] * len(final_profile.data)
    for gs in final_profile.data:
        ordered_unique[gs.sequence_no] = gs

    # final input-order alignment with duplicates restored (msa.cpp:626-650)
    ordered = [None] * len(gapped_sequences)
    for i, current in enumerate(gapped_sequences):
        representative = ordered_unique[original2mapped[i]]
        if current.original_no == representative.original_no:
            ordered[current.original_no] = representative
        else:
            dup = representative.copy()
            dup.id = current.id
            dup.original_no = current.original_no
            ordered[current.original_no] = dup

    result.alignment = ordered
    st = result.statistics
    if params.very_verbose_mode:
        sackin = tree.calculate_sackin_index()
        st.put("guide_tree.sackin", sackin)
        st.put("guide_tree.sackin_norm", sackin / float(len(gapped_sequences)))
    st.put("input.n_duplicates", dups)
    st.put("time.sort", t_sort.elapsed)
    st.put("time.tree_build", t_tree.elapsed)
    st.put("time.tree_store", 0.0)
    st.put("time.alignment", t_align.elapsed)
    st.put("time.refinement", t_refine.elapsed)
    return result


# ----------------------------------------------------------------------
def align_profiles(params, records1, records2):
    """Profile-profile mode (msa.cpp:675-718, famsa.cpp:73-101)."""
    from .core.sequence import encode_gapped

    prof1 = Profile(params)
    prof2 = Profile(params)
    for k, (rid, rseq) in enumerate(records1):
        prof1.append_raw_sequence(encode_gapped(rid, rseq, k))
    for k, (rid, rseq) in enumerate(records2):
        prof2.append_raw_sequence(encode_gapped(rid, rseq, len(records1) + k))

    prof1.calculate_counters_scores()
    prof2.calculate_counters_scores()

    final = Profile(params)
    align_into(final, prof1, prof2, backend=params.backend)
    from .core.construct_fast import drain_gap_queue
    drain_gap_queue()
    final = refine_alignment(final, params, backend=params.backend)
    return final.data
