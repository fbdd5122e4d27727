"""Multi-chip sharding for the distance and DP layers.

Design (SURVEY.md section 2.6): the reference's thread-level parallelism maps
to a JAX device mesh:

 - "rows" axis  - data-parallel distance computation: query sequences are
   sharded across chips; each Prim/SLINK round computes its LCS batch
   locally and reduces the argmin with one small collective over ICI.
 - "cols" axis  - sequence-parallel profile DP: a DP row is sharded along
   the profile-2 column dimension; D/V channels are purely local, and the
   H channel's max-plus prefix scan is completed with an all_gather of
   per-shard scan summaries (two-phase scan), the analog of the
   reference's column-striped wavefront (profile_par.cpp:214-230).

Everything compiles under jit with shard_map; no NCCL/MPI - XLA inserts
the collectives.
"""

import functools

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = np.int64(-(1 << 62))


def make_mesh(n_devices=None, axis="rows"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


_AUTO_MESH = {}


def auto_mesh(axis="rows"):
    """Production mesh over ALL visible devices, or None when the process
    has a single device (or sharding is disabled with FAMSA_TPU_SHARD=0).
    The pipeline calls this to route guide-tree distances, Prim rounds and
    giant merges through the sharded paths."""
    import os
    if os.environ.get("FAMSA_TPU_SHARD", "1") == "0":
        return None
    if axis not in _AUTO_MESH:
        devs = jax.devices()
        _AUTO_MESH[axis] = (Mesh(np.array(devs), (axis,))
                            if len(devs) > 1 else None)
    return _AUTO_MESH[axis]


# ----------------------------------------------------------------------
# Sharded distance round (Prim's algorithm inner step)
# ----------------------------------------------------------------------
def _lcs_block(masks, queries, vma_axis=None):
    """[N_loc] LCS of ref-masks vs local query shard (32-bit words)."""
    n, _ = queries.shape
    w = masks.shape[1]
    x0 = jnp.full((n, w), jnp.uint32(0xFFFFFFFF))
    if vma_axis is not None:
        # inside shard_map the scan carry must be device-varying
        x0 = jax.lax.pcast(x0, (vma_axis,), to="varying")

    def pos_step(x, syms):
        sb = masks[syms]
        carry = jnp.zeros((n,), jnp.uint32)
        cols = []
        for k in range(w):
            v = x[:, k]
            tb = v & sb[:, k]
            v2 = v + tb + carry
            carry = (v2 < v).astype(jnp.uint32)
            cols.append(v2 | (v - tb))
        return jnp.stack(cols, axis=1), None

    x_final, _ = jax.lax.scan(pos_step, x0, queries.T)
    return jax.lax.population_count(~x_final).astype(jnp.int32).sum(axis=1)


def prim_round_sharded(mesh, masks, queries, lengths, ref_len, ref_idx,
                       dist, tieb, active):
    """One Prim round over the mesh.

    queries/lengths/dist/tieb/active are sharded over the leading axis
    ("rows").  Returns updated (dist, tieb) and the global argmin
    (best_idx, best_dist) chosen with the reference's deterministic
    (distance, ~packed-ids) order (MSTPrim.cpp:236-258)."""

    n = queries.shape[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("rows"), P("rows"), P(), P(),
                  P("rows"), P("rows"), P("rows")),
        out_specs=(P("rows"), P("rows"), P(), P()),
        check_vma=False,   # argmin outputs are value-replicated post-gather
    )
    def step(masks, q, lens, rlen, ridx, d_in, t_in, act):
        n_loc = q.shape[0]
        shard_id = jax.lax.axis_index("rows")
        base = shard_id * n_loc
        gids = base + jnp.arange(n_loc, dtype=jnp.int64)

        lcs = _lcs_block(masks, q, vma_axis="rows").astype(jnp.float64)
        indel = (rlen + lens - 2 * lcs.astype(jnp.int64)).astype(jnp.float64)
        dist_new = jnp.where(lcs > 0,
                             indel ** 0.75 / lcs,
                             jnp.finfo(jnp.float64).max)

        lo = jnp.minimum(gids, ridx).astype(jnp.uint64)
        hi = jnp.maximum(gids, ridx).astype(jnp.uint64)
        packed = ~((lo << np.uint64(32)) + hi)

        upd = act & ((dist_new < d_in) | ((dist_new == d_in) & (packed < t_in)))
        d_out = jnp.where(upd, dist_new, d_in)
        t_out = jnp.where(upd, packed, t_in)

        # local lexicographic argmin over active
        d_m = jnp.where(act, d_out, jnp.inf)
        m = jnp.min(d_m)
        t_m = jnp.where(d_m == m, t_out, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        k = jnp.argmin(t_m)
        best_local = (m, t_out[k], gids[k])

        # global reduction: gather all shards' candidates, pick the min
        cand_d = jax.lax.all_gather(best_local[0], "rows")
        cand_t = jax.lax.all_gather(best_local[1], "rows")
        cand_i = jax.lax.all_gather(best_local[2], "rows")
        gm = jnp.min(cand_d)
        gt = jnp.where(cand_d == gm, cand_t, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        gk = jnp.argmin(gt)
        return d_out, t_out, cand_i[gk], gm

    return step(masks, queries, lengths, ref_len, ref_idx, dist, tieb, active)


# ----------------------------------------------------------------------
# Column-sharded DP row update (sequence parallelism for giant merges)
# ----------------------------------------------------------------------
def dp_row_sharded(mesh, prevD, prevH, prevV, t_row, gh_start, gh_cont,
                   gv_start, gv_cont, delta_row, tvx_row):
    """One DP row over column-sharded state.

    D and V are elementwise off the previous row (needs the left-neighbor
    halo element, obtained via ppermute); the H channel runs a two-phase
    max-plus scan: local cummax + exclusive cross-shard combine."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=tuple(P("cols") for _ in range(10)),
        out_specs=(P("cols"), P("cols"), P("cols")),
    )
    def row(pD, pH, pV, t, ghs, ghc, gvs, gvc, dlt, tvx):
        axis = "cols"
        idx = jax.lax.axis_index(axis)
        size = jax.lax.axis_size(axis)

        def left_halo(x):
            # value of the last element of the left neighbor (or -inf)
            last = x[-1:]
            rolled = jax.lax.ppermute(last, axis,
                                      [(i, (i + 1) % size) for i in range(size)])
            return jnp.where(idx == 0, NEG_INF, rolled[0])

        pD_l = jnp.concatenate([left_halo(pD)[None], pD[:-1]])
        pH_l = jnp.concatenate([left_halo(pH)[None], pH[:-1]])
        pV_l = jnp.concatenate([left_halo(pV)[None], pV[:-1]])

        # D channel
        tD = pD_l + t
        tH = pH_l + t + dlt
        tV = pV_l + t + tvx
        pickD = (tD > tH) & (tD > tV)
        pickH = (~pickD) & (tH > tV)
        D_ = jnp.where(pickD, tD, jnp.where(pickH, tH, tV))

        # V channel (3-dir interior form)
        tD = pD + gvs
        tV = pV + gvc
        tH = pH + gvs
        pickD = (tD > tH) & (tD > tV)
        pickH = (~pickD) & (tH > tV)
        V_ = jnp.where(pickD, tD, jnp.where(pickH, tH, tV))

        # H channel: m[j] = max(D[j-1], V[j-1]) + gh_start
        D_l = jnp.concatenate([left_halo(D_)[None], D_[:-1]])
        V_l = jnp.concatenate([left_halo(V_)[None], V_[:-1]])
        m = jnp.maximum(D_l, V_l) + ghs

        bc_local = jnp.cumsum(ghc)
        mk = m - bc_local
        run_local = jax.lax.cummax(mk)
        # cross-shard exclusive prefix of (local max of mk - shifted by sums)
        local_total_b = bc_local[-1]
        local_best = run_local[-1]
        totals = jax.lax.all_gather(local_total_b, axis)        # [S]
        bests = jax.lax.all_gather(local_best, axis)            # [S]
        # shard r's global-frame best is bests[r] - B_r (B_r = sum of b in
        # shards < r); re-expressed in this shard's frame (+ B_s):
        B = jnp.cumsum(totals) - totals                          # B_r
        B_s = jnp.where(jnp.arange(size) < idx, totals, 0).sum()
        carried = jnp.where(jnp.arange(size) < idx,
                            bests - B + B_s, NEG_INF)
        carry_in = jnp.max(carried)                 # NEG_INF on shard 0 (=H0)
        H_ = bc_local + jnp.maximum(run_local, carry_in)
        return D_, H_, V_

    return row(prevD, prevH, prevV, t_row, gh_start, gh_cont,
               gv_start, gv_cont, delta_row, tvx_row)
