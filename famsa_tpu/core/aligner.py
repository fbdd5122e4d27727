"""Profile alignment dispatch (port of CProfile::Align, profile.cpp:244-305)."""

import os

import numpy as np

import os as _os

if _os.environ.get("FAMSA_TPU_FAST_CONSTRUCT", "1") == "1":
    from .construct_fast import construct_profile_fast as construct_profile
else:
    from .construct import construct_profile
from .dp_native import dp_prof_prof, dp_seq_prof, dp_seq_seq
from .profile import Profile

# device DP pays one dispatch per merge; below this cell count the native
# host kernel wins
_JAX_MIN_CELLS = int(float(os.environ.get("FAMSA_TPU_JAX_MIN_CELLS", "4e6")))

# merges with at least this many DP cells are sharded across the device
# mesh (column-striped state, parallel/dp_sharded.py) when one is active -
# the cross-chip analog of the reference's thread wavefront
# (profile_par.cpp:214-230)
_SHARD_DP_CELLS = int(float(os.environ.get("FAMSA_TPU_SHARD_DP_CELLS",
                                           "2e8")))


def align_into(dest: Profile, profile1: Profile, profile2: Profile,
               column_mapping1=None, column_mapping2=None, backend="numpy"):
    """Aligns profile1 and profile2; result stored in dest.  The children's
    data lists are consumed (moved)."""
    if not profile1.data or not profile2.data:
        raise ValueError("Profiles cannot be empty")
    if profile1.counters is None:
        profile1.calculate_counters_scores()
    if profile2.counters is None:
        profile2.calculate_counters_scores()

    dp_ss, dp_sp, dp_pp = dp_seq_seq, dp_seq_prof, dp_prof_prof
    if (backend == "jax" and column_mapping1 is not None
            and profile1.width * profile2.width >= _SHARD_DP_CELLS):
        from ..parallel.mesh import auto_mesh
        _mesh_g = auto_mesh("cols")
        if _mesh_g is not None:
            # guided re-alignment too large for one chip: column-shard
            # with the band mask (same find_row_ranges corridor as the
            # Mosaic kernels; plain XLA shard_map, no Mosaic needed)
            from ..parallel.dp_sharded import dp_profile_sharded_paths
            from .dp import find_row_ranges

            def _dp_guided_sh(params, p1, p2, cm1, cm2):
                rr = find_row_ranges(cm1, cm2,
                                     params.guided_alignment_radius)
                lo = np.fromiter((r[0] for r in rr), np.int32, len(rr))
                hi = np.fromiter((r[1] for r in rr), np.int32, len(rr))
                return dp_profile_sharded_paths(params, p1, p2, _mesh_g,
                                                bands=(lo, hi))

            dp_sp = dp_pp = _dp_guided_sh
    if (dp_sp is dp_seq_prof
            and backend == "jax" and column_mapping1 is not None
            and profile1.width * profile2.width >= _JAX_MIN_CELLS):
        # guided (refinement) re-alignment on device: the Mosaic kernel
        # masks cells outside the find_row_ranges band (reference
        # profile.cpp:1320-1365, profile_seq.cpp:540-545), so the chip
        # no longer idles through the refinement stage
        import jax as _jax

        pallas_mode = os.environ.get("FAMSA_TPU_DP_PALLAS", "1")
        if (_jax.default_backend() == "tpu" and pallas_mode == "1") \
                or pallas_mode == "interpret":
            from ..ops.dp_pallas import dp_profile_pallas_paths_async
            from .dp import find_row_ranges
            _interp = pallas_mode == "interpret"

            def _dp_guided(params, p1, p2, cm1, cm2):
                rr = find_row_ranges(cm1, cm2,
                                     params.guided_alignment_radius)
                lo = np.fromiter((r[0] for r in rr), np.int32, len(rr))
                hi = np.fromiter((r[1] for r in rr), np.int32, len(rr))
                if os.environ.get("FAMSA_TPU_GIANT", "1") == "1":
                    # single guided merges ride the width-agnostic
                    # staggered-fold kernel: the batched kernel at sb=1
                    # costs one Mosaic compile per bucket pair
                    from ..ops.dp_giant import (dp_profile_giant_paths,
                                                lw_for)
                    if lw_for(p2.width) is not None and p1.width <= 16384:
                        return dp_profile_giant_paths(
                            params, p1, p2, bands=(lo, hi),
                            interpret=_interp)[0]
                return dp_profile_pallas_paths_async(
                    params, [(p1, p2)], bands=[(lo, hi)],
                    interpret=_interp).resolve()[0]

            dp_sp = dp_pp = _dp_guided
    if (backend == "jax" and column_mapping1 is None
            and profile1.width * profile2.width >= _JAX_MIN_CELLS):
        # the JAX kernel covers unguided seq-prof and prof-prof (they share
        # one recurrence); guided (refinement) and seq-seq stay on host
        from ..ops.dp_jax import dp_profile_jax
        from ..parallel.mesh import auto_mesh

        mesh = (auto_mesh("cols")
                if profile1.width * profile2.width >= _SHARD_DP_CELLS
                else None)
        if mesh is not None:
            # giant merge: column-shard the DP state across the mesh;
            # traceback on device - only the O(W) path is pulled
            from ..parallel.dp_sharded import dp_profile_sharded_paths

            def dp_sp(params, p1, p2, cm1=None, cm2=None):
                return dp_profile_sharded_paths(params, p1, p2, mesh)
        else:
            def dp_sp(params, p1, p2, cm1=None, cm2=None):
                return dp_profile_jax(params, p1, p2)

        dp_pp = dp_sp

    n1, n2 = len(profile1.data), len(profile2.data)
    if n1 == 1 and n2 == 1:
        res = dp_ss(dest.params, profile1, profile2)
        construct_profile(dest, profile1, profile2, res)
    elif n1 == 1:
        res = dp_sp(dest.params, profile1, profile2, column_mapping1, column_mapping2)
        construct_profile(dest, profile1, profile2, res)
    elif n2 == 1:
        res = dp_sp(dest.params, profile2, profile1, column_mapping2, column_mapping1)
        construct_profile(dest, profile2, profile1, res)
    else:
        nnz1 = int(np.count_nonzero(profile1.counters))
        nnz2 = int(np.count_nonzero(profile2.counters))
        if nnz1 * profile2.width < nnz2 * profile1.width:
            res = dp_pp(dest.params, profile1, profile2, column_mapping1, column_mapping2)
            construct_profile(dest, profile1, profile2, res)
        else:
            res = dp_pp(dest.params, profile2, profile1, column_mapping2, column_mapping1)
            construct_profile(dest, profile2, profile1, res)
    return dest
