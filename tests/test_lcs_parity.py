import numpy as np

from famsa_tpu.ops.lcs import build_bit_masks, lcs_ref_vs_queries
from famsa_tpu.ops.lcs_jax import build_query_mask_table, lcs_kernel


def _random_seqs(rng, n, lmax):
    lens = rng.integers(5, lmax, size=n)
    seqs = np.full((n, lmax), 22, dtype=np.int8)  # UNKNOWN padding
    for i, l in enumerate(lens):
        seqs[i, :l] = rng.integers(0, 24, size=l)
    return seqs, lens


def test_lcs_jax_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    seqs, lens = _random_seqs(rng, 64, 200)
    ref = seqs[0][:int(lens[0])]

    masks64 = build_bit_masks(ref, len(ref))
    expected = lcs_ref_vs_queries(masks64, seqs)

    # flipped layout: per-symbol masks of all queries, stream the ref
    table = build_query_mask_table(seqs)
    ref_padded = seqs[0].astype(np.int32)
    got = np.asarray(lcs_kernel(jnp.asarray(table), jnp.asarray(ref_padded)))
    assert np.array_equal(expected, got.astype(np.int64))
