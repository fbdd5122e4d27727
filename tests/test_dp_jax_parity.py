"""JAX DP kernel vs NumPy reference DP: bit-exact parity."""

import numpy as np
import pytest

from famsa_tpu.core.dp import dp_prof_prof, dp_seq_prof
from famsa_tpu.core.params import Params
from famsa_tpu.core.profile import Profile
from famsa_tpu.core.sequence import encode_gapped

AA = "ARNDCQEGHILKMFPSTWYV"


def _random_gapped(rng, n_cols, gap_frac):
    chars = []
    n_sym = 0
    for _ in range(n_cols):
        if rng.random() < gap_frac or n_sym == 0:
            if rng.random() < gap_frac:
                chars.append('-')
                continue
        chars.append(AA[rng.integers(0, 20)])
        n_sym += 1
    if all(c == '-' for c in chars):
        chars[0] = 'A'
    return "".join(chars)


def _make_profile(rng, params, n_seqs, n_cols, gap_frac=0.2):
    p = Profile(params)
    for k in range(n_seqs):
        # all members must share the gapped width
        s = _random_gapped(rng, n_cols, gap_frac)
        p.append_raw_sequence(encode_gapped(f">s{k}", s, k))
    p.calculate_counters_scores()
    return p


@pytest.mark.parametrize("n1,n2,w1,w2", [
    (3, 4, 40, 55), (1, 5, 30, 70), (8, 2, 90, 33), (1, 1, 25, 25),
])
def test_dp_jax_matches_numpy(n1, n2, w1, w2):
    from famsa_tpu.ops.dp_jax import dp_profile_jax

    rng = np.random.default_rng(n1 * 100 + n2)
    params = Params()
    params.adjust(50)

    p1 = _make_profile(rng, params, n1, w1)
    p2 = _make_profile(rng, params, n2, w2)

    if n1 == 1:
        ref = dp_seq_prof(params, p1, p2)
    else:
        ref = dp_prof_prof(params, p1, p2)
    got = dp_profile_jax(params, p1, p2)

    assert ref.last == got.last
    w1r, w2r = p1.width, p2.width
    assert np.array_equal(ref.dirs_D[:w1r + 1, :w2r + 1], got.dirs_D[:w1r + 1, :w2r + 1])
    assert np.array_equal(ref.dirs_H[1:w1r + 1, 1:w2r + 1], got.dirs_H[1:w1r + 1, 1:w2r + 1])
    assert np.array_equal(ref.dirs_V[1:w1r + 1, 1:w2r + 1], got.dirs_V[1:w1r + 1, 1:w2r + 1])


def test_dp_jax_batched_matches_single():
    from famsa_tpu.ops.dp_jax import dp_profile_jax, dp_profile_jax_batched

    rng = np.random.default_rng(99)
    params = Params()
    params.adjust(50)

    pairs = []
    for k in range(4):
        p1 = _make_profile(rng, params, 2 + k, 30 + 7 * k)
        p2 = _make_profile(rng, params, 3, 45 + 5 * k)
        pairs.append((p1, p2))

    singles = [dp_profile_jax(params, p1, p2) for p1, p2 in pairs]
    batched = dp_profile_jax_batched(params, pairs)

    for s, b, (p1, p2) in zip(singles, batched, pairs):
        assert s.last == b.last
        w1, w2 = p1.width, p2.width
        assert np.array_equal(s.dirs_D[:w1 + 1, :w2 + 1], b.dirs_D[:w1 + 1, :w2 + 1])
        assert np.array_equal(s.dirs_H[1:w1 + 1, 1:w2 + 1], b.dirs_H[1:w1 + 1, 1:w2 + 1])
        assert np.array_equal(s.dirs_V[1:w1 + 1, 1:w2 + 1], b.dirs_V[1:w1 + 1, 1:w2 + 1])
