"""Bit-exact replica of C++ std::mt19937 (32-bit Mersenne Twister).

The reference pipeline depends on the exact draw sequence of std::mt19937
for refinement (seed 5489, msa_refinement.cpp:77) and medoid clustering
(FastTree.cpp:288-290, Clustering.cpp:53-56).  This implements the standard
MT19937 with init_genrand seeding, identical to libstdc++/libc++.
"""

import numpy as np

_N = 624
_M = 397
_MATRIX_A = 0x9908B0DF
_UPPER = 0x80000000
_LOWER = 0x7FFFFFFF


class MT19937:
    def __init__(self, seed=5489):
        self.seed(seed)

    def seed(self, s):
        mt = [0] * _N
        mt[0] = s & 0xFFFFFFFF
        for i in range(1, _N):
            mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i) & 0xFFFFFFFF
        self._mt = np.array(mt, dtype=np.uint32)
        self._idx = _N

    def _twist(self):
        """In-place MT twist, staged so each slice only reads already-final
        values (the scalar loop updates mt[i] from mt[(i+m)%n] which may be
        new)."""
        old = self._mt.astype(np.uint64)
        new = np.empty(_N, dtype=np.uint64)
        U = np.uint64(_UPPER)
        L = np.uint64(_LOWER)
        A = np.uint64(_MATRIX_A)
        one = np.uint64(1)

        def step(y, src):
            mag = np.where((y & one).astype(bool), A, np.uint64(0))
            return src ^ (y >> one) ^ mag

        k = _N - _M                                 # 227
        y = (old[0:k] & U) + (old[1:k + 1] & L)
        new[0:k] = step(y, old[_M:_M + k])
        y = (old[k:2 * k] & U) + (old[k + 1:2 * k + 1] & L)
        new[k:2 * k] = step(y, new[0:k])
        y = (old[2 * k:_N - 1] & U) + (old[2 * k + 1:_N] & L)
        new[2 * k:_N - 1] = step(y, new[k:_N - 1 - k])
        y = (old[_N - 1] & U) + (new[0] & L)
        new[_N - 1] = step(y, new[_M - 1])

        self._mt = (new & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        self._idx = 0

    def __call__(self):
        """One raw 32-bit draw (operator())."""
        if self._idx >= _N:
            self._twist()
        y = int(self._mt[self._idx])
        self._idx += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & 0xFFFFFFFF


def det_uniform_int(gen: MT19937, lo: int, hi: int) -> int:
    """Reference det_uniform_int_distribution (deterministic_random.h:62-76)."""
    diff = hi - lo + 1
    if diff == 0:
        return gen()
    bad_limit = 0x100000000 // diff
    while True:
        r = gen()
        if r // diff < bad_limit:
            return (r % diff) + lo


def partial_shuffle(arr, first: int, middle: int, last: int, gen: MT19937):
    """Reference partial_shuffle (deterministic_random.h:113-127) acting on
    arr[first:last]; shuffles the first (middle-first) slots."""
    n = middle - first
    big_n = last - first - 1
    for i in range(n):
        j = det_uniform_int(gen, i, big_n)
        arr[first + i], arr[first + j] = arr[first + j], arr[first + i]
