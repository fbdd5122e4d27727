"""Exact 64-bit integer arithmetic as (hi:int32, lo:uint32) pairs.

TPU has no native int64; XLA's x64 legalization pass explodes s64 loop
bodies into thousands of unfused u32 ops.  Writing the (hi, lo) arithmetic
by hand keeps the graph in native i32/u32 ops that XLA fuses normally.
All operations are exact two's-complement 64-bit semantics (verified
against numpy int64 in tests/test_i64pair.py).
"""

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32


def from_i64(x):
    """int64 array -> (hi, lo).  Host-side (numpy) when given numpy input,
    so it works without jax x64 mode; device-side requires x64 enabled."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        xa = np.asarray(x, dtype=np.int64)
        return (jnp.asarray((xa >> 32).astype(np.int32)),
                jnp.asarray((xa & 0xFFFFFFFF).astype(np.uint32)))
    hi = (x >> np.int64(32)).astype(jnp.int32)
    lo = (x & np.int64(0xFFFFFFFF)).astype(jnp.uint32)
    return hi, lo


def to_i64(hi, lo):
    """(hi, lo) -> numpy int64 (host-side reconstruction)."""
    hi_n = np.asarray(hi).astype(np.int64)
    lo_n = np.asarray(lo).astype(np.int64)
    return (hi_n << 32) | lo_n


def const(v, shape=()):
    hi = np.int32(np.int64(v) >> np.int64(32))
    lo = np.uint32(np.int64(v) & np.int64(0xFFFFFFFF))
    if shape == ():
        return jnp.int32(hi), jnp.uint32(lo)
    return (jnp.full(shape, hi, jnp.int32), jnp.full(shape, lo, jnp.uint32))


def add(a, b):
    ah, al = a
    bh, bl = b
    lo = al + bl
    carry = (lo < al).astype(jnp.int32)
    hi = ah + bh + carry
    return hi, lo


def sub(a, b):
    ah, al = a
    bh, bl = b
    lo = al - bl
    borrow = (al < bl).astype(jnp.int32)
    hi = ah - bh - borrow
    return hi, lo


def gt(a, b):
    """Signed a > b."""
    ah, al = a
    bh, bl = b
    return (ah > bh) | ((ah == bh) & (al > bl))


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def where(c, a, b):
    return jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1])


def maximum(a, b):
    return where(gt(a, b), a, b)


def max3(a, b, c):
    return maximum(maximum(a, b), c)


def shift_right_pad(a, k, fill):
    """Shift last axis right by k, filling with the 64-bit constant fill."""
    ah, al = a
    fh = np.int32(np.int64(fill) >> np.int64(32))
    fl = np.uint32(np.int64(fill) & np.int64(0xFFFFFFFF))
    pad = [(0, 0)] * (ah.ndim - 1) + [(k, 0)]
    return (jnp.pad(ah[..., :-k], pad, constant_values=fh),
            jnp.pad(al[..., :-k], pad, constant_values=fl))


def cummax_log(a, neg_inf):
    """Inclusive max-scan along last axis (log-depth)."""
    n = a[0].shape[-1]
    k = 1
    while k < n:
        a = maximum(a, shift_right_pad(a, k, neg_inf))
        k *= 2
    return a


def cumsum_log(a):
    """Inclusive add-scan along last axis (log-depth)."""
    n = a[0].shape[-1]
    k = 1
    while k < n:
        a = add(a, shift_right_pad(a, k, 0))
        k *= 2
    return a


def concat(parts, axis=-1):
    return (jnp.concatenate([p[0] for p in parts], axis=axis),
            jnp.concatenate([p[1] for p in parts], axis=axis))


def masked_max(a, mask, neg_inf):
    """max over last axis of where(mask, a, neg_inf)."""
    nf = const(neg_inf, a[0].shape)
    m = where(mask, a, nf)
    # reduce via log-depth fold over halves
    hi, lo = m
    n = hi.shape[-1]
    # pad to power of two with neg_inf
    p = 1
    while p < n:
        p *= 2
    if p != n:
        fh = np.int32(np.int64(neg_inf) >> np.int64(32))
        fl = np.uint32(np.int64(neg_inf) & np.int64(0xFFFFFFFF))
        padw = [(0, 0)] * (hi.ndim - 1) + [(0, p - n)]
        hi = jnp.pad(hi, padw, constant_values=fh)
        lo = jnp.pad(lo, padw, constant_values=fl)
    cur = (hi, lo)
    size = p
    while size > 1:
        half = size // 2
        left = (cur[0][..., :half], cur[1][..., :half])
        right = (cur[0][..., half:size], cur[1][..., half:size])
        cur = maximum(left, right)
        size = half
    return cur[0][..., 0], cur[1][..., 0]
