"""Input-conditioning kernels (jnp, TPU-friendly).

Vectorized equivalents of the reference's conditioning family
(src/matrix.c:82-157).  All operate on the trailing axis and broadcast over
leading batch dims.  The reference fills outputs from both ends at once; for
the stateless kernels that ordering is irrelevant, while correctIq's
two-ended order defines the exact sequence its DC tracker sees and is
reproduced via an associative scan (log-depth, no lax.scan over samples).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["shift_origin", "normalize_input", "correct_iq"]


def shift_origin(buf: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 → centered: (int8)(b - 127), with 255 wrapping to -128
    (src/matrix.c:82-98)."""
    v = buf.astype(jnp.int32) - 127
    v = jnp.where(v == 128, -128, v)
    return v.astype(dtype)


def normalize_input(buf: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 → [-1, 1]: b * (2/255) - 1 (src/matrix.c:100-118)."""
    denom = dtype(np.float32(2.0 / 255.0)) if dtype == jnp.float32 \
        else dtype(2.0 / 255.0)
    return buf.astype(dtype) * denom - dtype(1.0)


def correct_iq(buf: jax.Array, off: jax.Array, esr, dtype=jnp.float32):
    """Running per-lane DC-offset tracker (src/matrix.c:120-140).

    The C loop is a first-order linear recurrence over k = 0..len/4-1:

        outF = bufF[k] - off ;  outB = bufB[k] - off        (front/mirror pair)
        off' = off + (outF + outB)*esr = (1 - 2*esr)*off + (bufF+bufB)*esr

    Reformulated as an associative scan over affine maps (a, b): x → a·x + b,
    exact in real arithmetic (float rounding differs from the sequential C
    path by ~1e-7 relative — the recurrence is contracting, so differences
    stay bounded).  State ``off`` ([..., 2]) carries across blocks like the
    C ``static`` (src/matrix.c:125).

    buf: uint8 [..., L].  Returns (out [..., L] dtype, new_off [..., 2]).
    """
    esr = dtype(esr)
    L = buf.shape[-1]
    n = L >> 2
    fb = buf.astype(dtype)
    front = fb[..., : L // 2].reshape(*buf.shape[:-1], n, 2)     # [..., n, 2]
    back_flat = fb[..., L // 2:].reshape(*buf.shape[:-1], n, 2)
    back = jnp.flip(back_flat, axis=-2)                          # pair k = L-2k-2
    s = (front + back) * esr                                     # b_k per lane
    a = jnp.full_like(s, dtype(1.0) - (esr + esr))

    def combine(l, r):
        return (l[0] * r[0], l[1] * r[0] + r[1])

    a_inc, b_inc = jax.lax.associative_scan(combine, (a, s), axis=-2)
    # exclusive prefix: off before step k
    ones = jnp.ones_like(a_inc[..., :1, :])
    zeros = jnp.zeros_like(ones)
    a_exc = jnp.concatenate([ones, a_inc[..., :-1, :]], axis=-2)
    b_exc = jnp.concatenate([zeros, b_inc[..., :-1, :]], axis=-2)
    off_b = a_exc * off[..., None, :] + b_exc                    # [..., n, 2]
    new_off = a_inc[..., -1, :] * off + b_inc[..., -1, :]

    out_front = (front - off_b).reshape(*buf.shape[:-1], L // 2)
    out_back = jnp.flip(back - off_b, axis=-2).reshape(*buf.shape[:-1], L // 2)
    return jnp.concatenate([out_front, out_back], axis=-1), new_off
