"""Quadrature FM discriminator (jnp, TPU-friendly).

Equivalent of fmDemod (src/matrix.c:159-176): for each non-overlapping pair
of complex samples (a+bi, c+di):

    zr = a*c + b*d ;  zj = -a*d + b*c ;  out = atan2(zj, zr), NaN → 0

decimating 2 complex → 1 real.  ``fast=True`` swaps XLA's atan2 for an odd
polynomial approximation (max abs error ≈ 2e-7 rad — far below the 60 dB
acceptance bar), which avoids the transcendental unit and fuses better.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fm_demod", "fm_demod_split", "atan2_fast"]

# least-squares fit on Chebyshev nodes of (atan(z) - z)/z^3 in u = z^2 on
# [0, 1]; max abs error of the full approximation ~1e-8 rad (f64), bounded by
# f32 rounding (~1e-7) in practice.  Verified against jnp.arctan2 in tests.
_ATAN_COEFFS = (
    -3.3333331954e-01,
    1.9999766157e-01,
    -1.4279113133e-01,
    1.1038008221e-01,
    -8.6732173319e-02,
    6.2844487678e-02,
    -3.6271120349e-02,
    1.3750824816e-02,
    -2.4471584023e-03,
)

# --fast-atan2 poly: 6-term minimax fit of (atan z − z)/z³ on z ∈ [0, 1]
# (weighted-LSQ Remez refinement, host float64).  Max error 2.52e-6 rad —
# well under the 5e-6 unit-test bar and ~50 dB above the 60 dB acceptance
# SNR — and 3 FMAs shorter than the ~1-ULP default poly above (measured
# ~11% off the fused kernel's step time on v5e).
_ATAN_COEFFS_FAST = (
    -3.3329847272e-01,
    1.9890088755e-01,
    -1.3410822133e-01,
    8.0620710130e-02,
    -3.2846015463e-02,
    6.1275766532e-03,
)


def atan2_fast(y: jax.Array, x: jax.Array) -> jax.Array:
    """Polynomial atan2 on the VPU: octant reduction + odd poly on [0,1].

    Zero handling matches C99 atan2f (what the reference calls,
    src/matrix.c:170-174): the quadrant fixups use signbit, not `< 0`, so
    atan2(±0, −0) = ±π — the conj-product of a centered (0,0) IQ sample
    (input bytes 127,127) lands on exactly that corner, and returning 0
    there (an earlier bug) cost ~π-sized glitches on DC-centered captures.

    Uses the short _ATAN_COEFFS_FAST poly (max error 2.52e-6 rad): this IS
    the --fast-atan2 contract, and the fused kernel's precise=False branch
    evaluates the identical polynomial so the two fast paths agree
    bit-for-bit in interpret mode.

    Coefficients are cast to f32 explicitly so the same function lowers
    under Mosaic (python scalars otherwise widen under x64).
    """
    f32 = jnp.float32
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.where(hi == 0, f32(1.0), hi)
    z2 = z * z
    p = f32(_ATAN_COEFFS_FAST[-1])
    for c in _ATAN_COEFFS_FAST[-2::-1]:
        p = p * z2 + f32(c)
    at = z + z * z2 * p
    # undo the min/max swap, then quadrant fixup (signbit: −0.0 counts)
    at = jnp.where(ay > ax, f32(jnp.pi / 2) - at, at)
    at = jnp.where(jnp.signbit(x), f32(jnp.pi) - at, at)
    return jnp.where(jnp.signbit(y), -at, at)


def fm_demod(x: jax.Array, fast: bool = False) -> jax.Array:
    """x: [..., L] interleaved reals (L % 4 == 0) → [..., L/4] audio."""
    q = x.reshape(*x.shape[:-1], x.shape[-1] // 4, 4)
    a, b, c, d = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    zr = a * c + b * d
    zj = -a * d + b * c
    out = atan2_fast(zj, zr) if fast else jnp.arctan2(zj, zr)
    return jnp.where(jnp.isnan(out), 0.0, out)


def fm_demod_split(ei: jax.Array, eq: jax.Array, oi: jax.Array,
                   oq: jax.Array, fast: bool = False) -> jax.Array:
    """Discriminator on pre-split sample pairs: ``even = x[2k]`` (ei/eq =
    its I/Q), ``odd = x[2k+1]`` (oi/oq), any common shape → that shape.

    Same math as :func:`fm_demod` on the interleaved stream — arg(conj(
    even)·odd), C99 corner handling via atan2 — but without the pair
    deinterleave, which is a stride-4 lane gather XLA:TPU lowers
    catastrophically on long 1-D inputs (~1.6 ms per 480k samples, >10×
    the rest of the WBFM chain, measured v5e).  Producers split for free
    in the decimator's tap matrices: :meth:`ops.resample.PolyResampler
    .framed2`."""
    zr = ei * oi + eq * oq
    zj = eq * oi - ei * oq
    out = atan2_fast(zj, zr) if fast else jnp.arctan2(zj, zr)
    return jnp.where(jnp.isnan(out), 0.0, out)
