"""Fused Pallas TPU kernel for the flagship NBFM path (no input filter).

One VMEM pass per 256 KiB block: uint8 IQ → conditioning → quadrature
discriminator (polynomial atan2 on the VPU) → stationary audio FIR.
Replaces four unfused XLA stages (~1.4 GB of HBM intermediate traffic per
512-block step) with a single read of the raw bytes and a single write of
the audio — the CUDA backend's device-resident placement (SURVEY.md §2.6)
done the TPU way.

Layout trick: one demod output consumes exactly 4 input bytes (2 complex
samples), so the input is bitcast to uint32 — one lane per output sample,
no strided deinterleave.  Bytes unpack with shifts (little-endian:
a = u & 255 is the first I sample).

The kernel is VPU compute-bound (~65 ops/sample vs a ~200 µs DMA floor per
64 MiB on v5e).  The discriminator's polynomial atan2 matches jnp.arctan2
to ~1 ULP (≤2.4e-7 rad measured over the int8 conj-product domain), so the
kernel is the DEFAULT path; the one tunable is the division: exact by
default, or (--fast-atan2) the hardware reciprocal estimate plus one
Newton step (max error ~2e-6 rad on the audio, vs a ≥60 dB acceptance bar
and ~130 dB measured): 383 → ~315 µs per 64 MiB measured on v5e.  In
interpret mode (CPU tests) pl.reciprocal is exact, so CPU numerics match
the exact-division kernel bit-for-bit.

The dense f64 head-row correction (first 2·sosLen samples per block) runs
outside the kernel in XLA; the kernel computes stationary rows everywhere
and the caller overwrites the head.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..demod import _ATAN_COEFFS

LANES = 128


def _atan2_fast_recip(y: jax.Array, x: jax.Array,
                      precise: bool = True) -> jax.Array:
    """ops.demod.atan2_fast inside the kernel.  ``precise`` (the default)
    divides exactly, matching jnp.arctan2 to ~1 ULP (measured ≤2.4e-7 rad)
    — accurate enough to be the default-flag discriminator.  ``precise=
    False`` (--fast-atan2) swaps the division for the TPU hardware
    reciprocal estimate + one Newton step (Pallas-only: pl.reciprocal),
    ~20% faster at ~2e-6 rad max error.  Same octant reduction and signbit
    quadrant fixups — see ops.demod.atan2_fast for the C99 atan2f
    corner-case notes."""
    f32 = jnp.float32
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    hi_safe = jnp.where(hi == 0, f32(1.0), hi)
    if precise:
        z = lo / hi_safe
    else:
        r = pl.reciprocal(hi_safe, approx=True)
        r = r * (f32(2.0) - hi_safe * r)  # one Newton step: ~1e-7 rel error
        z = lo * r
    z2 = z * z
    p = f32(_ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        p = p * z2 + f32(c)
    at = z + z * z2 * p
    at = jnp.where(ay > ax, f32(jnp.pi / 2) - at, at)
    at = jnp.where(jnp.signbit(x), f32(jnp.pi) - at, at)
    return jnp.where(jnp.signbit(y), -at, at)


def _roll_left(x, m, rows):
    """Shift x [*, rows, 128] left by m samples in row-major lane order,
    zero-filling past the end of the block (compat zero-state semantics).
    m must be in [0, 128)."""
    if m == 0:
        return x
    rax, cax = x.ndim - 2, x.ndim - 1
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, cax)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, rax)
    lane = pltpu.roll(x, shift=np.int32(LANES - m), axis=cax)
    # for c >= 128−m the circular lane roll picked x[r, c+m−128]; the wanted
    # sample x[r+1, c+m−128] is the same column one row down
    up = pltpu.roll(lane, shift=np.int32(rows - 1), axis=rax)
    shifted = jnp.where(col >= LANES - m, up, lane)
    valid = (row < rows - 1) | (col < LANES - m)
    return jnp.where(valid, shifted, jnp.float32(0.0))


def _cplx_fir_lanes(a, b, c, d, cplx_taps, c_int, rows):
    """Stationary complex-sample FIR on lane-packed IQ pairs.

    Each lane holds two complex samples z_{2w}=(a,b), z_{2w+1}=(c,d); the
    per-lane filter z'_s = c_int + Σ_k t[k]·z_{s+k} (anti-causal, zero past
    block end — ops.fir.CplxFirOp stationary interior) becomes rolls of the
    four component planes: even taps stay in-phase, odd taps cross between
    the (a,b) and (c,d) sub-lattices with a one-lane shift for the odd
    outputs."""
    ci, cq = jnp.float32(c_int[0]), jnp.float32(c_int[1])
    f32 = jnp.float32
    a2 = jnp.full_like(a, ci)
    b2 = jnp.full_like(b, cq)
    c2 = jnp.full_like(c, ci)
    d2 = jnp.full_like(d, cq)
    cache = {}

    def rolled(plane, name, m):
        key = (name, m)
        if key not in cache:
            cache[key] = _roll_left(plane, m, rows)
        return cache[key]

    for k, t in enumerate(cplx_taps):
        t = f32(t)
        if k % 2 == 0:
            m = k // 2
            a2 = a2 + t * rolled(a, "a", m)
            b2 = b2 + t * rolled(b, "b", m)
            c2 = c2 + t * rolled(c, "c", m)
            d2 = d2 + t * rolled(d, "d", m)
        else:
            m = (k - 1) // 2
            a2 = a2 + t * rolled(c, "c", m)
            b2 = b2 + t * rolled(d, "d", m)
            c2 = c2 + t * rolled(a, "a", m + 1)
            d2 = d2 + t * rolled(b, "b", m + 1)
    return a2, b2, c2, d2


def _kernel(u32_ref, out_ref, *, taps, conditioning, rows,
            cplx_taps=None, c_int=None, precise=True):
    """One grid step = ``blk`` IQ blocks (independent; leading dim).

    u32_ref: [blk, rows, 128] uint32 (4 raw bytes each) — rows*128 demod
    samples per block.  out_ref: [blk, rows, 128] float32 audio.
    cplx_taps/c_int: optional input-lowpass stage (-L) — the stationary
    interior of the reference's applyComplexFilter (src/filter.c:233-259)
    between conditioning and the discriminator.
    """
    u = u32_ref[...]
    mask = jnp.uint32(0xFF)
    b0 = (u & mask).astype(jnp.int32)
    b1 = ((u >> 8) & mask).astype(jnp.int32)
    b2 = ((u >> 16) & mask).astype(jnp.int32)
    b3 = ((u >> 24) & mask).astype(jnp.int32)
    if conditioning == "shift":
        # (int8)(b - 127) with 255 → -128 == ((b + 1) & 255) - 128
        a = (((b0 + 1) & 255) - 128).astype(jnp.float32)
        b = (((b1 + 1) & 255) - 128).astype(jnp.float32)
        c = (((b2 + 1) & 255) - 128).astype(jnp.float32)
        d = (((b3 + 1) & 255) - 128).astype(jnp.float32)
    elif conditioning == "normalize":
        denom = jnp.float32(np.float32(2.0 / 255.0))
        one = jnp.float32(1.0)
        a = b0.astype(jnp.float32) * denom - one
        b = b1.astype(jnp.float32) * denom - one
        c = b2.astype(jnp.float32) * denom - one
        d = b3.astype(jnp.float32) * denom - one
    else:  # pragma: no cover
        raise ValueError(conditioning)

    if cplx_taps is not None:
        a, b, c, d = _cplx_fir_lanes(a, b, c, d, cplx_taps, c_int, rows)

    zr = a * c + b * d
    zj = b * c - a * d
    x = _atan2_fast_recip(zj, zr, precise)       # [blk, rows, 128] demod
    x = jnp.where(jnp.isnan(x), jnp.float32(0.0), x)  # NaN clamp (matrix.c:174)

    # stationary anti-causal FIR: y[q] = Σ_d taps[d]·x[q+d] in row-major
    # order within each block.  x[q+d] = roll left by d with cross-row
    # carry; beyond-block reads are zero (compat semantics).  The rolls
    # operate on the trailing two axes, so the leading block axis stays
    # independent.
    rax, cax = x.ndim - 2, x.ndim - 1
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, cax)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, rax)
    y = jnp.float32(taps[0]) * x
    shifted = x
    for d in range(1, len(taps)):
        # left-roll by 1 == right-roll by size-1 (pltpu.roll wants shift >= 0;
        # int32 — python ints lower to i64 under x64 and fail verification)
        lane = pltpu.roll(shifted, shift=np.int32(LANES - 1), axis=cax)
        carry = pltpu.roll(shifted[..., :1], shift=np.int32(rows - 1),
                           axis=rax)
        shifted = jnp.where(col == LANES - 1, carry, lane)
        # zero the positions that rolled past the end of the block
        valid = (row < rows - 1) | (col < LANES - d)
        shifted = jnp.where(valid, shifted, jnp.float32(0.0))
        y = y + jnp.float32(taps[d]) * shifted
    out_ref[...] = y


@functools.partial(jax.jit, static_argnames=("taps", "conditioning",
                                             "interpret", "precise"))
def fused_nbfm_u32_3d(u32: jax.Array, taps: tuple,
                      conditioning: str = "shift",
                      interpret: bool = False,
                      precise: bool = True) -> jax.Array:
    """u32: uint32 [B, rows, 128] → audio [B, rows, 128] float32.

    The zero-copy entry: the [B, rows, 128] shape must come straight from
    the host (numpy ``.view(uint32).reshape(B, rows, 128)`` — free), NOT
    from a device-side reshape of [B, samples].  Under XLA's T(8,128) tiled
    layouts that reshape is a physical relayout: profiling on v5e showed it
    costs more than the kernel itself (306 µs of copies around a ~300 µs
    kernel per 64 MiB).  Keeping the natural 3-D layout end-to-end makes the
    pallas_call the only device op.

    Stationary FIR everywhere; the caller must overwrite the first 2·sosLen
    samples per block with the f64 head correction (see JRealFir).
    """
    B, rows, lanes = u32.shape
    assert lanes == LANES, u32.shape
    blk = 2 if B % 2 == 0 else 1   # 2 blocks/grid step pipelines DMA better
    # int32 constants: python-int 0 lowers to i64 under x64 and Mosaic
    # rejects i64 index-map returns
    zero = np.int32(0)
    return pl.pallas_call(
        functools.partial(_kernel, taps=taps, conditioning=conditioning,
                          rows=rows, precise=precise),
        grid=(B // blk,),
        in_specs=[pl.BlockSpec((blk, rows, LANES), lambda i: (i, zero, zero),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, rows, LANES), lambda i: (i, zero, zero),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
        interpret=interpret,
    )(u32)


@functools.partial(jax.jit, static_argnames=("cplx_taps", "c_int", "taps",
                                             "conditioning", "interpret",
                                             "precise"))
def fused_nbfm_inlpf_u32_3d(u32: jax.Array, cplx_taps: tuple, c_int: tuple,
                            taps: tuple, conditioning: str = "shift",
                            interpret: bool = False,
                            precise: bool = True) -> jax.Array:
    """fused_nbfm_u32_3d with the input lowpass (-L) stage fused in:
    conditioning → complex stationary FIR (+ affine constants) →
    discriminator → audio FIR, one VMEM pass.  The caller must overwrite
    the audio head region with the dense f64 corrections (complex-filter
    head rows, audio head rows, and the arena y-coupling from the complex
    filter's overrun — see BlockPipeline.fused_call_inlpf_u32_3d)."""
    B, rows, lanes = u32.shape
    assert lanes == LANES, u32.shape
    blk = 2 if B % 2 == 0 else 1
    zero = np.int32(0)
    return pl.pallas_call(
        functools.partial(_kernel, taps=taps, conditioning=conditioning,
                          rows=rows, cplx_taps=cplx_taps, c_int=c_int,
                          precise=precise),
        grid=(B // blk,),
        in_specs=[pl.BlockSpec((blk, rows, LANES), lambda i: (i, zero, zero),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, rows, LANES), lambda i: (i, zero, zero),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
        interpret=interpret,
    )(u32)


def fused_nbfm_u32(u32: jax.Array, taps: tuple, conditioning: str = "shift",
                   interpret: bool = False,
                   precise: bool = True) -> jax.Array:
    """u32: uint32 [B, samples] (the raw little-endian bytes viewed 4-at-a-
    time; samples % 128 == 0) → audio [B, samples] float32.

    Flat-shape wrapper.  Feeding uint32 straight from the host (a free
    numpy .view) avoids the device-side u8→u32 relayout, but the flat
    [B, samples] ↔ [B, rows, 128] reshapes still cost a tiled-layout copy
    each way on TPU — the streaming runtime and bench feed
    ``fused_nbfm_u32_3d`` with host-shaped [B, rows, 128] instead.
    """
    B, samples = u32.shape
    rows = samples // LANES
    assert samples % LANES == 0, samples
    out = fused_nbfm_u32_3d(u32.reshape(B, rows, LANES), taps, conditioning,
                            interpret, precise)
    return out.reshape(B, samples)


def fused_nbfm(raw: jax.Array, taps: tuple, conditioning: str = "shift",
               interpret: bool = False) -> jax.Array:
    """uint8 [B, n] (n % 512 == 0) → audio [B, n/4] float32.  Compatibility
    wrapper: pays a device-side u8→u32 relayout; prefer fused_nbfm_u32_3d
    with host-viewed [B, rows, 128] uint32 input on the hot path."""
    B, n = raw.shape
    u32 = jax.lax.bitcast_convert_type(
        raw.reshape(B, n // 4, 4), jnp.uint32)
    return fused_nbfm_u32(u32, taps, conditioning, interpret)
