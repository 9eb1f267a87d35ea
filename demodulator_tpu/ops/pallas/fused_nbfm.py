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

from ..demod import atan2_fast

LANES = 128


def _kernel(u32_ref, out_ref, *, taps, conditioning, rows):
    """One grid step = one IQ block.

    u32_ref: [rows, 128] uint32 (4 raw bytes each) — rows*128 demod samples.
    out_ref: [rows, 128] float32 audio.
    """
    u = u32_ref[0]
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

    zr = a * c + b * d
    zj = b * c - a * d
    x = atan2_fast(zj, zr)                       # [rows, 128] demod samples
    x = jnp.where(jnp.isnan(x), jnp.float32(0.0), x)  # NaN clamp (matrix.c:174)

    # stationary anti-causal FIR: y[q] = Σ_d taps[d]·x[q+d] in row-major
    # order.  x[q+d] = roll left by d with cross-row carry; beyond-block
    # reads are zero (compat semantics).
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    y = jnp.float32(taps[0]) * x
    shifted = x
    for d in range(1, len(taps)):
        # left-roll by 1 == right-roll by size-1 (pltpu.roll wants shift >= 0;
        # int32 — python ints lower to i64 under x64 and fail verification)
        lane = pltpu.roll(shifted, shift=np.int32(LANES - 1), axis=1)
        carry = pltpu.roll(shifted[:, :1], shift=np.int32(rows - 1), axis=0)
        shifted = jnp.where(col == LANES - 1, carry, lane)
        # zero the positions that rolled past the end of the block
        valid = (row < rows - 1) | (col < LANES - d)
        shifted = jnp.where(valid, shifted, jnp.float32(0.0))
        y = y + jnp.float32(taps[d]) * shifted
    out_ref[0] = y


@functools.partial(jax.jit, static_argnames=("taps", "conditioning",
                                             "interpret"))
def fused_nbfm_u32(u32: jax.Array, taps: tuple, conditioning: str = "shift",
                   interpret: bool = False) -> jax.Array:
    """u32: uint32 [B, samples] (the raw little-endian bytes viewed 4-at-a-
    time; samples % 128 == 0) → audio [B, samples] float32.

    This is the fast entry: feeding uint32 straight from the host (a free
    numpy .view) avoids the device-side u8→u32 relayout, which costs more
    than the whole kernel (~1.9 ms vs ~1.2 ms per 64 MiB on v5e).

    Stationary FIR everywhere; the caller must overwrite the first 2·sosLen
    samples per block with the f64 head correction (see JRealFir).
    """
    B, samples = u32.shape
    rows = samples // LANES
    assert samples % LANES == 0, samples
    u32 = u32.reshape(B, rows, LANES)
    # int32 constants: python-int 0 lowers to i64 under x64 and Mosaic
    # rejects i64 index-map returns
    zero = np.int32(0)
    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, conditioning=conditioning,
                          rows=rows),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, rows, LANES), lambda i: (i, zero, zero),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, LANES), lambda i: (i, zero, zero),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
        interpret=interpret,
    )(u32)
    return out.reshape(B, samples)


def fused_nbfm(raw: jax.Array, taps: tuple, conditioning: str = "shift",
               interpret: bool = False) -> jax.Array:
    """uint8 [B, n] (n % 512 == 0) → audio [B, n/4] float32.  Compatibility
    wrapper: pays a device-side u8→u32 relayout; prefer fused_nbfm_u32 with
    host-viewed uint32 input on the hot path."""
    B, n = raw.shape
    u32 = jax.lax.bitcast_convert_type(
        raw.reshape(B, n // 4, 4), jnp.uint32)
    return fused_nbfm_u32(u32, taps, conditioning, interpret)
