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

The kernel is VPU compute-bound: the measured DMA-only floor of the same
shapes is ~226 µs per 64 MiB step on v5e (≈594 GB/s effective, 0.73 of the
819 GB/s paper spec) while the full kernel runs ~370 µs precise / ~312 µs
fast, and op-count deltas (poly length, division kind) move step time
proportionally — see docs/PERF_NBFM.md for the variant table.  The
discriminator's polynomial atan2 matches jnp.arctan2 to ~1 ULP (≤2.4e-7
rad measured over the int8 conj-product domain), so the kernel is the
DEFAULT path; --fast-atan2 swaps the division for the hardware reciprocal
estimate plus one Newton step AND shortens the poly to 6 terms (2.52e-6
rad max, vs a ≥60 dB acceptance bar and ~90 dB delivered).  In interpret
mode (CPU tests) pl.reciprocal is exact, so CPU fast numerics match
ops.demod.atan2_fast bit-for-bit and the precise kernel matches the
exact-division XLA path.

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

from ..demod import _ATAN_COEFFS, _ATAN_COEFFS_FAST

LANES = 128


def _atan2_fast_recip(y: jax.Array, x: jax.Array,
                      precise: bool = True) -> jax.Array:
    """ops.demod atan2 inside the kernel.  ``precise`` (the default)
    divides exactly and evaluates the ~1-ULP 9-term poly, matching
    jnp.arctan2 to ≤2.4e-7 rad measured over the int8 conj-product domain
    — accurate enough to be the default-flag discriminator.  ``precise=
    False`` (--fast-atan2) swaps the division for the TPU hardware
    reciprocal estimate + one Newton step (Pallas-only: pl.reciprocal) AND
    the short 6-term poly (ops.demod._ATAN_COEFFS_FAST, 2.52e-6 rad):
    together 352 → ~312 µs per 64 MiB step measured on v5e, against a
    ≥60 dB acceptance bar (~90 dB delivered).  Same octant reduction and
    signbit quadrant fixups — see ops.demod.atan2_fast for the C99 atan2f
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
    coeffs = _ATAN_COEFFS if precise else _ATAN_COEFFS_FAST
    p = f32(coeffs[-1])
    for c in coeffs[-2::-1]:
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
            cplx_stages=(), precise=True):
    """One grid step = ``blk`` IQ blocks (independent; leading dim).

    u32_ref: [blk, rows, 128] uint32 (4 raw bytes each) — rows*128 demod
    samples per block.  out_ref: [blk, rows, 128] float32 audio.
    cplx_stages: tuple of (taps, c_int) complex-FIR stages applied in
    order between conditioning and the discriminator — the stationary
    interiors of the reference's applyComplexFilter chain
    (src/filter.c:233-259): one stage for -L or -q2 alone, two stacked
    stages for -q2 -L (highpassDc then the input lowpass,
    src/matrix.c:142-157 + 253-266).
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

    for staps, sci in cplx_stages:
        a, b, c, d = _cplx_fir_lanes(a, b, c, d, staps, sci, rows)

    zr = a * c + b * d
    zj = b * c - a * d
    x = _atan2_fast_recip(zj, zr, precise)       # [blk, rows, 128] demod
    x = jnp.where(jnp.isnan(x), jnp.float32(0.0), x)  # NaN clamp (matrix.c:174)
    out_ref[...] = _audio_fir(x, taps, rows)


def _audio_fir(x, taps, rows):
    """Stationary anti-causal FIR: y[q] = Σ_d taps[d]·x[q+d] in row-major
    order within each block.  x[q+d] = roll left by d with cross-row
    carry; beyond-block reads are zero (compat semantics).  The rolls
    operate on the trailing two axes, so any leading block axis stays
    independent."""
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
    return y


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


@functools.partial(jax.jit, static_argnames=("cplx_stages", "taps",
                                             "conditioning", "interpret",
                                             "precise"))
def fused_nbfm_cplx_u32_3d(u32: jax.Array, cplx_stages: tuple,
                           taps: tuple, conditioning: str = "shift",
                           interpret: bool = False,
                           precise: bool = True) -> jax.Array:
    """fused_nbfm_u32_3d with one or more complex-FIR stages fused in:
    conditioning → stacked complex stationary FIRs (+ affine constants) →
    discriminator → audio FIR, one VMEM pass.  cplx_stages is a tuple of
    (taps, (c_int_i, c_int_q)) in application order: one stage for -L or
    -q2, two for the combined -q2 -L chain.  The caller must overwrite the
    audio head (and, two-stage, tail) regions with the dense f64
    corrections — see BlockPipeline.fused_call_inlpf_u32_3d /
    fused_call_q2l_u32_3d."""
    B, rows, lanes = u32.shape
    assert lanes == LANES, u32.shape
    blk = 2 if B % 2 == 0 else 1
    zero = np.int32(0)
    return pl.pallas_call(
        functools.partial(_kernel, taps=taps, conditioning=conditioning,
                          rows=rows, cplx_stages=cplx_stages,
                          precise=precise),
        grid=(B // blk,),
        in_specs=[pl.BlockSpec((blk, rows, LANES), lambda i: (i, zero, zero),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, rows, LANES), lambda i: (i, zero, zero),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
        interpret=interpret,
    )(u32)


def fused_nbfm_inlpf_u32_3d(u32: jax.Array, cplx_taps: tuple, c_int: tuple,
                            taps: tuple, conditioning: str = "shift",
                            interpret: bool = False,
                            precise: bool = True) -> jax.Array:
    """Single complex-stage wrapper of fused_nbfm_cplx_u32_3d (-L or -q2)."""
    return fused_nbfm_cplx_u32_3d(u32, ((cplx_taps, c_int),), taps,
                                  conditioning, interpret, precise)


def _dma_kernel(u32_ref, out_ref):
    """Minimal-compute body: byte-sum cast — the same HBM traffic as the
    fused kernel with ~no VPU work.  Times the device's achievable
    read+write bandwidth at these shapes (the honest roofline floor)."""
    u = u32_ref[...]
    mask = jnp.uint32(0xFF)
    s = ((u & mask) + ((u >> 8) & mask) + ((u >> 16) & mask)
         + (u >> 24)).astype(jnp.int32)
    out_ref[...] = s.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dma_floor_u32_3d(u32: jax.Array, interpret: bool = False) -> jax.Array:
    """u32 [B, rows, 128] → f32 [B, rows, 128] with trivial compute: the
    measured HBM memcpy light-speed for the fused kernel's traffic shape.
    Measured ~226 µs per 64 MiB in + 64 MiB out on v5e (≈594 GB/s
    effective, 0.73× the 819 GB/s paper number) — the denominator
    bench.py's ``frac_of_measured_memcpy`` reports against."""
    B, rows, lanes = u32.shape
    assert lanes == LANES, u32.shape
    blk = 2 if B % 2 == 0 else 1
    zero = np.int32(0)
    return pl.pallas_call(
        _dma_kernel,
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


# ---------------------------------------------------------------------------
# correctIq (-q1) fused kernel
# ---------------------------------------------------------------------------
#
# The reference's correctIq (src/matrix.c:120-140) is a per-I/Q-lane DC
# tracker chaining through EVERY sample pair AND every block — the one truly
# sequential conditioning mode.  The recurrence is affine
# (off' = a·off + esr·(front+back), a = 1-2·esr), so inside a block the
# whole offset trajectory factorizes onto the MXU:
#
#   * per word (two pair-steps) an affine summary (a², bw);
#   * within each 128-lane row, the exclusive prefix of bw is ONE matmul
#     with a lower-triangular geometric Toeplitz matrix T;
#   * across the block's rows, a second tiny triangular matmul over the
#     row summaries;
#   * block-to-block, the scalar offset carries through VMEM scratch
#     across a SEQUENTIAL grid — one kernel launch chains the entire batch
#     exactly like the C static variable, in one HBM pass.
#
# correctIq pairs each front sample with its mirror from the block's END
# (two-ended fill, src/matrix.c:126-136).  Mosaic has no vector reverse
# (`rev` is unimplemented), so mirrors are matmuls with anti-identity
# matrices: lanes reverse via X @ J, rows via J_R @ X — MXU work that
# replaces what would otherwise be an unvectorizable gather.


def _dot_hi(a, b):
    return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _dot_1p(a, b):
    """Single-pass (DEFAULT bf16) dot: EXACT when one operand is a 0/1
    permutation matrix and the other holds integers ≤ 255 (raw bytes) —
    bf16's 8 significand bits represent them without rounding.  6× less
    MXU time than the HIGHEST 6-pass split the f32 mirrors need."""
    return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)


def _dot_3p(a, b):
    """Manual 3-pass split dot (≡ Precision.HIGH, which Mosaic's
    dot_general rejects): both operands split bf16 hi+lo, the ~2^-34
    lo·lo term dropped — ~1e-5 rel.  Used for the q1 offset-prefix dots,
    whose HIGHEST 6-pass form was the kernel's single largest slice
    (553 → 265 µs of a 1377 µs apply pass, r5 ablation in
    docs/PERF_NBFM.md); 1e-5 of the ~127-count DC offset is ~1.3e-3
    absolute on the conditioned signal (≈ −100 dB vs full scale)."""
    f32 = jnp.float32
    ah = a.astype(jnp.bfloat16).astype(f32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(f32)
    bl = b - bh
    return _dot_1p(ah, bh) + _dot_1p(al, bh) + _dot_1p(ah, bl)


def _mirror_perm_split(x, m, left=False):
    """Permutation dot (anti-identity m) on arbitrary f32 data via hi+lo
    bf16 planes: each pass is EXACT (0/1 matrix × bf16 value), the only
    error is the bf16(x − hi) residual rounding ~2^-17 rel — 2 one-pass
    dots instead of a 6-pass HIGHEST split (the audio mirror measured
    260 → 144 µs per apply pass, r5 ablation)."""
    f32 = jnp.float32
    xh = x.astype(jnp.bfloat16).astype(f32)
    xl = x - xh
    if left:
        return _dot_1p(m, xh) + _dot_1p(m, xl)
    return _dot_1p(xh, m) + _dot_1p(xl, m)


def _q1_body(off, u, t_ref, j_ref, trow_ref, jr_ref, alane_ref, wl_ref,
             arow_ref, *, taps, esr, decay, rows, precise):
    """Shared per-block correctIq → demod → FIR body.

    off: [2, 128] f32 entering DC offset (I row 0, Q row 1, lanes
    broadcast).  u: [rows, 128] uint32 raw bytes.  Returns (audio
    [rows, 128], rsI, rsQ [R2, 1] row summaries — the chain's inputs;
    callers that get the entering offset from outside ignore them and
    Mosaic DCEs the two small dots)."""
    offI = off[0:1, 0:1]                     # [1, 1] broadcastable
    offQ = off[1:2, 0:1]
    mask = jnp.uint32(0xFF)
    f32 = jnp.float32
    # raw bytes as float (correctIq conditions RAW uint8 values); the
    # int32 hop exists because Mosaic has no u32→f32 cast
    pa = (u & mask).astype(jnp.int32).astype(f32)
    pb = ((u >> 8) & mask).astype(jnp.int32).astype(f32)
    pc = ((u >> 16) & mask).astype(jnp.int32).astype(f32)
    pd = ((u >> 24) & mask).astype(jnp.int32).astype(f32)
    R2 = rows // 2
    aF, aB = pa[:R2], pa[R2:]
    bF, bB = pb[:R2], pb[R2:]
    cF, cB = pc[:R2], pc[R2:]
    dF, dB = pd[:R2], pd[R2:]

    J = j_ref[...]                           # [128, 128] anti-identity
    JR = jr_ref[...]                         # [R2, R2] anti-identity

    def mirror_b(x):   # rows+lanes reverse of BYTE planes: 1-pass exact
        return _dot_1p(JR, _dot_1p(x, J))

    def mirror_x(x):   # f32 planes: hi+lo split permutation (~2^-17 rel)
        return _mirror_perm_split(_mirror_perm_split(x, J), JR, left=True)

    # mirrored back planes in front (v) coordinates: back word n-1-v holds
    # steps (2v+1, 2v) — byte-pair order swapped vs the front word.  Byte
    # ROLES within a word survive the word permutation, so the whole back
    # half is conditioned AND demodulated in mirrored coordinates and only
    # the scalar audio plane is mirrored back — 4 byte mirrors (1-pass,
    # exact for integers ≤255) + 1 f32 mirror instead of the previous 8
    # f32 mirrors: the kernel's dominant MXU cost measured on v5e
    aBm = mirror_b(aB)                       # I of step 2v+1
    bBm = mirror_b(bB)                       # Q of step 2v+1
    cBm = mirror_b(cB)                       # I of step 2v
    dBm = mirror_b(dB)                       # Q of step 2v

    e = f32(esr)
    ad = f32(decay)                          # a = 1 - 2·esr per pair-step
    s0I = (aF + cBm) * e                     # b_k at step 2v, I lane
    s0Q = (bF + dBm) * e
    s1I = (cF + aBm) * e                     # step 2v+1
    s1Q = (dF + bBm) * e
    bwI = ad * s0I + s1I                     # per-word affine summary
    bwQ = ad * s0Q + s1Q

    # exclusive prefixes: lanes (Toeplitz T, ratio a²) then rows (Trow,
    # ratio a^256); wl folds a row into its summary.  3-pass split dots:
    # the HIGHEST form was the kernel's largest slice (r5 ablation)
    T = t_ref[...]
    Trow = trow_ref[...]
    wl = wl_ref[...]                         # [128, 1]
    LpI = _dot_3p(bwI, T)                    # [R2, 128] within-row prefix
    LpQ = _dot_3p(bwQ, T)
    rsI = _dot_3p(bwI, wl)                   # [R2, 1] row summaries
    rsQ = _dot_3p(bwQ, wl)
    RI = _dot_3p(Trow, rsI) + arow_ref[...] * offI   # state entering row r
    RQ = _dot_3p(Trow, rsQ) + arow_ref[...] * offQ
    offwI = alane_ref[...] * RI + LpI        # state entering word (r, l)
    offwQ = alane_ref[...] * RQ + LpQ
    off1I = ad * offwI + s0I                 # state entering step 2v+1
    off1Q = ad * offwQ + s0Q

    # conditioned planes — front in stream order, back in MIRRORED order
    # (offsets are already in mirrored/front coordinates there)
    aFc = aF - offwI
    bFc = bF - offwQ
    cFc = cF - off1I
    dFc = dF - off1Q
    aBc = aBm - off1I
    bBc = bBm - off1Q
    cBc = cBm - offwI
    dBc = dBm - offwQ

    def disc(a_, b_, c_, d_):
        zr = a_ * c_ + b_ * d_
        zj = b_ * c_ - a_ * d_
        x_ = _atan2_fast_recip(zj, zr, precise)
        return jnp.where(jnp.isnan(x_), f32(0.0), x_)

    x = jnp.concatenate(
        [disc(aFc, bFc, cFc, dFc), mirror_x(disc(aBc, bBc, cBc, dBc))],
        axis=0)
    return _audio_fir(x, taps, rows), rsI, rsQ


def _q1_kernel(off_in_ref, u32_ref, t_ref, j_ref, trow_ref, jr_ref,
               alane_ref, wl_ref, arow_ref, wrow_ref,
               out_ref, offs_ref, off_out_ref, scr_ref,
               *, taps, esr, decay, n_words, rows, precise):
    """One grid step = one block, chained sequentially via ``scr_ref``.

    off_in_ref: [2, 128] f32 — incoming DC offset (I row 0, Q row 1,
    broadcast along lanes); consumed at grid step 0 only.
    u32_ref: [1, rows, 128] uint32 raw bytes.  out_ref: audio.
    offs_ref: [1, 2, 128] — the offset ENTERING this block (for the f64
    head patch outside).  off_out_ref: [2, 128] — final offset.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        scr_ref[...] = off_in_ref[...]

    off = scr_ref[...]                       # [2, 128]
    offs_ref[0] = off                        # entering offset, per block
    audio, rsI, rsQ = _q1_body(off, u32_ref[0], t_ref, j_ref, trow_ref,
                               jr_ref, alane_ref, wl_ref, arow_ref,
                               taps=taps, esr=esr, decay=decay, rows=rows,
                               precise=precise)
    out_ref[0] = audio

    # chain: off_out = a^{n_words}·off_in + Σ_r (a²ᐧ¹²⁸)^{R2-1-r}·rowsum_r
    f32 = jnp.float32
    totI = jnp.sum(rsI * wrow_ref[...], axis=0, keepdims=True)
    totQ = jnp.sum(rsQ * wrow_ref[...], axis=0, keepdims=True)
    a_n = f32(float(decay) ** n_words)
    newI = a_n * off[0:1, 0:1] + totI[:, 0:1]
    newQ = a_n * off[1:2, 0:1] + totQ[:, 0:1]
    new = jnp.concatenate([jnp.broadcast_to(newI, (1, LANES)),
                           jnp.broadcast_to(newQ, (1, LANES))], axis=0)
    scr_ref[...] = new
    off_out_ref[...] = new


def _q1_sum_kernel(u32_ref, wl_ref, wlr_ref, wrow_ref, wrowr_ref, bt_ref,
                   *, esr, decay, rows):
    """Two-pass correctIq, pass 1 (PARALLEL grid): per-block affine
    summary b_tot such that off_out = a^{n_words}·off_in + b_tot.

    The mirror matmuls of the full body fold away: summing a mirrored
    plane against the geometric weights equals summing the plane against
    the REVERSED weights (wlr = q^l, wrowr = qr^r), so the summary is
    eight [R2,128]@[128,1] dots + weighted row sums — the kernel is pure
    DMA + a sliver of MXU, and the grid pipelines block DMAs against each
    other (unlike the sequential single-pass chain).
    bt_ref: [1, 2, 128] — b_tot I/Q broadcast along lanes."""
    u = u32_ref[0]
    mask = jnp.uint32(0xFF)
    f32 = jnp.float32
    pa = (u & mask).astype(jnp.int32).astype(f32)
    pb = ((u >> 8) & mask).astype(jnp.int32).astype(f32)
    pc = ((u >> 16) & mask).astype(jnp.int32).astype(f32)
    pd = ((u >> 24) & mask).astype(jnp.int32).astype(f32)
    R2 = rows // 2
    aF, aB = pa[:R2], pa[R2:]
    bF, bB = pb[:R2], pb[R2:]
    cF, cB = pc[:R2], pc[R2:]
    dF, dB = pd[:R2], pd[R2:]
    wl, wlr = wl_ref[...], wlr_ref[...]          # [128, 1] each
    wrow, wrowr = wrow_ref[...], wrowr_ref[...]  # [R2, 1] each

    def s_f(x):                # front-plane weighted sum (word order)
        return jnp.sum(_dot_hi(x, wl) * wrow)

    def s_b(x):                # back plane: mirror folded into reversal
        return jnp.sum(_dot_hi(x, wlr) * wrowr)

    e = f32(esr)
    ad = f32(decay)
    totI = ad * e * (s_f(aF) + s_b(cB)) + e * (s_f(cF) + s_b(aB))
    totQ = ad * e * (s_f(bF) + s_b(dB)) + e * (s_f(dF) + s_b(bB))
    bt_ref[0] = jnp.concatenate(
        [jnp.full((1, LANES), totI, f32), jnp.full((1, LANES), totQ, f32)],
        axis=0)


def _q1_apply_kernel(offs_ref, u32_ref, t_ref, j_ref, trow_ref, jr_ref,
                     alane_ref, wl_ref, arow_ref, out_ref,
                     *, taps, esr, decay, rows, precise):
    """Two-pass correctIq, pass 2 (PARALLEL grid): the full conditioning →
    demod → FIR body with each block's ENTERING offset supplied as input
    (offs_ref [1, 2, 128]) instead of chained through scratch — restores
    grid parallelism (DMA/compute overlap across blocks)."""
    audio, _, _ = _q1_body(offs_ref[0], u32_ref[0], t_ref, j_ref, trow_ref,
                           jr_ref, alane_ref, wl_ref, arow_ref,
                           taps=taps, esr=esr, decay=decay, rows=rows,
                           precise=precise)
    out_ref[0] = audio


def _q1_consts(decay: float, rows: int):
    """Host-side f64-accumulated constant matrices for the q1 kernel."""
    R2 = rows // 2
    q = float(decay) ** 2                    # per-word ratio
    k = np.arange(LANES)
    expo = k[None, :] - 1 - k[:, None]       # T[j, l] = q^(l-1-j), j < l
    T = np.where(expo >= 0, np.power(q, np.maximum(expo, 0)), 0.0)
    J = np.eye(LANES)[::-1].copy()
    r = np.arange(R2)
    qr = q ** LANES                          # per-row ratio
    # Trow[R, r'] = qr^(R-1-r') for r' < R (exclusive row prefix)
    expr = r[:, None] - 1 - r[None, :]
    Trow = np.where(expr >= 0, np.power(qr, np.maximum(expr, 0)), 0.0)
    JR = np.eye(R2)[::-1].copy()
    alane = np.power(q, k)[None, :]          # [1, 128]
    wl = np.power(q, LANES - 1 - k)[:, None]  # [128, 1]
    arow = np.power(qr, r)[:, None]          # [R2, 1]
    wrow = np.power(qr, R2 - 1 - r)[:, None]
    f = np.float32
    return (T.astype(f), J.astype(f), Trow.astype(f), JR.astype(f),
            alane.astype(f), wl.astype(f), arow.astype(f), wrow.astype(f))


@functools.partial(jax.jit, static_argnames=("taps", "esr", "interpret",
                                             "precise"))
def fused_nbfm_q1_twopass_u32_3d(u32: jax.Array, off_in: jax.Array,
                                 taps: tuple, esr: float,
                                 interpret: bool = False,
                                 precise: bool = True):
    """Two-pass correctIq fused chain (the DEFAULT q1 path): u32 uint32
    [B, rows, 128] raw bytes, off_in [2] f32 → (audio f32 [B, rows, 128],
    off_entering [B, 2], off_final [2]).

    The single-pass kernel (fused_nbfm_q1_u32_3d) chains blocks through
    VMEM scratch on a SEQUENTIAL grid, so one block's DMA can never
    overlap another's compute — measured 12.6 Gsps, 8% of the memcpy
    floor (docs/PERF_NBFM.md addendum).  This version restores grid
    parallelism at the cost of reading the input twice:

      pass 1 (parallel grid)  per-block affine summaries b_tot
      XLA                     log-depth exclusive prefix over blocks
                              (ops.conditioning.correct_iq_block_prefix)
      pass 2 (parallel grid)  conditioning+demod+FIR with each block's
                              entering offset as an input

    Replaces the C static-state chain (src/matrix.c:120-140) with two
    HBM passes; numerics match the sequential kernel to f32 prefix noise
    (the cross-block composition order differs, ~1e-7 relative).
    """
    B, rows, lanes = u32.shape
    assert lanes == LANES and rows % 2 == 0, u32.shape
    decay = 1.0 - 2.0 * float(np.float32(esr))
    n_words = rows * LANES
    T, J, Trow, JR, alane, wl, arow, wrow = _q1_consts(decay, rows)
    R2 = rows // 2
    zero = np.int32(0)
    f32 = jnp.float32

    def rep_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (zero,) * nd,
                            memory_space=pltpu.VMEM)

    # pass 1: per-block summaries (wlr = reversed lane weights = alaneᵀ,
    # wrowr = reversed row weights = arow — see _q1_sum_kernel)
    bt = pl.pallas_call(
        functools.partial(_q1_sum_kernel, esr=float(np.float32(esr)),
                          decay=decay, rows=rows),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, zero, zero),
                         memory_space=pltpu.VMEM),
            rep_spec((LANES, 1)), rep_spec((LANES, 1)),
            rep_spec((R2, 1)), rep_spec((R2, 1)),
        ],
        out_specs=pl.BlockSpec((1, 2, LANES), lambda i: (i, zero, zero),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, LANES), f32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(u32, jnp.asarray(wl), jnp.asarray(alane.reshape(LANES, 1)),
      jnp.asarray(wrow), jnp.asarray(arow))

    from ..conditioning import correct_iq_block_prefix
    a_blk = float(decay) ** n_words
    off0 = off_in.astype(f32)
    off_before, (A_loc, b_loc) = correct_iq_block_prefix(
        f32(a_blk), bt[:, :, 0], off0)                    # [B, 2]
    off_fin = A_loc * off0 + b_loc

    offs_b = jnp.broadcast_to(off_before[:, :, None], (B, 2, LANES))
    audio = pl.pallas_call(
        functools.partial(_q1_apply_kernel, taps=taps,
                          esr=float(np.float32(esr)), decay=decay,
                          rows=rows, precise=precise),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 2, LANES), lambda i: (i, zero, zero),
                         memory_space=pltpu.VMEM),         # offs
            pl.BlockSpec((1, rows, LANES), lambda i: (i, zero, zero),
                         memory_space=pltpu.VMEM),         # u32
            rep_spec((LANES, LANES)), rep_spec((LANES, LANES)),
            rep_spec((R2, R2)), rep_spec((R2, R2)),
            rep_spec((1, LANES)), rep_spec((LANES, 1)), rep_spec((R2, 1)),
        ],
        out_specs=pl.BlockSpec((1, rows, LANES), lambda i: (i, zero, zero),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), f32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(offs_b, u32, jnp.asarray(T), jnp.asarray(J), jnp.asarray(Trow),
      jnp.asarray(JR), jnp.asarray(alane), jnp.asarray(wl),
      jnp.asarray(arow))
    return audio, off_before, off_fin


@functools.partial(jax.jit, static_argnames=("taps", "esr", "interpret",
                                             "precise"))
def fused_nbfm_q1_u32_3d(u32: jax.Array, off_in: jax.Array, taps: tuple,
                         esr: float, interpret: bool = False,
                         precise: bool = True):
    """correctIq-conditioned fused chain: u32 uint32 [B, rows, 128] raw
    bytes, off_in [2] f32 (the tracker state entering block 0) →
    (audio f32 [B, rows, 128], off_entering [B, 2], off_final [2]).

    Blocks chain SEQUENTIALLY (grid order) through VMEM scratch — exact
    per-block order like the C static (src/matrix.c:125); within a block
    the offset trajectory is exact in real arithmetic (blocked geometric
    prefix; f32 rounding differs from the sequential order by ~1e-7
    relative, same as ops.conditioning.correct_iq).  The caller overwrites
    the first out_fir.H audio samples per block with the f64 head patch
    (models.nbfm.BlockPipeline.fused_call_q1_u32_3d).  Kept as the exact
    sequential-order variant and ablation baseline; the production path
    uses fused_nbfm_q1_twopass_u32_3d.
    """
    B, rows, lanes = u32.shape
    assert lanes == LANES and rows % 2 == 0, u32.shape
    decay = 1.0 - 2.0 * float(np.float32(esr))
    n_words = rows * LANES
    consts = _q1_consts(decay, rows)
    R2 = rows // 2
    off2 = jnp.broadcast_to(off_in.astype(jnp.float32)[:, None], (2, LANES))
    zero = np.int32(0)
    cmaps = [
        pl.BlockSpec((LANES, LANES), lambda i: (zero, zero),
                     memory_space=pltpu.VMEM),      # T
        pl.BlockSpec((LANES, LANES), lambda i: (zero, zero),
                     memory_space=pltpu.VMEM),      # J
        pl.BlockSpec((R2, R2), lambda i: (zero, zero),
                     memory_space=pltpu.VMEM),      # Trow
        pl.BlockSpec((R2, R2), lambda i: (zero, zero),
                     memory_space=pltpu.VMEM),      # JR
        pl.BlockSpec((1, LANES), lambda i: (zero, zero),
                     memory_space=pltpu.VMEM),      # alane
        pl.BlockSpec((LANES, 1), lambda i: (zero, zero),
                     memory_space=pltpu.VMEM),      # wl
        pl.BlockSpec((R2, 1), lambda i: (zero, zero),
                     memory_space=pltpu.VMEM),      # arow
        pl.BlockSpec((R2, 1), lambda i: (zero, zero),
                     memory_space=pltpu.VMEM),      # wrow
    ]
    audio, offs, off_out = pl.pallas_call(
        functools.partial(_q1_kernel, taps=taps, esr=float(np.float32(esr)),
                          decay=decay, n_words=n_words, rows=rows,
                          precise=precise),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((2, LANES), lambda i: (zero, zero),
                         memory_space=pltpu.VMEM),          # off_in
            pl.BlockSpec((1, rows, LANES), lambda i: (i, zero, zero),
                         memory_space=pltpu.VMEM),          # u32
            *cmaps,
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, zero, zero),
                         memory_space=pltpu.VMEM),          # audio
            pl.BlockSpec((1, 2, LANES), lambda i: (i, zero, zero),
                         memory_space=pltpu.VMEM),          # offs entering
            pl.BlockSpec((2, LANES), lambda i: (zero, zero),
                         memory_space=pltpu.VMEM),          # off_out
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, LANES), jnp.float32),
            jax.ShapeDtypeStruct((2, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(off2, u32, *[jnp.asarray(c) for c in consts])
    return audio, offs[:, :, 0], off_out[:, 0]
