"""Fused Pallas TPU kernel for the polyphase channel-bank front.

One VMEM pass: uint16 IQ words → conditioning (shiftOrigin semantics,
/root/reference/src/matrix.c:82-98) → polyphase branch filter (VPU, exact
f32 — the prototype taps never round to bf16) → C-point DFT (one MXU dot
per lane-plane, Precision.HIGH) → parity combine → quadrature
discriminator (polynomial atan2, /root/reference/src/matrix.c:159-176
semantics) → per-row channel outputs.

Why this beats the XLA ``call_split`` front (ops/channelizer.py): the
folded-operand einsums pay Q·4C dense bf16 MACs per input sample at
3-pass HIGH precision (~5400 effective MACs/sample at C = 64) *and*
materialize Q full-size z tensors through HBM.  Round 4's
``call_split_vpu`` proved the cheap two-stage structure loses in XLA
because its P windowed reads of the frame tensor are HBM passes
(docs/PERF_EXTENSIONS.md negative result 2).  In VMEM the windows are
free: the branch filter is P FMAs per sample on the VPU, the DFT is a
tiny [TR,128]x[128,4C] dot, and HBM sees exactly one read of the raw
bytes and one write of the demodulated rows (~12 MB per 3.07 Ms block vs
>500 MB of einsum intermediates).

Lane layout (derivation, general C with 2C | 128): pack 2K = 128/C
decimated output samples per 128-lane row — lane L of output row r holds
z[m, c] with

    m = (128/C)·r + L//C,   c = C-1 - (L mod C),

so the branch-filter read index collapses to

    z_row[r, L] = sum_p h2[p, L] * s[128 r + L - (p·C + C-1)],

i.e. every tap window is ONE lane-rotated copy of the conditioned
stream: rotation (p·C + C-1) mod 128, row shift (p·C + C-1) // 128 —
two rotations at C = 64 (63 / 127), min(P, 128/C) distinct rotations
for smaller grids.  The commutator flip and the DFT's channel indexing
fold into the host constants h2 [P, 128] and W4 [128, 256] — nothing is
permuted on device.  The DFT output keeps a FIXED 256-column shape for
every C (4 parity/quadrature blocks x 64 = K·C pair-channel columns u =
j·C + k): consecutive m land in consecutive L//C lane groups, so even
output samples sit in even groups and the K (even, odd) pairs per row
are exactly what the discriminator consumes lane-parallel.

History: the kernel carries the trailing HC·128 conditioned samples
(HC = ceil(P·C/128)) as [2, HC, 128] planes.  The wrapper accepts and
returns the channelizer's [2, P·C] convention (state stays
interchangeable with the XLA front): when P·C is not a multiple of 128
the leading pad samples are zeros, which is safe — the deepest real-tap
read reaches back only P·C - 1 samples, so pad lanes are never touched
by a nonzero tap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_nbfm import _atan2_fast_recip

LANES = 128
OUT = 64  # fixed output width: K·C = (128/2C)·C = 64 pair-channels/row


def _shift_right(e, a: int):
    """sh[j, L] = e[j, L-a] (reading row j-1 for L < a): the conditioned
    stream delayed by ``a`` samples in row-major lane order.  Row 0 of the
    result wraps and is invalid — callers only read rows >= 1 (the window
    row offsets guarantee it)."""
    lane = pltpu.roll(e, shift=np.int32(a), axis=1)
    down = pltpu.roll(lane, shift=np.int32(1), axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
    return jnp.where(col < a, down, lane)


def _unpack_shift(u):
    """uint16 word → conditioned (I, Q) f32 planes: low byte = I,
    (int8)(b - 127) with 255 → -128 (shiftOrigin, src/matrix.c:82-98).
    Widened to i32 before the shift — Mosaic has no i16 vector shrui."""
    w = u.astype(jnp.int32)
    bi = w & 255
    bq = w >> 8
    xi = (((bi + 1) & 255) - 128).astype(jnp.float32)
    xq = (((bq + 1) & 255) - 128).astype(jnp.float32)
    return xi, xq


def _pfb_kernel(x_ref, xp_ref, hist_ref, h2_ref, w4_ref, d_ref, nh_ref, *,
                C, P, TR, HR, n_tiles, precise):
    i = pl.program_id(0)
    f32 = jnp.float32
    xi, xq = _unpack_shift(x_ref[...])                     # [TR, 128]
    # halo: HR conditioned rows before this tile — the carried history on
    # tile 0, the previous tile's tail otherwise (both branches computed;
    # the select is scalar-broadcast, HR·128 elements)
    pi, pq = _unpack_shift(xp_ref[...][TR - HR:])          # [HR, 128]
    first = (i == 0)
    prev_i = jnp.where(first, hist_ref[0], pi)
    prev_q = jnp.where(first, hist_ref[1], pq)
    ei = jnp.concatenate([prev_i, xi], axis=0)             # [TR+HR, 128]
    eq = jnp.concatenate([prev_q, xq], axis=0)

    # one delayed copy per DISTINCT lane rotation (p·C + C−1) mod 128:
    # 2 at C = 64, min(P, 128/C) for smaller grids — each a cheap
    # lane-roll + row-borrow of the conditioned stream
    shifted: dict[int, tuple] = {}
    for p in range(P):
        rem = (p * C + C - 1) % LANES
        if rem not in shifted:
            shifted[rem] = (_shift_right(ei, rem), _shift_right(eq, rem))

    h2 = h2_ref[...]                                       # [P, 128]
    zi = zq = None
    for p in range(P):
        d_p = p * C + C - 1
        e_i, e_q = shifted[d_p % LANES]
        r0 = HR - d_p // LANES
        hrow = h2[p:p + 1]                                 # [1, 128]
        si, sq = e_i[r0: r0 + TR], e_q[r0: r0 + TR]
        zi = hrow * si if zi is None else zi + hrow * si
        zq = hrow * sq if zq is None else zq + hrow * sq

    # DFT dot at 3-pass bf16 (== Precision.HIGH, which Mosaic's
    # dot_general doesn't take directly): operands split hi+lo, the
    # ~2^-34 lo·lo term dropped — ~1e-5 rel, far beyond the 60 dB bar
    w4c = w4_ref[...]                                      # [128, 4·OUT]
    bf16 = jnp.bfloat16
    wh = w4c.astype(bf16)
    wl = (w4c - wh.astype(f32)).astype(bf16)
    dn = (((1,), (0,)), ((), ()))

    def dot3(z):
        zh = z.astype(bf16)
        zl = (z - zh.astype(f32)).astype(bf16)
        acc = jax.lax.dot_general(zh, wh, dn, preferred_element_type=f32)
        acc += jax.lax.dot_general(zl, wh, dn, preferred_element_type=f32)
        acc += jax.lax.dot_general(zh, wl, dn, preferred_element_type=f32)
        return acc

    z4i = dot3(zi)                                         # [TR, 4·OUT]
    z4q = dot3(zq)
    B = OUT
    yer = z4i[:, 0:B] - z4q[:, B:2 * B]
    yei = z4i[:, B:2 * B] + z4q[:, 0:B]
    yor = z4i[:, 2 * B:3 * B] - z4q[:, 3 * B:4 * B]
    yoi = z4i[:, 3 * B:4 * B] + z4q[:, 2 * B:3 * B]
    zr = yer * yor + yei * yoi
    zj = yei * yor - yer * yoi
    d = _atan2_fast_recip(zj, zr, precise)
    d_ref[...] = jnp.where(jnp.isnan(d), f32(0.0), d)

    @pl.when(i == n_tiles - 1)
    def _():
        nh_ref[0] = xi[TR - HR:]
        nh_ref[1] = xq[TR - HR:]


def _host_consts(h_np: np.ndarray, C: int):
    """(h2 [P, 128], w4 [128, 4·OUT], P) with the lane mapping
    m = (128/C)·r + L//C, c = C-1 - (L mod C) folded in (host float64 →
    float32).  w4 is block-diagonal over the K = 64/C pair groups: lane L
    (pair j = L // 2C, parity (L//C) % 2) contributes its DFT phase to
    pair-channel columns u = j·C + k within the four parity/quadrature
    64-wide blocks."""
    assert C in (4, 8, 16, 32, 64) and h_np.size % C == 0, (C, h_np.size)
    P = h_np.size // C
    h = np.asarray(h_np, np.float64).reshape(P, C)
    L = np.arange(LANES)
    cc = C - 1 - (L % C)                               # lane → branch c
    h2 = h[:, cc].astype(np.float32)                   # [P, 128]
    jj = L // (2 * C)                                  # lane → pair group
    odd = (L // C) % 2 == 1                            # lane → m parity
    even = ~odd
    k = np.arange(C)
    theta = 2.0 * np.pi * ((k[None, :] * cc[:, None]) % C) / C
    w4 = np.zeros((LANES, 4 * OUT))
    cols = jj[:, None] * C + k[None, :]                # [128, C] u-index
    rows = np.broadcast_to(L[:, None], cols.shape)
    for par, blk_c, blk_s in ((even, 0, 1), (odd, 2, 3)):
        w4[rows[par], blk_c * OUT + cols[par]] = np.cos(theta[par])
        w4[rows[par], blk_s * OUT + cols[par]] = np.sin(theta[par])
    return h2, w4.astype(np.float32), P


def pfb_tile_rows(G: int, max_tr: int = 256) -> int | None:
    """Largest row-tile ≤ max_tr dividing G with f32 sublane alignment
    (multiple of 8) and covering the halo; None if no legal tile exists."""
    for tr in range(min(max_tr, G), 7, -1):
        if G % tr == 0 and tr % 8 == 0:
            return tr
    return None


def fused_pfb_demod(x_u16: jax.Array, hist: jax.Array, h_np: np.ndarray,
                    C: int = 64, precise: bool = False,
                    interpret: bool = False):
    """x_u16: uint16 [T] (one word per complex sample, T % 128 == 0);
    hist: f32 [2, P·C] conditioned trailing samples (the channelizer's
    state convention); h_np: host prototype, length P·C; C: channel
    count (4/8/16/32/64 — 2C must divide the 128-lane row).

    → (d [T/128, 64] f32 demodulated pair-channel rows — column
    u = j·C + k of row r holds channel k's output for time pair
    m2 = (64/C)·r + j, so ``d.reshape(-1, C)`` is the [M2, C] channel
    matrix — and new_hist [2, P·C]).

    Numerics: branch filter exact f32 (VPU), DFT at Precision.HIGH,
    discriminator = the --fast-atan2 polynomial (``precise=True`` swaps
    in the ~1-ULP 9-term poly + exact division).  Agrees with the XLA
    ``call_split`` front to fp tolerance (different summation order).
    """
    h2, w4, P = _host_consts(h_np, C)
    T = x_u16.shape[-1]
    assert T % LANES == 0, T
    G = T // LANES
    HR = -(-P * C // LANES)                 # history rows (ceil: HC)
    pad = HR * LANES - P * C                # zero-lead when PC % 128 != 0
    TR = pfb_tile_rows(G)
    assert TR is not None and TR >= HR, (G, TR, HR)
    n_tiles = G // TR
    zero = np.int32(0)
    x2 = x_u16.reshape(G, LANES)
    if pad:
        # leading pad lanes are never read by a nonzero tap (deepest real
        # reach is P·C − 1 samples); zeros keep the state convention [2, PC]
        hist = jnp.concatenate(
            [jnp.zeros((2, pad), hist.dtype), hist], axis=-1)
    hist3 = hist.reshape(2, HR, LANES)

    d, nh = pl.pallas_call(
        functools.partial(_pfb_kernel, C=C, P=P, TR=TR, HR=HR,
                          n_tiles=n_tiles, precise=precise),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TR, LANES), lambda i: (i, zero),
                         memory_space=pltpu.VMEM),
            # previous tile (halo source); block 0 maps to itself on the
            # first tile, where the history ref is selected instead
            pl.BlockSpec((TR, LANES),
                         lambda i: (jnp.maximum(i - 1, 0), zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HR, LANES), lambda i: (zero, zero, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h2.shape[0], LANES), lambda i: (zero, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 4 * OUT), lambda i: (zero, zero),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, OUT), lambda i: (i, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HR, LANES), lambda i: (zero, zero, zero),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, OUT), jnp.float32),
            jax.ShapeDtypeStruct((2, HR, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(x2, x2, hist3, jnp.asarray(h2), jnp.asarray(w4))
    return d, nh.reshape(2, HR * LANES)[:, pad:]
