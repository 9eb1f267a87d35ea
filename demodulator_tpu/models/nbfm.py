"""NBFM demodulation pipeline — the framework's flagship model.

Composes the TPU-native equivalents of the reference consumer chain
(src/matrix.c:178-280):

    uint8 IQ block → conditioning → [complex affine-FIR (input LPF)]
                   → quadrature discriminator → real affine-FIR (audio LPF)

per 256 KiB block with zero filter state (compat profile), exactly modeling
the reference's arena couplings (filter overruns feeding the next stage's
initial y — see demodulator_tpu.ops.fir).  Everything is shape-static,
scan-free (conditioning mode 1 uses an associative scan), jit-friendly, and
broadcasts over leading batch dims for multi-block / multi-channel batching.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DemodConfig
from ..design.biquad import design_sos, BUTTER_HP
from ..ops import conditioning as cond_ops
from ..ops import demod as demod_ops
from ..ops.fir import extract_real_fir, extract_cplx_fir
from ..ops.fir_apply import JRealFir, JCplxFir


class PipelineState(NamedTuple):
    """Carry state across blocks (the reference's only cross-block state is
    correctIq's static DC offsets, src/matrix.c:125)."""
    iq_off: jax.Array  # [..., 2] float


class BlockPipeline:
    """Builds and holds the jit-able per-block compute graph for a config."""

    def __init__(self, cfg: DemodConfig, fast_atan2: bool = False,
                 backend: str = "auto"):
        """backend: 'xla' (portable), 'fused' (Pallas kernel for eligible
        configs), or 'auto' (fused on TPU when eligible, else xla)."""
        cfg.validate()
        self.cfg = cfg
        self.backend = backend
        self.fast_atan2 = fast_atan2
        self.dtype = jnp.float64 if cfg.precision == "float64" else jnp.float32
        np_dtype = cfg.np_dtype()
        self.in_degree = cfg.effective_in_filter_degree()
        kind = cfg.conditioning_kind()

        # --- DC-block conditioning filter (src/matrix.c:142-157) ---
        self.dc_fir = None
        dc_overrun = 0
        if kind == 2:
            sos_dc = design_sos(BUTTER_HP, 3, 1.0, cfg.sample_rate, 0.0,
                                dtype=np_dtype)
            op, _ = extract_cplx_fir(sos_dc, alias=False)
            self.dc_fir = JCplxFir(op, dtype=self.dtype)
            dc_overrun = 2 * op.Kc  # interleaved reals scribbled past region

        # --- input complex filter (-L) ---
        self.in_fir = None
        in_overrun = 0
        if cfg.lowpass_in:
            sos_in = design_sos(cfg.in_filter_family(), self.in_degree,
                                cfg.lowpass_in, cfg.sample_rate, cfg.epsilon,
                                dtype=np_dtype)
            op, y_coup = extract_cplx_fir(sos_in, alias=True,
                                          y_init_len=dc_overrun)
            self.in_fir = JCplxFir(op, y_coup, dtype=self.dtype)
            in_overrun = 2 * op.Kc

        # --- output (audio) real filter ---
        audio_y_init = in_overrun if self.in_fir is not None else dc_overrun
        sos_out = design_sos(cfg.out_filter_family(), cfg.out_filter_degree,
                             cfg.lowpass_out, cfg.sample_rate, cfg.epsilon,
                             dtype=np_dtype)
        self.out_fir = JRealFir(
            extract_real_fir(sos_out, y_init_len=audio_y_init),
            dtype=self.dtype)

        self.esr = np_dtype(50.0 / cfg.sample_rate)

        # fused Pallas kernel eligibility (flagship path: no input filter,
        # stateless elementwise conditioning, lane-aligned block size, f32).
        # The kernel's polynomial discriminator matches jnp.arctan2 to
        # ~1 ULP (ops/pallas/fused_nbfm.py), so the fused path is the
        # DEFAULT on TPU; fast_atan2 only switches its division to the
        # hardware-reciprocal estimate (~20% faster, ~2e-6 rad).
        self.fused_eligible = (
            cfg.demod_mode() != 0
            and self.in_fir is None
            and cfg.conditioning_kind() in (0, 3)
            and (cfg.buf_size // 4) % 128 == 0
            and self.dtype == jnp.float32
        )

    def fused_call(self, state: PipelineState, raw: jax.Array,
                   interpret: bool = False):
        """Fused-kernel path (ops.pallas.fused_nbfm): single VMEM pass per
        block + the tiny f64 head-row patch computed in XLA.  uint8 input;
        pays one device-side u8→u32 relayout — the streaming runtime and
        bench use fused_call_u32 with a host-viewed uint32 buffer instead."""
        assert self.fused_eligible
        n = self.cfg.buf_size
        lead = raw.shape[:-1]
        u32 = jax.lax.bitcast_convert_type(
            raw.reshape(-1, n // 4, 4), jnp.uint32)
        state, audio = self.fused_call_u32(state, u32, interpret=interpret)
        return state, audio.reshape(*lead, n >> 2)

    def fused_call_u32(self, state: PipelineState, u32: jax.Array,
                       interpret: bool = False):
        """u32: uint32 [B, buf_size/4] (raw bytes .view(np.uint32) on the
        host) → (state, audio [B, buf_size/4])."""
        from ..ops.pallas.fused_nbfm import fused_nbfm_u32
        assert self.fused_eligible
        cfg = self.cfg
        kind = cfg.conditioning_kind()
        name = "normalize" if kind == 3 else "shift"
        taps = tuple(float(t) for t in self.out_fir.host_taps)
        audio = fused_nbfm_u32(u32, taps, name, interpret=interpret,
                               precise=not self.fast_atan2)
        # f64 head patch: demod of the first Wh samples (1 u32 word each);
        # .at.set over H columns aliases in place — no full-output copy
        W = self.out_fir.Wh
        head_bytes = jax.lax.bitcast_convert_type(
            u32[:, :W], jnp.uint8).reshape(-1, 4 * W)
        xh = (cond_ops.normalize_input(head_bytes, self.dtype) if kind == 3
              else cond_ops.shift_origin(head_bytes, self.dtype))
        dh = demod_ops.fm_demod(xh, fast=self.fast_atan2)
        head = self.out_fir.head_only(dh)
        audio = audio.at[:, : self.out_fir.H].set(head)
        return state, audio

    def fused_call_u32_3d(self, state: PipelineState, u32: jax.Array,
                          interpret: bool = False):
        """u32: uint32 [B, rows, 128], shaped on the HOST (raw bytes
        ``.view(np.uint32).reshape(B, rows, 128)`` — a free view) →
        (state, audio [B, rows, 128] float32; row-major bytes identical to
        the flat audio).

        The zero-copy fused entry: a device-side flat↔3-D reshape is a
        tiled-layout relayout on TPU costing more than the kernel itself
        (see ops.pallas.fused_nbfm.fused_nbfm_u32_3d), so the streaming
        runtime and bench keep the natural 3-D shape end-to-end.
        """
        from ..ops.pallas.fused_nbfm import fused_nbfm_u32_3d
        assert self._use_fused_3d_ok()
        cfg = self.cfg
        kind = cfg.conditioning_kind()
        name = "normalize" if kind == 3 else "shift"
        taps = tuple(float(t) for t in self.out_fir.host_taps)
        audio = fused_nbfm_u32_3d(u32, taps, name, interpret=interpret,
                                  precise=not self.fast_atan2)
        # f64 head patch confined to row 0 (Wh inputs → H outputs, both
        # ≤ 128 by _use_fused_3d_ok); .at.set aliases in place
        W, H = self.out_fir.Wh, self.out_fir.H
        head_bytes = jax.lax.bitcast_convert_type(
            u32[:, 0, :W], jnp.uint8).reshape(-1, 4 * W)
        xh = (cond_ops.normalize_input(head_bytes, self.dtype) if kind == 3
              else cond_ops.shift_origin(head_bytes, self.dtype))
        dh = demod_ops.fm_demod(xh, fast=self.fast_atan2)
        head = self.out_fir.head_only(dh)
        audio = audio.at[:, 0, :H].set(head)
        return state, audio

    def _use_fused_3d_ok(self) -> bool:
        """3-D fused path additionally needs the head patch to fit row 0."""
        return (self.fused_eligible and self.out_fir.Wh <= 128
                and self.out_fir.H <= 128)

    # -- fused correctIq (-q1) path ---------------------------------------
    def fused_q1_eligible(self) -> bool:
        """Eligibility for the correctIq fused kernel (fused_nbfm_q1_u32_3d):
        the two-ended tracker needs an even row split (front/back mirror
        halves land on whole VMEM rows) and the f64 head patch must fit one
        lane row; tiny -b blocks stay on the XLA path."""
        cfg = self.cfg
        n4 = cfg.buf_size // 4
        rows = n4 // 128
        return (cfg.demod_mode() != 0
                and cfg.conditioning_kind() == 1
                and self.in_fir is None and self.dc_fir is None
                and n4 % 128 == 0 and rows % 2 == 0 and rows >= 4
                and self.dtype == jnp.float32
                and self.out_fir.Wh <= 128 and self.out_fir.H <= 128)

    def _use_fused_q1(self) -> bool:
        return self.fused_q1_eligible() and self._backend_wants_fused()

    def fused_call_q1_u32_3d(self, state: PipelineState, u32: jax.Array,
                             interpret: bool = False):
        """correctIq fused path: u32 uint32 [B, rows, 128] (host-viewed raw
        bytes) → (state, audio [B, rows, 128]).  The batch dimension is the
        BLOCK SEQUENCE: the DC tracker chains block-to-block via the
        two-pass design (parallel-grid summaries → log-depth prefix →
        parallel-grid apply; ops.pallas.fused_nbfm.fused_nbfm_q1_twopass_
        u32_3d), replacing the C static chain (src/matrix.c:125) with two
        grid-parallel HBM passes."""
        from ..ops.pallas.fused_nbfm import fused_nbfm_q1_twopass_u32_3d
        assert self._use_fused_q1() or interpret
        taps = tuple(float(t) for t in self.out_fir.host_taps)
        off_in = state.iq_off.reshape(-1)[:2]
        audio, offs_in, off_fin = fused_nbfm_q1_twopass_u32_3d(
            u32, off_in, taps, float(self.esr), interpret=interpret,
            precise=not self.fast_atan2)
        audio = self._q1_head_patch(audio, u32, offs_in)
        return (PipelineState(iq_off=off_fin.reshape(state.iq_off.shape)),
                audio)

    def _q1_head_patch(self, audio: jax.Array, u32: jax.Array,
                       offs_in: jax.Array) -> jax.Array:
        """f64 head correction for the q1 kernel: recompute the DC-tracker
        trajectory over the first Wh words (steps 0..2Wh-1) from the
        per-block entering offsets, condition, demodulate, and overwrite
        the first H audio samples with the dense f64 head rows."""
        W, H = self.out_fir.Wh, self.out_fir.H
        B, rows, _ = u32.shape
        f64 = jnp.float64
        front = jax.lax.bitcast_convert_type(
            u32[:, 0, :W], jnp.uint8).astype(f64)          # [B, W, 4]
        back = jax.lax.bitcast_convert_type(
            u32[:, rows - 1, 128 - W:], jnp.uint8).astype(f64)
        back = jnp.flip(back, axis=-2)   # word n-1-v at index v
        # back word bytes: (I of step 2v+1, Q of 2v+1, I of 2v, Q of 2v)
        esr = f64(float(np.float32(self.esr)))
        a = 1.0 - 2.0 * float(np.float32(self.esr))
        s0 = (front[..., 0:2] + back[..., 2:4]) * esr       # step 2v
        s1 = (front[..., 2:4] + back[..., 0:2]) * esr       # step 2v+1
        s = jnp.stack([s0, s1], axis=-2).reshape(B, 2 * W, 2)
        k = np.arange(2 * W)
        expo = k[:, None] - 1 - k[None, :]                  # j < k
        T = np.where(expo >= 0, np.power(a, np.maximum(expo, 0)), 0.0)
        pref = jnp.einsum("kj,bjl->bkl", jnp.asarray(T, f64), s)
        apow = jnp.asarray(np.power(a, k), f64)
        off_steps = (apow[None, :, None] * offs_in.astype(f64)[:, None, :]
                     + pref)                                # [B, 2W, 2]
        cond = (front.reshape(B, W, 2, 2)
                - off_steps.reshape(B, W, 2, 2)).astype(self.dtype)
        dh = demod_ops.fm_demod(cond.reshape(B, 4 * W), fast=self.fast_atan2)
        head = self.out_fir.head_only(dh)
        return audio.at[:, 0, :H].set(head)

    # -- fused path with a complex-FIR stage (-L or -q2) fused in ---------
    def _fused_cplx_stage(self):
        """The single complex-FIR stage on the fused path: the -L input
        lowpass, or the -q2 DC-block highpass (src/matrix.c:142-157) —
        structurally the same conditioning → complex FIR → discriminator
        chain.  None when the chain has zero or two complex stages
        (-q2 combined with -L stays on the XLA path)."""
        if self.in_fir is not None and self.dc_fir is None:
            return self.in_fir
        if self.dc_fir is not None and self.in_fir is None:
            return self.dc_fir
        return None

    def _inlpf_geometry(self):
        """(n_pairs, W1_words, hy, Wt_words) for the head/coupling patches."""
        inf, outf = self._fused_cplx_stage(), self.out_fir
        n_pairs = max(2 * outf.Wh, inf.Hc)
        n_pairs += n_pairs & 1            # discriminator consumes pairs of pairs
        w1_pairs = max(inf.Whc, n_pairs + inf.Dc)
        w1_words = -(-w1_pairs // 2)
        hy = 0 if outf.y_coup is None else outf.y_coup.shape[0]
        wt_words = -(-inf.Wtc // 2)
        return n_pairs, w1_words, hy, wt_words

    def fused_inlpf_eligible(self) -> bool:
        """Pallas path for the -L and -q2 configs: conditioning → complex
        FIR → discriminator → audio FIR in one VMEM pass, head patches in
        XLA.  -q2's conditioning is shiftOrigin (src/matrix.c:151), so its
        kernel differs from -L's only in which SOS the taps came from."""
        stage = self._fused_cplx_stage()
        if (self.cfg.demod_mode() == 0
                or stage is None
                or self.cfg.conditioning_kind() not in (0, 2, 3)
                or (self.cfg.buf_size // 4) % 128 != 0
                or self.dtype != jnp.float32):
            return False
        n_pairs, w1_words, hy, wt_words = self._inlpf_geometry()
        return (stage.Dc < 254 and w1_words <= 128
                and self.out_fir.H <= 128 and hy <= 128 and wt_words <= 128)

    def fused_call_inlpf_u32_3d(self, state: PipelineState, u32: jax.Array,
                                interpret: bool = False):
        """u32: uint32 [B, rows, 128] host-shaped → (state, audio
        [B, rows, 128]).  Kernel computes the stationary interior of the
        whole -L chain; the dense f64 corrections — complex-filter head
        rows, audio head rows, and the audio filter's y-coupling from the
        complex filter's arena overrun (ops.fir extraction of
        src/filter.c:233-259 + src/matrix.c:260-266) — patch row 0."""
        from ..ops.pallas.fused_nbfm import fused_nbfm_inlpf_u32_3d
        assert self.fused_inlpf_eligible()
        inf, outf = self._fused_cplx_stage(), self.out_fir
        kind = self.cfg.conditioning_kind()
        name = "normalize" if kind == 3 else "shift"
        cond = (cond_ops.normalize_input if kind == 3
                else cond_ops.shift_origin)
        taps = tuple(float(t) for t in outf.host_taps)
        ctaps = tuple(float(t) for t in inf.host_taps)
        ci = tuple(float(v) for v in inf.host_c_int)
        audio = fused_nbfm_inlpf_u32_3d(u32, ctaps, ci, taps, name,
                                        interpret=interpret,
                                        precise=not self.fast_atan2)

        n_pairs, w1_words, hy, wt_words = self._inlpf_geometry()
        B = u32.shape[0]
        head_bytes = jax.lax.bitcast_convert_type(
            u32[:, 0, :w1_words], jnp.uint8).reshape(B, 4 * w1_words)
        head_pairs = cond(head_bytes, self.dtype).reshape(B, -1, 2)
        filt = inf.pairs_head(head_pairs, n_pairs)       # [B, n_pairs, 2]
        d_head = demod_ops.fm_demod(filt.reshape(B, -1),
                                    fast=self.fast_atan2)
        head = outf.head_only(d_head[..., : outf.Wh])
        audio = audio.at[:, 0, : outf.H].set(head)
        if hy:
            tail_bytes = jax.lax.bitcast_convert_type(
                u32[:, -1, -wt_words:], jnp.uint8).reshape(B, 4 * wt_words)
            tail_pairs = cond(tail_bytes, self.dtype).reshape(B, -1, 2)
            over = inf.over_only(head_pairs, tail_pairs)  # [B, Kc, 2]
            add = jnp.einsum(
                "hk,...k->...h", outf.y_coup,
                over.reshape(B, -1).astype(jnp.float64)).astype(self.dtype)
            audio = audio.at[:, 0, :hy].add(add)
        return state, audio

    # -- fused TWO-stage chain (-q2 AND -L together) -----------------------
    def _q2l_geometry(self):
        """Patch-window geometry for the two-stage fused chain.

        The kernel computes stationary rows of highpassDc∘inputLPF
        everywhere; the true chain differs in (a) the combined complex
        head — dc head rows propagated through the in-stage reach, the
        in-stage's own head, and the dc-overrun y-coupling's head rows —
        and (b) the block tail, where the same y-coupling's tail component
        (ops.fir yc_tail: the dc overrun scribbling the in-stage arena
        head, read back through the -L x-alias) lands on the final
        2·sosLen_in pairs.  Both get dense f64 patches in XLA."""
        dc, inf, outf = self.dc_fir, self.in_fir, self.out_fir
        hp2 = 0 if inf.yc_head is None else inf.yc_head.shape[0]
        tc2 = 2 * inf.sos_len
        p_bad = max(inf.Hc, dc.Hc + inf.Dc, hp2)
        p_bad += p_bad & 1
        a_p = max(p_bad // 2, outf.H)       # audio head rows to overwrite
        nd = max(a_p + outf.D, outf.Wh)     # true demod head rows needed
        n_pairs = 2 * nd
        m1 = max(inf.Whc, n_pairs + inf.Dc)     # true dc outputs needed
        w1_pairs = max(dc.Whc, m1 + dc.Dc)
        w1_words = -(-w1_pairs // 2)
        hy = 0 if outf.y_coup is None else outf.y_coup.shape[0]
        at = tc2 // 2 + outf.D              # audio tail rows to overwrite
        pt = 2 * at                         # true tail pairs needed
        m1t = max(pt + inf.Dc, inf.Wtc)     # dc tail outputs needed
        wt_pairs = max(dc.Wtc, m1t + dc.Dc)
        wt_words = -(-wt_pairs // 2)
        return dict(n_pairs=n_pairs, a_p=a_p, nd=nd, m1=m1,
                    w1_words=w1_words, hy=hy, tc2=tc2, at=at, pt=pt,
                    m1t=m1t, wt_words=wt_words, hp2=hp2)

    def fused_q2l_eligible(self) -> bool:
        """Pallas path for -q2 combined with -L: conditioning → highpassDc
        FIR → input-LPF FIR → discriminator → audio FIR in ONE VMEM pass
        (the reference consumer's whole chain, src/matrix.c:253-266), with
        the head and tail corrections patched in XLA."""
        if (self.cfg.demod_mode() == 0 or self.in_fir is None
                or self.dc_fir is None
                or self.cfg.conditioning_kind() != 2
                or (self.cfg.buf_size // 4) % 128 != 0
                or self.dtype != jnp.float32):
            return False
        rows = (self.cfg.buf_size // 4) // 128
        g = self._q2l_geometry()
        return (rows >= 2 and self.dc_fir.Dc < 254 and self.in_fir.Dc < 254
                and g["w1_words"] <= 128 and g["wt_words"] <= 128
                and g["a_p"] <= 128 and g["hy"] <= 128 and g["at"] <= 128
                and g["nd"] <= 128)

    def _use_fused_q2l(self) -> bool:
        return self.fused_q2l_eligible() and self._backend_wants_fused()

    def fused_call_q2l_u32_3d(self, state: PipelineState, u32: jax.Array,
                              interpret: bool = False):
        """u32: uint32 [B, rows, 128] host-shaped → (state, audio
        [B, rows, 128]).  Two stacked complex stages inside the kernel;
        f64 head patch on row 0, y-coupling adds, and the tail patch on
        the last row (see _q2l_geometry)."""
        from ..ops.pallas.fused_nbfm import fused_nbfm_cplx_u32_3d
        assert self.fused_q2l_eligible() or interpret
        dc, inf, outf = self.dc_fir, self.in_fir, self.out_fir
        g = self._q2l_geometry()
        taps = tuple(float(t) for t in outf.host_taps)
        stages = tuple(
            (tuple(float(t) for t in s.host_taps),
             tuple(float(v) for v in s.host_c_int))
            for s in (dc, inf))
        audio = fused_nbfm_cplx_u32_3d(u32, stages, taps, "shift",
                                       interpret=interpret,
                                       precise=not self.fast_atan2)

        B, rows, _ = u32.shape
        cond = (cond_ops.normalize_input
                if self.cfg.conditioning_kind() == 3
                else cond_ops.shift_origin)
        f64 = jnp.float64

        # conditioned head / tail pair windows
        head_bytes = jax.lax.bitcast_convert_type(
            u32[:, 0, : g["w1_words"]], jnp.uint8).reshape(
                B, 4 * g["w1_words"])
        head_pairs = cond(head_bytes, self.dtype).reshape(B, -1, 2)
        tail_bytes = jax.lax.bitcast_convert_type(
            u32[:, -1, -g["wt_words"]:], jnp.uint8).reshape(
                B, 4 * g["wt_words"])
        tail_pairs = cond(tail_bytes, self.dtype).reshape(B, -1, 2)

        # dc overrun — the y_init of the in-stage's arena (src/matrix.c
        # scratch reuse); drives both coupling adds below
        dc_over = dc.over_only(head_pairs, tail_pairs)        # [B, Kc1, 2]
        dc_over_flat = dc_over.reshape(B, -1).astype(f64)

        # --- head: true chain through both stages -------------------------
        y1_head = dc.pairs_head(head_pairs, g["m1"])          # [B, m1, 2]
        y2_head = inf.pairs_head(y1_head, g["n_pairs"])       # [B, n_pairs, 2]
        if g["hp2"]:
            add_h = jnp.einsum("plk,...k->...pl", inf.yc_head,
                               dc_over_flat).astype(self.dtype)
            y2_head = jnp.concatenate(
                [y2_head[:, : g["hp2"]] + add_h, y2_head[:, g["hp2"]:]],
                axis=1)
        d_head = demod_ops.fm_demod(y2_head.reshape(B, -1),
                                    fast=self.fast_atan2)     # [B, nd]
        head_audio = outf.head_only(d_head[:, : outf.Wh])     # [B, H]
        parts = [head_audio]
        if g["a_p"] > outf.H:
            span = g["a_p"] - outf.H
            y = outf.taps[0] * d_head[:, outf.H: outf.H + span]
            for d in range(1, outf.D + 1):
                y = y + outf.taps[d] * d_head[:, outf.H + d:
                                              outf.H + d + span]
            parts.append(y)
        audio = audio.at[:, 0, : g["a_p"]].set(
            jnp.concatenate(parts, axis=-1))

        # --- tail: stationary recompute + the y-coupling tail add ---------
        # y1 on the last m1t pairs (stationary; zero past block end)
        m1t, pt, tc2, at = g["m1t"], g["pt"], g["tc2"], g["at"]
        xt = tail_pairs[:, -(m1t + dc.Dc):] if m1t + dc.Dc <= \
            tail_pairs.shape[1] else tail_pairs
        xt_p = jnp.pad(xt, ((0, 0), (0, dc.Dc), (0, 0)))
        span1 = xt.shape[1]
        y1t = dc.taps[0] * xt
        for d in range(1, dc.Dc + 1):
            y1t = y1t + dc.taps[d] * xt_p[:, d: d + span1]
        y1t = (y1t + dc.c_int)[:, -m1t:]                      # [B, m1t, 2]
        # y2 on the last pt pairs
        y1t_p = jnp.pad(y1t, ((0, 0), (0, inf.Dc), (0, 0)))
        y2t = inf.taps[0] * y1t[:, -pt:]
        for d in range(1, inf.Dc + 1):
            y2t = y2t + inf.taps[d] * y1t_p[:, m1t - pt + d:
                                            m1t - pt + d + pt]
        y2t = y2t + inf.c_int
        add_t = jnp.einsum("plk,...k->...pl", inf.yc_tail,
                           dc_over_flat).astype(self.dtype)
        y_tail_add, over_add = add_t[:, :tc2], add_t[:, tc2:]
        y2t = jnp.concatenate(
            [y2t[:, : pt - tc2], y2t[:, pt - tc2:] + y_tail_add], axis=1)
        d_tail = demod_ops.fm_demod(y2t.reshape(B, -1),
                                    fast=self.fast_atan2)     # [B, at]
        d_tail_p = jnp.pad(d_tail, ((0, 0), (0, outf.D)))
        ya = outf.taps[0] * d_tail
        for d in range(1, outf.D + 1):
            ya = ya + outf.taps[d] * d_tail_p[:, d: d + at]
        audio = audio.at[:, -1, 128 - at:].set(ya)

        # --- audio y-coupling from the in-stage overrun --------------------
        if g["hy"]:
            in_over = inf.over_only(y1_head, y1t) + over_add  # [B, Kc2, 2]
            add = jnp.einsum(
                "hk,...k->...h", outf.y_coup,
                in_over.reshape(B, -1).astype(f64)).astype(self.dtype)
            audio = audio.at[:, 0, : g["hy"]].add(add)
        return state, audio

    def fused_call_q2l(self, state: PipelineState, raw: jax.Array,
                       interpret: bool = False):
        """Flat uint8 wrapper of fused_call_q2l_u32_3d."""
        n = self.cfg.buf_size
        lead = raw.shape[:-1]
        rows = (n // 4) // 128
        u32 = jax.lax.bitcast_convert_type(
            raw.reshape(-1, n // 4, 4), jnp.uint32).reshape(-1, rows, 128)
        state, audio = self.fused_call_q2l_u32_3d(state, u32,
                                                  interpret=interpret)
        return state, audio.reshape(*lead, n >> 2)

    # -- continuous profile (BASELINE config 3) ---------------------------
    @property
    def halo_pairs(self) -> int:
        """Complex samples of the NEXT block's conditioned head that the
        stationary (anti-causal) filter chain needs to continue across a
        block boundary without per-block transients: 2 input pairs per
        audio-filter tap reach, plus each complex stage's own reach.
        Rounded up to even so the discriminator's 2:1 pairing never
        straddles the halo edge."""
        hp = 2 * self.out_fir.D
        if self.in_fir is not None:
            hp += self.in_fir.Dc
        if self.dc_fir is not None:
            hp += self.dc_fir.Dc
        return hp + (hp & 1)

    def condition_block(self, state: PipelineState, raw: jax.Array):
        """Conditioning stage alone: uint8 [..., n] → (new_state, cond).

        Split out for the continuous profile, where block k's filters need
        block k+1's CONDITIONED head: conditioning stays per-block (the
        correctIq tracker's two-ended order is defined over a block,
        src/matrix.c:120-140) while the filters become stationary.  kind 2
        conditions with shift_origin only — its DC-block highpass is a
        filter, so in the continuous profile it runs as a stationary stage
        of continuous_post (matching parallel.sharding's sharded step)."""
        kind = self.cfg.conditioning_kind()
        if kind == 1:
            out, off = cond_ops.correct_iq(raw, state.iq_off, self.esr,
                                           self.dtype)
            return PipelineState(iq_off=off), out
        if kind == 3:
            return state, cond_ops.normalize_input(raw, self.dtype)
        return state, cond_ops.shift_origin(raw, self.dtype)

    def continuous_post(self, cond: jax.Array, halo_cond: jax.Array):
        """Stationary filters + discriminator across the block boundary.

        cond: conditioned block [..., n]; halo_cond: the NEXT block's
        conditioned first 2·halo_pairs reals (zeros at stream end — the
        stationary filters see the stream as zero-padded beyond EOF).
        Returns audio [..., n/4] with no per-block transients: output
        sample i of any block equals the infinite-stream stationary
        response, because every stage's zero-halo error stays confined to
        the last ``reach`` samples of the extended buffer, beyond what the
        next stage consumes for the first n/4 outputs."""
        n = self.cfg.buf_size
        assert halo_cond.shape[-1] == 2 * self.halo_pairs
        ext = jnp.concatenate([cond, halo_cond], axis=-1)
        pairs = ext.reshape(*ext.shape[:-1], ext.shape[-1] // 2, 2)
        if self.dc_fir is not None:
            pairs = self.dc_fir.stationary(pairs)
        if self.in_fir is not None:
            pairs = self.in_fir.stationary(pairs)
        flat = pairs.reshape(*ext.shape)
        if self.cfg.demod_mode() == 0:
            return flat[..., :n]
        d = demod_ops.fm_demod(flat, fast=self.fast_atan2)
        audio = self.out_fir.stationary(d)
        return audio[..., : n >> 2]

    def continuous_halo(self, cond_next: jax.Array) -> jax.Array:
        """Slice the halo continuous_post wants from the next block's
        conditioned output: [..., n] → [..., 2·halo_pairs]."""
        return cond_next[..., : 2 * self.halo_pairs]

    # -- state ----------------------------------------------------------
    def init_state(self, batch_shape=()) -> PipelineState:
        return PipelineState(
            iq_off=jnp.zeros((*batch_shape, 2), dtype=self.dtype))

    # -- stages ---------------------------------------------------------
    def _condition(self, raw: jax.Array, state: PipelineState):
        """→ (conditioned [..., n], overrun|None, new_state)."""
        kind = self.cfg.conditioning_kind()
        if kind == 1:
            out, off = cond_ops.correct_iq(raw, state.iq_off, self.esr,
                                           self.dtype)
            return out, None, PipelineState(iq_off=off)
        if kind == 2:
            shifted = cond_ops.shift_origin(raw, self.dtype)
            pairs = shifted.reshape(*shifted.shape[:-1],
                                    shifted.shape[-1] // 2, 2)
            y, over = self.dc_fir(pairs)
            flat = y.reshape(*shifted.shape)
            over_flat = over.reshape(*over.shape[:-2], -1)
            return flat, over_flat, state
        if kind == 3:
            return cond_ops.normalize_input(raw, self.dtype), None, state
        return cond_ops.shift_origin(raw, self.dtype), None, state

    def post_condition(self, x: jax.Array, dc_over: jax.Array | None):
        """Filters + discriminator on conditioned data [..., n] → audio
        [..., n/4].  Split out so the sharding layer can substitute its own
        conditioning (demodulator_tpu.parallel.sharding)."""
        n = self.cfg.buf_size
        if self.in_fir is not None:
            pairs = x.reshape(*x.shape[:-1], n // 2, 2)
            y, in_over = self.in_fir(pairs, dc_over)
            demod_in = y.reshape(*x.shape[:-1], n)
            audio_y_init = in_over.reshape(*in_over.shape[:-2], -1)
        else:
            demod_in = x
            audio_y_init = dc_over
        d = demod_ops.fm_demod(demod_in, fast=self.fast_atan2)
        return self.out_fir(d, audio_y_init)

    def _backend_wants_fused(self) -> bool:
        if self.backend == "fused":
            return True
        if self.backend == "auto":
            plat = jax.default_backend()
            return plat in ("tpu", "axon")
        return False

    def _use_fused(self) -> bool:
        return self.fused_eligible and self._backend_wants_fused()

    def _use_fused_inlpf(self) -> bool:
        return self.fused_inlpf_eligible() and self._backend_wants_fused()

    def fused_call_inlpf(self, state: PipelineState, raw: jax.Array,
                         interpret: bool = False):
        """Flat uint8 wrapper of fused_call_inlpf_u32_3d (pays the
        device-side relayouts; the streaming runtime feeds 3-D instead)."""
        n = self.cfg.buf_size
        lead = raw.shape[:-1]
        rows = (n // 4) // 128
        u32 = jax.lax.bitcast_convert_type(
            raw.reshape(-1, n // 4, 4), jnp.uint32).reshape(-1, rows, 128)
        state, audio = self.fused_call_inlpf_u32_3d(state, u32,
                                                    interpret=interpret)
        return state, audio.reshape(*lead, n >> 2)

    def __call__(self, state: PipelineState, raw: jax.Array):
        """raw: uint8 [..., buf_size] → (new_state, audio [..., buf_size/4])
        (or filtered IQ [..., buf_size] in demod mode 0)."""
        cfg = self.cfg
        n = cfg.buf_size
        assert raw.shape[-1] == n
        if cfg.demod_mode() != 0 and self._use_fused():
            return self.fused_call(state, raw)
        if cfg.demod_mode() != 0 and self._use_fused_inlpf():
            return self.fused_call_inlpf(state, raw)
        if cfg.demod_mode() != 0 and self._use_fused_q2l():
            return self.fused_call_q2l(state, raw)
        if cfg.demod_mode() == 0:
            x = cond_ops.normalize_input(raw, self.dtype)
            pairs = x.reshape(*x.shape[:-1], n // 2, 2)
            y, _ = self.in_fir(pairs)
            return state, y.reshape(*x.shape[:-1], n)
        x, dc_over, state = self._condition(raw, state)
        return state, self.post_condition(x, dc_over)

    # -- conveniences ---------------------------------------------------
    def jit_block_fn(self):
        return jax.jit(self.__call__, donate_argnums=(0,))

    def process_blocks(self, state: PipelineState, raw: jax.Array):
        """raw: uint8 [B, n] → (state, audio [B, n/4]).

        Conditioning mode 1's DC tracker chains through every block, but
        the recurrence is affine, so the chain reduces to per-block
        2-vector summaries + a log-depth prefix over the block axis
        (cond_ops.correct_iq_block_prefix) — every block then conditions
        and demodulates in parallel.  A lax.scan over blocks is ~40x
        slower on TPU (measured 47 ms vs ~1 ms per 64-block step).  Every
        other mode is embarrassingly parallel outright (§1 fact 3 of
        SURVEY.md).
        """
        if self.cfg.conditioning_kind() != 1:
            return self(state, raw)
        n = self.cfg.buf_size
        if self._use_fused_q1():
            # device-side u32 pack (callers holding host buffers should
            # feed fused_call_q1_u32_3d the free host view instead)
            rows = (n // 4) // 128
            u32 = jax.lax.bitcast_convert_type(
                raw.reshape(-1, n // 4, 4), jnp.uint32).reshape(
                    -1, rows, 128)
            st, audio = self.fused_call_q1_u32_3d(state, u32)
            return st, audio.reshape(*raw.shape[:-1], n >> 2)
        decay = cond_ops.correct_iq_decay(n, self.esr, self.dtype)
        a_tot = (decay[-1] * decay[1]).astype(self.dtype)
        out0, b_tot = cond_ops.correct_iq_zero(raw, self.esr, self.dtype)
        off_before, (A, b) = cond_ops.correct_iq_block_prefix(
            a_tot, b_tot, state.iq_off)
        final = A * state.iq_off + b
        cond = cond_ops.correct_iq_apply_offset(out0, off_before, decay)
        audio = self.post_condition(cond, None)
        return PipelineState(iq_off=final), audio
