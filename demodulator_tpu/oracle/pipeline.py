"""Golden-model block pipeline + stream framing (reference consumer semantics).

Replicates processMatrix (src/matrix.c:178-280) and the producer framing
(src/main.c:58-98) including the observable quirks:

  * derived lengths are fixed from the *initial* bufSize;
  * a final short read of r bytes is memcpy'd over the previous block's
    buffer, so the processed block is r fresh bytes + (bufSize - r) stale
    bytes — but the consumer's exit-flag check races the producer and in
    practice the final partial block is DROPPED (verified empirically
    against the compiled reference: partial tails never produce output);
  * per-block zero filter state (memset at src/matrix.c:272);
  * output is exactly bufSize/4 REALs per processed block.
"""
from __future__ import annotations

import numpy as np

from ..config import DemodConfig
from ..design.biquad import design_sos, BUTTER_HP
from . import ops


class OraclePipeline:
    """Stateful golden model; mirrors one consumer thread's lifetime."""

    def __init__(self, cfg: DemodConfig, dtype=np.float32):
        self.cfg = cfg
        self.dtype = dtype
        # degree defaulting happens in the consumer (src/matrix.c:190-192)
        self.in_degree = cfg.effective_in_filter_degree()
        self.sos_out = design_sos(cfg.out_filter_family(), cfg.out_filter_degree,
                                  cfg.lowpass_out, cfg.sample_rate, cfg.epsilon,
                                  dtype=dtype)
        self.sos_in = None
        if cfg.lowpass_in:
            self.sos_in = design_sos(cfg.in_filter_family(), self.in_degree,
                                     cfg.lowpass_in, cfg.sample_rate, cfg.epsilon,
                                     dtype=dtype)
        # highpassDc designs its own deg-3 HP Butterworth at 1 Hz lazily
        # (src/matrix.c:142-157)
        self.sos_dc = None
        if cfg.conditioning_kind() == 2:
            self.sos_dc = design_sos(BUTTER_HP, 3, 1.0, cfg.sample_rate, 0.0,
                                     dtype=dtype)
        # correctIq carry state (static REAL off[2], src/matrix.c:125)
        self.iq_off = np.zeros(2, dtype=dtype)
        self.esr = dtype(50.0 / cfg.sample_rate)

    def condition(self, raw: np.ndarray) -> np.ndarray:
        kind = self.cfg.conditioning_kind()
        if kind == 1:
            out, self.iq_off = ops.correct_iq(raw, self.iq_off, self.esr, self.dtype)
            return out
        if kind == 2:
            shifted = ops.shift_origin(raw, self.dtype)
            return ops.apply_complex_filter(shifted, len(raw), self.sos_dc)
        if kind == 3:
            return ops.normalize_input(raw, self.dtype)
        return ops.shift_origin(raw, self.dtype)

    def process_block(self, raw: np.ndarray) -> np.ndarray:
        """One consumer loop iteration on a full bufSize uint8 block.

        Models the consumer's contiguous ``filterRet`` arena exactly
        (src/matrix.c:181-234): conditioning output at arena[0:n], complex
        filter output at arena[n:2n], audio output at arena[n or 2n:].
        applyComplexFilter overruns its region by up to 4*sosLen-3 entries
        (src/filter.c:233-259 index arithmetic), which lands in the head of
        the *next* region — a coupling the arena reproduces for free.
        """
        cfg = self.cfg
        n = cfg.buf_size
        out_len = n >> 2
        assert len(raw) == n
        # filterOutputLength: 2n without -L, 4n with (src/matrix.c:185,226)
        arena = np.zeros((4 if cfg.lowpass_in else 2) * n, dtype=self.dtype)
        if cfg.demod_mode() == 0:
            # "filter IQ only" path (src/matrix.c:244-251); requires an input
            # filter design (the reference reads uninitialized sosIn without -L)
            if self.sos_in is None:
                raise ValueError("demod mode 0 requires lowpass_in (reference "
                                 "reads uninitialized sosIn otherwise)")
            arena[:n] = ops.normalize_input(raw, self.dtype)
            ops.apply_complex_filter_ip(arena, arena[n:], n, self.sos_in)
            return arena[n:2 * n].copy()
        # conditioning → arena[0:n] (+ DC-block overrun into arena[n:n+small])
        kind = cfg.conditioning_kind()
        if kind == 2:
            # highpassDc: shiftOrigin into a separate static scratch (zero
            # beyond n — the C reads past its calloc; modeled as zeros), then
            # complex DC-block filter writing INTO the arena (overrun included)
            scratch = np.zeros(n + 4 * len(self.sos_dc) + 4, dtype=self.dtype)
            scratch[:n] = ops.shift_origin(raw, self.dtype)
            ops.apply_complex_filter_ip(scratch, arena, n, self.sos_dc)
        else:
            arena[:n] = self.condition(raw)
        demod_ret = np.zeros(n, dtype=self.dtype)  # calloc'd bufSize REALs
        if not self.in_degree:
            demod_ret[:out_len] = ops.fm_demod(arena[:n], self.dtype)
            ops.apply_filter_ip(demod_ret, arena[n:], out_len, self.sos_out)
            return arena[n:n + out_len].copy()
        ops.apply_complex_filter_ip(arena, arena[n:], n, self.sos_in)
        demod_ret[:out_len] = ops.fm_demod(arena[n:2 * n], self.dtype)
        ops.apply_filter_ip(demod_ret, arena[2 * n:], out_len, self.sos_out)
        return arena[2 * n:2 * n + out_len].copy()

    def process_stream(self, data: bytes) -> np.ndarray:
        """Full-file framing: only whole bufSize blocks are processed
        (final partial reads are dropped by the reference's exit race)."""
        n = self.cfg.buf_size
        outs = []
        for off in range(0, len(data) - n + 1, n):
            raw = np.frombuffer(data[off:off + n], dtype=np.uint8)
            outs.append(self.process_block(raw))
        if not outs:
            return np.zeros(0, dtype=self.dtype)
        return np.concatenate(outs)
