"""Fused Pallas PFB bank front (ops/pallas/fused_pfb.py) vs the XLA
call_split front: same math, different rounding order — fp-tolerance
agreement, exact state carry, and pipeline-level equivalence.

Hardware facts (v5e, round 5): front 228.6 us vs 750 us XLA per 3.07 Ms
block; full 64-ch bank step 269 us = 11.4 Gsps (was 791 us / 3.9 Gsps);
accuracy vs the f64 oracle 98.8 dB fused vs 96.6 dB XLA (the branch
filter runs exact f32 on the VPU).  docs/PERF_EXTENSIONS.md.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demodulator_tpu.ops.channelizer import PolyphaseChannelizer
from demodulator_tpu.ops import conditioning as cond_ops
from demodulator_tpu.ops import demod as demod_ops
from demodulator_tpu.ops.pallas.fused_pfb import (fused_pfb_demod,
                                                  pfb_tile_rows)


def _xla_front(pfb, u16, hist):
    xi, xq = cond_ops.split_iq_u16(jnp.asarray(u16), jnp.float32)
    iq = jnp.stack([xi, xq], axis=0)
    yer, yei, yor, yoi, nh = pfb.call_split(iq, hist)
    return demod_ops.fm_demod_split(yer, yei, yor, yoi, fast=True), nh


@pytest.mark.parametrize("C", [4, 8, 16, 64])
def test_kernel_matches_call_split_streaming(C):
    """Two streamed blocks: demod rows agree to fp tolerance, the carried
    conditioned history exactly.  C = 8 exercises the P·C % 128 != 0
    zero-lead pad and the multi-rotation window path; 64 the original
    two-rotation packing."""
    rng = np.random.default_rng(3)
    pfb = PolyphaseChannelizer(C)
    T = 128 * 48
    hist_x = pfb.init_hist()
    hist_k = jnp.zeros((2, pfb.hist_len), jnp.float32)
    for blk in range(2):
        u16 = rng.integers(0, 1 << 16, T, dtype=np.uint16)
        d_ref, hist_x = _xla_front(pfb, u16, hist_x)
        d, hist_k = fused_pfb_demod(jnp.asarray(u16), hist_k, pfb._h_np,
                                    C=C, interpret=True)
        d = d.reshape(-1, C)
        # angle-wrapped comparison: near-cancellation conj-products (and
        # true angles at ±π) amplify last-ulp DFT rounding differences —
        # a layout bug would be O(1) on most samples, not <0.01 rad on a
        # handful
        e = np.mod(np.asarray(d, np.float64) - np.asarray(d_ref, np.float64)
                   + np.pi, 2 * np.pi) - np.pi
        assert np.abs(e).max() < 0.01, np.abs(e).max()
        snr = 10 * np.log10(np.mean(np.asarray(d_ref) ** 2)
                            / max(np.mean(e ** 2), 1e-300))
        assert snr > 80.0, snr
        np.testing.assert_array_equal(np.asarray(hist_k),
                                      np.asarray(hist_x))


def test_tile_rows():
    assert pfb_tile_rows(24000) == 240
    assert pfb_tile_rows(48) == 48
    assert 24000 % pfb_tile_rows(24000) == 0
    assert pfb_tile_rows(7) is None


@pytest.mark.parametrize("nch", [8, 64])
def test_pipeline_fused_path_matches_unfused(monkeypatch, nch):
    """ChannelBankPipeline with the fused front forced (interpret mode)
    equals the XLA path on an FM fixture — for both the original 64-grid
    and an 8-channel grid (multi-pair rows + padded history)."""
    from demodulator_tpu.models.channel_bank import (ChannelBankConfig,
                                                     ChannelBankPipeline)
    from demodulator_tpu.ops.pallas import fused_pfb as fp
    from tests.test_channel_bank import synth_bank

    orig = fp.fused_pfb_demod
    monkeypatch.setattr(
        fp, "fused_pfb_demod",
        lambda x, h, p, C=64, precise=False, interpret=False:
        orig(x, h, p, C=C, precise=precise, interpret=True))

    fs = nch * 192000.0
    mid = nch // 2
    chans = (mid - 2, mid - 1, mid, mid + 1)
    offs = tuple((c - mid) * 192000.0 for c in chans)
    cfg = ChannelBankConfig(sample_rate=fs, channel_rate=192000.0,
                            offsets_hz=offs, lowpass_out=12500.0,
                            block_seconds=0.064 / nch)
    tones = [1000.0 * (i + 1) for i in range(len(offs))]
    raw = synth_bank(fs, offs, tones, 3 * 12288)

    pipe_f = ChannelBankPipeline(cfg)
    assert pipe_f.method == "pfb"
    pipe_f._fused_pfb_cached = True       # force (CPU would decline)
    pipe_x = ChannelBankPipeline(cfg)
    pipe_x._fused_pfb_cached = False
    assert pipe_f.block_complex % 128 == 0

    bb = pipe_f.block_bytes
    st_f, st_x = pipe_f.init_state(), pipe_x.init_state()
    for b in range(2):
        blk = np.frombuffer(raw[b * bb:(b + 1) * bb], np.uint8)
        u16 = blk.view(np.uint16)
        st_f, a_f = pipe_f.call_u16(st_f, u16)
        st_x, a_x = pipe_x.call_u16(st_x, u16)
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_x),
                                   rtol=1e-4, atol=1e-4)
