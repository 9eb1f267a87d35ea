"""Channel bank: per-channel tone recovery, continuity, chan-axis sharding."""
import numpy as np
import pytest

import jax

from demodulator_tpu.models.channel_bank import (ChannelBankConfig,
                                                 ChannelBankPipeline)

FS = 1536000.0       # 8 × 192 kHz (small for CPU tests)
CR = 192000.0


def synth_bank(fs, offsets, tones, n, dev=5000.0, seed=0):
    """Wideband uint8 IQ containing one NBFM carrier per offset."""
    t = np.arange(n) / fs
    z = np.zeros(n, np.complex128)
    rng = np.random.default_rng(seed)
    for off, tone in zip(offsets, tones):
        msg = np.sin(2 * np.pi * tone * t)
        phase = 2 * np.pi * dev * np.cumsum(msg) / fs
        z += 0.3 * np.exp(1j * (2 * np.pi * off * t + phase))
    z += (rng.normal(0, .01, n) + 1j * rng.normal(0, .01, n))
    iq = np.empty(2 * n)
    iq[0::2], iq[1::2] = z.real, z.imag
    return np.clip(np.round(iq * 127 + 127), 0, 255).astype(np.uint8)


OFFSETS = (-480000.0, 0.0, 384000.0)
TONES = (700.0, 1500.0, 2500.0)


def _pipe(block_seconds=0.02):
    cfg = ChannelBankConfig(sample_rate=FS, channel_rate=CR,
                            offsets_hz=OFFSETS, block_seconds=block_seconds)
    return ChannelBankPipeline(cfg)


def test_geometry():
    p = _pipe()
    assert p.block_complex % p.cfg.decim() == 0
    assert p.audio_per_block == p.block_complex // p.cfg.decim() // 2


def test_each_channel_recovers_its_tone():
    p = _pipe()
    n = 4 * p.block_complex
    raw = synth_bank(FS, OFFSETS, TONES, n)
    st = p.init_state()
    outs = []
    for b in range(4):
        st, y = p(st, raw[b * p.block_bytes:(b + 1) * p.block_bytes])
        outs.append(np.asarray(y))
    audio = np.concatenate(outs, axis=-1)[:, p.audio_per_block:]
    arate = CR / 2
    f = np.fft.rfftfreq(audio.shape[-1], 1 / arate)
    for c, tone in enumerate(TONES):
        mag = np.abs(np.fft.rfft(audio[c] * np.hanning(audio.shape[-1])))
        peak = f[np.argmax(mag[3:]) + 3]
        assert abs(peak - tone) < 15.0, (c, peak, tone)
        # neighbor tones rejected: level at the other tones well below
        own = mag[np.argmin(np.abs(f - tone))]
        for other in TONES:
            if other != tone:
                assert mag[np.argmin(np.abs(f - other))] < own / 10


def test_streaming_continuity():
    p_small = _pipe(block_seconds=0.005)
    p_big = _pipe(block_seconds=0.02)
    assert p_big.block_bytes == 4 * p_small.block_bytes
    raw = synth_bank(FS, OFFSETS, TONES, 4 * p_small.block_complex, seed=5)
    st = p_small.init_state()
    outs = []
    for b in range(4):
        st, y = p_small(st, raw[b * p_small.block_bytes:
                                (b + 1) * p_small.block_bytes])
        outs.append(np.asarray(y))
    blocked = np.concatenate(outs, axis=-1)
    _, whole = p_big(p_big.init_state(), raw)
    np.testing.assert_allclose(blocked, np.asarray(whole), atol=3e-5)


def test_chan_axis_sharding():
    """8 channels over a ('time'=1, 'chan'=4) CPU mesh: SPMD, no comm."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from demodulator_tpu.parallel.mesh import make_demod_mesh
    offs = tuple(float(o) for o in np.linspace(-600000, 600000, 8))
    cfg = ChannelBankConfig(sample_rate=FS, channel_rate=CR,
                            offsets_hz=offs, block_seconds=0.005)
    p = ChannelBankPipeline(cfg)
    raw = synth_bank(FS, offs, (1000.0,) * 8, p.block_complex, seed=7)

    st_plain, y_plain = p(p.init_state(), raw)

    mesh = make_demod_mesh(1, 4, devices=np.array(jax.devices()[:4]))
    p2 = ChannelBankPipeline(cfg)
    st, chan_sh = p2.shard_over(mesh, p2.init_state())
    fn = jax.jit(p2.__call__)
    st2, y = fn(st, raw)
    assert y.sharding.is_equivalent_to(chan_sh, y.ndim)
    # sharded reduction order differs from single-device → f32 noise only
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_plain), atol=1e-4)


def test_chan_axis_sharding_pfb():
    """PFB method over the chan axis: wideband front replicated, per-channel
    audio state sharded; output matches the unsharded bank exactly in shape
    and to f32 noise in value."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from demodulator_tpu.parallel.mesh import make_demod_mesh
    offs = tuple(float(o) for o in np.linspace(-4 * CR, 3 * CR, 8))
    cfg = ChannelBankConfig(sample_rate=FS, channel_rate=CR,
                            offsets_hz=offs, block_seconds=0.005)
    p = ChannelBankPipeline(cfg)
    assert p.method == "pfb"
    raw = synth_bank(FS, offs, (1000.0,) * 8, p.block_complex, seed=8)
    st_plain, y_plain = p(p.init_state(), raw)

    mesh = make_demod_mesh(1, 4, devices=np.array(jax.devices()[:4]))
    p2 = ChannelBankPipeline(cfg)
    st, chan_sh = p2.shard_over(mesh, p2.init_state())
    st2, y = jax.jit(p2.__call__, out_shardings=(None, chan_sh))(st, raw)
    assert y.sharding.is_equivalent_to(chan_sh, y.ndim)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_plain), atol=1e-4)


def test_pfb_auto_selected_on_grid():
    """On-grid offsets → PFB method; off-grid → mixer fallback."""
    on = ChannelBankConfig(sample_rate=FS, channel_rate=CR,
                           offsets_hz=(-CR, 0.0, 2 * CR))
    assert ChannelBankPipeline(on).method == "pfb"
    off = ChannelBankConfig(sample_rate=FS, channel_rate=CR,
                            offsets_hz=OFFSETS)  # -480k = -2.5 grid steps
    assert ChannelBankPipeline(off).method == "mixer"
    with pytest.raises(ValueError):
        ChannelBankPipeline(ChannelBankConfig(
            sample_rate=FS, channel_rate=CR, offsets_hz=OFFSETS,
            method="pfb"))


def test_pfb_bank_recovers_tones():
    """End-to-end PFB bank: each on-grid channel demodulates its own FM
    carrier, matching the mixer path's recovered audio (>25 dB agreement
    after settling — different anti-alias prototypes, same signal)."""
    offs = (-2 * CR, 0.0, 3 * CR)
    tones = (700.0, 1500.0, 2500.0)
    blk = ChannelBankPipeline(ChannelBankConfig(
        sample_rate=FS, channel_rate=CR, offsets_hz=offs,
        block_seconds=0.02)).block_complex
    raw = synth_bank(FS, offs, tones, 4 * blk, seed=9)
    audio = {}
    for method in ("pfb", "mixer"):
        cfg = ChannelBankConfig(sample_rate=FS, channel_rate=CR,
                                offsets_hz=offs, block_seconds=0.02,
                                method=method)
        p = ChannelBankPipeline(cfg)
        assert p.method == method
        st = p.init_state()
        outs = []
        for b in range(4):
            st, y = p(st, raw[b * p.block_bytes:(b + 1) * p.block_bytes])
            outs.append(np.asarray(y))
        audio[method] = np.concatenate(outs, axis=-1)[:, p.audio_per_block:]
    arate = CR / 2
    f = np.fft.rfftfreq(audio["pfb"].shape[-1], 1 / arate)
    for c, tone in enumerate(tones):
        mag = np.abs(np.fft.rfft(audio["pfb"][c]
                                 * np.hanning(audio["pfb"].shape[-1])))
        assert abs(f[np.argmax(mag[3:]) + 3] - tone) < 15.0, (c, tone)
    # cross-method agreement: FM demod is nonlinear and the two paths use
    # different anti-alias prototypes, so exact waveforms differ — but the
    # recovered tone LEVEL must match within 1 dB, the waveforms must
    # correlate strongly after delay alignment, and each channel must
    # reject its neighbors' tones
    n = audio["pfb"].shape[-1]
    w = np.hanning(n)
    for c, tone in enumerate(tones):
        a, b = audio["pfb"][c], audio["mixer"][c]
        xc = np.correlate(a - a.mean(), b - b.mean(), "full")
        corr = np.abs(xc).max() / (np.std(a) * np.std(b) * n)
        assert corr > 0.9, (c, corr)
        la = np.abs(np.fft.rfft(a * w))
        lb = np.abs(np.fft.rfft(b * w))
        bi = np.argmin(np.abs(f - tone))
        ratio_db = 20 * np.log10(la[bi] / lb[bi])
        assert abs(ratio_db) < 1.0, (c, ratio_db)
        for other in tones:
            if other != tone:
                oi = np.argmin(np.abs(f - other))
                assert la[oi] < la[bi] / 10, (c, other)


def test_pfb_streaming_continuity():
    offs = (-2 * CR, 0.0, 3 * CR)
    cfg_s = ChannelBankConfig(sample_rate=FS, channel_rate=CR,
                              offsets_hz=offs, block_seconds=0.005)
    cfg_b = ChannelBankConfig(sample_rate=FS, channel_rate=CR,
                              offsets_hz=offs, block_seconds=0.02)
    ps, pb = ChannelBankPipeline(cfg_s), ChannelBankPipeline(cfg_b)
    assert ps.method == pb.method == "pfb"
    assert pb.block_bytes == 4 * ps.block_bytes
    raw = synth_bank(FS, offs, (1000.0,) * 3, 4 * ps.block_complex, seed=2)
    st = ps.init_state()
    outs = []
    for b in range(4):
        st, y = ps(st, raw[b * ps.block_bytes:(b + 1) * ps.block_bytes])
        outs.append(np.asarray(y))
    _, whole = pb(pb.init_state(), raw)
    np.testing.assert_allclose(np.concatenate(outs, axis=-1),
                               np.asarray(whole), atol=3e-5)


def test_call_u16_matches_call_mixer():
    """call_u16 (zero-copy host u16 view, the CLI/bench entry) must be
    numerically identical to __call__ on the raw bytes — mixer method."""
    p = _pipe()
    assert p.method == "mixer"
    n = 2 * p.block_complex
    raw = synth_bank(FS, OFFSETS, TONES, n)
    st_a = p.init_state()
    st_b = p.init_state()
    for b in range(2):
        blk = raw[b * p.block_bytes:(b + 1) * p.block_bytes]
        st_a, ya = p(st_a, blk)
        st_b, yb = p.call_u16(st_b, np.ascontiguousarray(blk)
                              .view(np.uint16))
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
    for a, b_ in zip(jax.tree.leaves(st_a), jax.tree.leaves(st_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_call_u16_matches_call_pfb():
    """Same equivalence on the polyphase-filterbank method (on-grid)."""
    offs = (-384000.0, 0.0, 192000.0)
    cfg = ChannelBankConfig(sample_rate=FS, channel_rate=CR,
                            offsets_hz=offs, block_seconds=0.02,
                            method="pfb")
    p = ChannelBankPipeline(cfg)
    raw = synth_bank(FS, offs, TONES, 2 * p.block_complex)
    st_a = p.init_state()
    st_b = p.init_state()
    for b in range(2):
        blk = raw[b * p.block_bytes:(b + 1) * p.block_bytes]
        st_a, ya = p(st_a, blk)
        st_b, yb = p.call_u16(st_b, np.ascontiguousarray(blk)
                              .view(np.uint16))
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
