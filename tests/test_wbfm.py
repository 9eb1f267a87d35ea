"""WBFM model: tone recovery, de-emphasis response, streaming continuity."""
import numpy as np
import pytest

from demodulator_tpu.models.wbfm import WbfmConfig, WbfmPipeline


def synth_wbfm(fs, dev, tones, n, amp=0.9, seed=0, deemph_tau=0.0):
    """uint8 interleaved IQ of an FM carrier modulated by a tone sum.
    If deemph_tau > 0, the message is pre-emphasized (1-pole inverse) so a
    de-emphasizing receiver recovers the flat tone sum."""
    t = np.arange(n) / fs
    msg = sum(a * np.sin(2 * np.pi * f * t) for f, a in tones)
    msg /= max(1.0, np.abs(msg).max())
    if deemph_tau > 0:
        a = np.exp(-1.0 / (fs * deemph_tau))
        # inverse of y[k] = a·y[k-1] + (1-a)·x[k]  (pre-emphasis)
        pre = np.empty_like(msg)
        pre[0] = msg[0]
        pre[1:] = (msg[1:] - a * msg[:-1]) / (1.0 - a)
        msg = pre
    phase = 2 * np.pi * dev * np.cumsum(msg) / fs
    z = amp * np.exp(1j * phase)
    iq = np.empty(2 * n, np.float64)
    iq[0::2], iq[1::2] = z.real, z.imag
    return np.clip(np.round(iq * 127 + 127), 0, 255).astype(np.uint8), msg


def tone_level(audio, fs, freq):
    w = np.hanning(len(audio))
    mag = np.abs(np.fft.rfft(audio * w))
    f = np.fft.rfftfreq(len(audio), 1 / fs)
    return mag[np.argmin(np.abs(f - freq))] / (w.sum() / 2)


def test_block_geometry():
    cfg = WbfmConfig()
    p = WbfmPipeline(cfg)
    assert p.block_bytes % 2 == 0
    assert p.audio_per_block * 2.4e6 // 48000 * 2 == p.block_bytes / 2 * 2
    # exact rate chain: bytes/2 complex → ·L1/M1 → /2 → ·L2/M2 audio
    q = p.block_complex * p.chan.L // p.chan.M
    assert q % 2 == 0 and (q // 2 * p.audio.L) % p.audio.M == 0


def test_tone_recovery_and_rate():
    """1 kHz tone at 75 kHz deviation → 1 kHz at 48 kHz out, low distortion."""
    cfg = WbfmConfig(deemphasis_us=0.0)
    pipe = WbfmPipeline(cfg)
    n = 3 * pipe.block_complex
    raw, _ = synth_wbfm(cfg.sample_rate, 60000.0, [(1000.0, 1.0)], n)
    st = pipe.init_state()
    outs = []
    for b in range(3):
        st, y = pipe(st, raw[b * pipe.block_bytes:(b + 1) * pipe.block_bytes])
        outs.append(np.asarray(y))
    audio = np.concatenate(outs)[pipe.audio_per_block // 2:]
    f = np.fft.rfftfreq(len(audio), 1 / cfg.audio_rate)
    mag = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    assert abs(f[np.argmax(mag[5:]) + 5] - 1000.0) < 10.0
    # amplitude ≈ dev_used/dev_cfg = 0.8 after deviation normalization
    lvl = tone_level(audio, cfg.audio_rate, 1000.0)
    assert 0.7 < lvl < 0.9
    # harmonic distortion well down
    h2 = tone_level(audio, cfg.audio_rate, 2000.0)
    assert h2 < lvl / 30


def test_deemphasis_response():
    """With 75 µs de-emphasis and pre-emphasized input, 1 kHz and 10 kHz
    tones come back at their original ratio (flat end-to-end)."""
    cfg = WbfmConfig(deemphasis_us=75.0)
    pipe = WbfmPipeline(cfg)
    n = 4 * pipe.block_complex
    tones = [(1000.0, 0.5), (10000.0, 0.5)]
    raw, _ = synth_wbfm(cfg.sample_rate, 40000.0, tones, n,
                        deemph_tau=75e-6)
    st = pipe.init_state()
    outs = []
    for b in range(4):
        st, y = pipe(st, raw[b * pipe.block_bytes:(b + 1) * pipe.block_bytes])
        outs.append(np.asarray(y))
    audio = np.concatenate(outs)[pipe.audio_per_block:]
    l1 = tone_level(audio, cfg.audio_rate, 1000.0)
    l10 = tone_level(audio, cfg.audio_rate, 10000.0)
    assert 0.8 < l10 / l1 < 1.25  # flat within ~2 dB end to end

    # without receiver de-emphasis the 10 kHz tone is boosted by the
    # pre-emphasis: ratio |H|⁻¹ at 10 kHz vs 1 kHz ≈ 4.7/1.05
    cfg2 = WbfmConfig(deemphasis_us=0.0)
    pipe2 = WbfmPipeline(cfg2)
    st2 = pipe2.init_state()
    outs2 = []
    for b in range(4):
        st2, y = pipe2(st2, raw[b * pipe2.block_bytes:(b + 1) * pipe2.block_bytes])
        outs2.append(np.asarray(y))
    audio2 = np.concatenate(outs2)[pipe2.audio_per_block:]
    r2 = tone_level(audio2, cfg2.audio_rate, 10000.0) / tone_level(
        audio2, cfg2.audio_rate, 1000.0)
    assert r2 > 2.5  # boost present when de-emphasis disabled


def test_streaming_continuity():
    """Blocked output equals one-shot output (histories do their job)."""
    cfg = WbfmConfig(block_seconds=0.02)
    pipe = WbfmPipeline(cfg)
    n = 4 * pipe.block_complex
    raw, _ = synth_wbfm(cfg.sample_rate, 50000.0, [(2000.0, 1.0)], n, seed=3)
    st = pipe.init_state()
    blocked = []
    for b in range(4):
        st, y = pipe(st, raw[b * pipe.block_bytes:(b + 1) * pipe.block_bytes])
        blocked.append(np.asarray(y))
    blocked = np.concatenate(blocked)

    cfg_big = WbfmConfig(block_seconds=0.08)
    pipe_big = WbfmPipeline(cfg_big)
    assert pipe_big.block_bytes == 4 * pipe.block_bytes
    _, whole = pipe_big(pipe_big.init_state(), raw)
    np.testing.assert_allclose(blocked, np.asarray(whole), atol=2e-5)


def test_batch_channels():
    """Leading batch dim (channel bank) broadcasts through the whole chain."""
    cfg = WbfmConfig(block_seconds=0.02)
    pipe = WbfmPipeline(cfg)
    raw0, _ = synth_wbfm(cfg.sample_rate, 50000.0, [(1000.0, 1.0)],
                         pipe.block_complex, seed=1)
    raw1, _ = synth_wbfm(cfg.sample_rate, 50000.0, [(3000.0, 1.0)],
                         pipe.block_complex, seed=2)
    raw = np.stack([raw0, raw1])
    st = pipe.init_state(batch_shape=(2,))
    st, y = pipe(st, raw)
    assert y.shape == (2, pipe.audio_per_block)
    _, y0 = pipe(pipe.init_state(), raw0)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y0), atol=1e-6)


def test_framed_and_fallback_paths_agree():
    """The framed2 fast path (whole-stride blocks) and the flat fallback
    (off-stride blocks) must produce the same audio for the same stream.
    Runs the same input through a whole-stride pipe and a minimal-unit
    pipe whose geometry forces _use_framed=False."""
    import jax.numpy as jnp
    from demodulator_tpu.models.wbfm import WbfmConfig, WbfmPipeline
    big = WbfmPipeline(WbfmConfig(block_seconds=0.1))
    small = WbfmPipeline(WbfmConfig(block_seconds=1e-9))
    assert big._use_framed and not small._use_framed
    assert big.block_complex % small.block_complex == 0
    rng = np.random.default_rng(12)
    u16 = rng.integers(0, 1 << 16, size=big.block_complex,
                       dtype=np.uint16)
    stb = big.init_state()
    stb, audio_big = big.call_u16(stb, jnp.asarray(u16))
    sts = small.init_state()
    outs = []
    n = small.block_complex
    for b in range(big.block_complex // n):
        sts, y = small.call_u16(sts, jnp.asarray(u16[b * n:(b + 1) * n]))
        outs.append(np.asarray(y))
    audio_small = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(audio_big), audio_small,
                               rtol=1e-4, atol=1e-4)


def test_split2_decimator_accuracy():
    """The 2-pass operand-split channel decimator (bf16 signal exact,
    taps hi+lo — PolyResampler precision="split2_bf16") stays within
    ~1e-5 of the 6-pass HIGHEST chain: audio SNR >= 90 dB on an FM
    fixture.  v5e: 6 -> 2 MXU passes took the chain 193 -> 99 us/block
    (docs/PERF_EXTENSIONS.md r5)."""
    import jax
    cfg = WbfmConfig(sample_rate=240000.0, block_seconds=0.1)
    pipe_s = WbfmPipeline(cfg)
    assert pipe_s.chan._split2, "split mode should engage for shift/f32"
    pipe_h = WbfmPipeline(cfg)
    from demodulator_tpu.ops.resample import PolyResampler
    pipe_h.chan = PolyResampler(pipe_h.chan.L, pipe_h.chan.M,
                                pipe_h.chan._hp,
                                precision=jax.lax.Precision.HIGHEST)
    raw, _ = synth_wbfm(240000.0, 60000.0, [(1000.0, 1.0)],
                        2 * pipe_s.block_complex)
    bb = pipe_s.block_bytes
    st_s, st_h = pipe_s.init_state(), pipe_h.init_state()
    outs, outh = [], []
    for b in range(2):
        u16 = raw[b * bb:(b + 1) * bb].view(np.uint16)
        st_s, a_s = pipe_s.call_u16(st_s, u16)
        st_h, a_h = pipe_h.call_u16(st_h, u16)
        outs.append(np.asarray(a_s))
        outh.append(np.asarray(a_h))
    a_s, a_h = np.concatenate(outs), np.concatenate(outh)
    err = a_s.astype(np.float64) - a_h.astype(np.float64)
    snr = 10 * np.log10(np.mean(a_h.astype(np.float64) ** 2)
                        / max(np.mean(err ** 2), 1e-300))
    assert snr >= 90.0, snr
