"""Polyphase resampler op: exactness vs a naive upfirdn oracle, streaming
continuity, and design sanity."""
import numpy as np
import pytest

from demodulator_tpu.ops.resample import (PolyResampler, design_resampler_taps,
                                          kaiser_lowpass)
from tests.conftest import snr_db


def naive_upfirdn(h, x, L, M, n_out):
    """y[m] = Σ_j h[mM − jL]·x[j], x zero before t=0 (the op's contract)."""
    K = len(h)
    y = np.zeros(n_out, np.float64)
    for m in range(n_out):
        for j in range(len(x)):
            k = m * M - j * L
            if 0 <= k < K:
                y[m] += h[k] * x[j]
    return y


@pytest.mark.parametrize("L,M", [(1, 25), (1, 5), (2, 3), (3, 2), (5, 4), (1, 1)])
def test_matches_naive_oracle(L, M):
    rng = np.random.default_rng(0)
    h = rng.normal(size=37)
    r = PolyResampler(L, M, h)
    T = 5 * M  # satisfies T·L % M == 0
    x = rng.normal(size=T).astype(np.float32)
    y, _ = r(x, r.init_hist())
    want = naive_upfirdn(h, x, r.L, r.M, r.out_len(T))
    np.testing.assert_allclose(np.asarray(y), want, rtol=0, atol=1e-4)


@pytest.mark.parametrize("L,M", [(1, 25), (2, 3), (5, 4)])
def test_streaming_continuity(L, M):
    """Blocked processing with history == one-shot processing."""
    rng = np.random.default_rng(1)
    h = design_resampler_taps(L, M, 48000.0, atten_db=60.0)
    r = PolyResampler(L, M, h)
    T = 8 * M * L
    nblk = 4
    x = rng.normal(size=nblk * T).astype(np.float32)
    whole, _ = r(x, r.init_hist())
    hist = r.init_hist()
    parts = []
    for b in range(nblk):
        y, hist = r(x[b * T:(b + 1) * T], hist)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(whole),
                               rtol=0, atol=1e-5)


def test_batch_broadcast():
    rng = np.random.default_rng(2)
    h = rng.normal(size=21)
    r = PolyResampler(1, 4, h)
    x = rng.normal(size=(3, 2, 64)).astype(np.float32)
    y, hist = r(x, r.init_hist((3, 2)))
    assert y.shape == (3, 2, 16) and hist.shape == (3, 2, r.hist_len)
    y0, _ = r(x[1, 1], r.init_hist())
    np.testing.assert_allclose(np.asarray(y[1, 1]), np.asarray(y0), atol=1e-6)


def test_decimator_rejects_out_of_band():
    """Decimate 8:1 with an 80 dB design: an out-of-band tone must vanish."""
    fs = 192000.0
    h = design_resampler_taps(1, 8, fs, atten_db=80.0)
    r = PolyResampler(1, 8, h)
    t = np.arange(8192) / fs
    inband = np.sin(2 * np.pi * 4000.0 * t).astype(np.float32)
    outband = np.sin(2 * np.pi * 40000.0 * t).astype(np.float32)
    yi, _ = r(inband, r.init_hist())
    yo, _ = r(outband, r.init_hist())
    skip = len(h) // 8 + 8  # startup transient (signal starts abruptly at t=0)
    yi, yo = np.asarray(yi)[skip:], np.asarray(yo)[skip:]
    assert np.abs(yi).max() > 0.9          # passband preserved
    assert np.abs(yo).max() < 10 ** (-70 / 20)  # stopband rejected


def test_upsampler_gain_and_rate():
    """L=3 upsampling preserves tone amplitude (DC gain L folded into taps)."""
    fs = 8000.0
    h = design_resampler_taps(3, 1, fs, atten_db=70.0)
    r = PolyResampler(3, 1, h)
    t = np.arange(3000) / fs
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y, _ = r(x, r.init_hist())
    y = np.asarray(y)
    assert y.shape == (9000,)
    mid = y[2000:7000]
    assert 0.95 < np.abs(mid).max() < 1.05
    # dominant frequency unchanged: 440 Hz at 24 kHz
    f = np.fft.rfftfreq(len(mid), 1 / (3 * fs))
    mag = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    assert abs(f[np.argmax(mag)] - 440.0) < 5.0


def test_kaiser_lowpass_basic():
    h = kaiser_lowpass(101, 1000.0, 8000.0)
    assert len(h) == 101 and abs(h.sum() - 1.0) < 1e-12
    np.testing.assert_allclose(h, h[::-1])  # linear phase


def test_framed_matches_flat():
    """PolyResampler.framed == __call__ on the flattened input (both the
    outputs and the carried history), across decimation factors."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    for M, R in [(8, 4), (4, 3), (1, 2)]:
        taps = design_resampler_taps(1, M, 192000.0 * M, atten_db=70.0)
        r = PolyResampler(1, M, taps)
        stride = r.chunk * M
        x = rng.standard_normal((2, R * stride)).astype(np.float32)
        hist = rng.standard_normal((2, r.hist_len)).astype(np.float32)
        y_ref, h_ref = r(jnp.asarray(x), jnp.asarray(hist))
        y_fr, h_fr = r.framed(jnp.asarray(x).reshape(2, R, stride),
                              jnp.asarray(hist))
        np.testing.assert_allclose(np.asarray(y_fr).reshape(2, -1),
                                   np.asarray(y_ref), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(h_fr), np.asarray(h_ref))


def test_framed_reusable_across_jit_traces():
    """The framed-geometry cache must hold host constants: a PolyResampler
    whose .framed first runs inside one jit trace must stay usable from a
    second, different jit (regression: jnp constants created during the
    first trace were cached on self and leaked as tracers)."""
    import jax
    import jax.numpy as jnp
    taps = design_resampler_taps(1, 4, 192000.0, cutoff=20000.0)
    r = PolyResampler(1, 4, taps)
    stride = r.chunk * r.M
    R = 3
    x = np.random.default_rng(0).normal(size=(2, R, stride)).astype(np.float32)
    h0 = r.init_hist((2,))

    @jax.jit
    def f1(xf, h):
        return r.framed(xf, h)

    @jax.jit
    def f2(xf, h):  # a distinct jit → a distinct trace
        y, hh = r.framed(xf, h)
        return y * 2.0, hh

    y1, _ = f1(jnp.asarray(x), h0)
    y2, _ = f2(jnp.asarray(x), h0)
    np.testing.assert_allclose(np.asarray(y2), 2.0 * np.asarray(y1),
                               rtol=1e-6)


def test_framed2_matches_framed():
    """framed2's even/odd outputs interleave back to framed's output (the
    column split happens in the host tap matrices; the half-width matmuls
    may reduce in a different order, so ~1-ulp tolerance)."""
    import jax.numpy as jnp
    taps = design_resampler_taps(1, 4, 192000.0, cutoff=20000.0)
    r = PolyResampler(1, 4, taps)
    stride = r.chunk * r.M
    R = 5
    x = np.random.default_rng(3).normal(size=(2, R, stride)).astype(np.float32)
    h0 = r.init_hist((2,))
    y, h1 = r.framed(jnp.asarray(x), h0)
    ye, yo, h2 = r.framed2(jnp.asarray(x), h0)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(np.asarray(y)[..., 0::2], np.asarray(ye),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y)[..., 1::2], np.asarray(yo),
                               rtol=1e-5, atol=1e-6)
