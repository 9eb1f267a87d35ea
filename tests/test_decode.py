"""Downstream-decodability oracle — the reference's strongest functional test.

The reference validates itself by piping demodulated audio into real
decoders: DSD digital voice and multimon-ng FLEX pager decode
(/root/reference/test.sh:61-81, oldTest.sh:57-73).  Those decoders and
their golden IQ captures aren't available here, so this module synthesizes
equivalent fixtures and decodes them with small in-tree slicers:

* a FLEX-style 1600-baud 2-FSK pager burst (multimon-ng analog,
  test.sh:75-81 uses ``-m3 -l9600 -S96000``) with a hard-decision bit
  slicer — asserting BIT-IDENTICAL recovery from our CLI output and the
  C reference binary's, across the conditioning-mode matrix;
* an NBFM "voice-band" tone sequence (DSD analog, test.sh:68-73 uses
  ``-m3 -l12500 -S96000``) with a dominant-frequency segmenter —
  asserting the same tone sequence is recovered from both outputs.

Unlike the SNR tests, these fail on functionally broken output that is
numerically close (inverted polarity, scaling through zero, time shifts).
"""
import numpy as np
import pytest

from tests.conftest import run_reference
from tests.test_cli import run_cli

FS = 192000.0          # complex input rate (reference README examples)
OUT_FS = 96000.0       # demodulator output rate (inherent 2:1 decimation)
BAUD = 1600.0          # FLEX bit rate
DEV = 4800.0           # FLEX frequency deviation
SPS_OUT = int(OUT_FS / BAUD)   # 60 output samples per symbol

BLOCK = 16384          # -b -4: 4 KiB output samples per block
TRAIN = 32             # alternating training symbols for polarity detection


def make_bits(n_payload: int, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    train = np.tile([1, 0], TRAIN // 2).astype(np.uint8)
    return np.concatenate([train, rng.integers(0, 2, n_payload,
                                                dtype=np.uint8)])


def synth_fsk_bytes(bits: np.ndarray, amp: float = 80.0,
                    noise_std: float = 3.0, seed: int = 11) -> np.ndarray:
    """2-FSK at ±DEV Hz, BAUD symbols/s, as rtl-sdr style uint8 IQ."""
    sps_in = int(FS / BAUD)
    f = np.where(bits.astype(bool), DEV, -DEV).astype(np.float64)
    f = np.repeat(f, sps_in)
    phase = 2 * np.pi * np.cumsum(f) / FS
    iq = amp * np.exp(1j * phase)
    rng = np.random.default_rng(seed)
    iq = iq + (rng.standard_normal(len(iq))
               + 1j * rng.standard_normal(len(iq))) * noise_std
    out = np.empty(2 * len(iq), dtype=np.uint8)
    out[0::2] = np.clip(np.round(iq.real + 127.4), 0, 255).astype(np.uint8)
    out[1::2] = np.clip(np.round(iq.imag + 127.4), 0, 255).astype(np.uint8)
    return out


def slice_bits(audio: np.ndarray) -> np.ndarray:
    """Hard-decision FSK slicer: sign of the mid-symbol mean per symbol,
    polarity calibrated on the alternating training prefix."""
    n_sym = len(audio) // SPS_OUT
    sym = audio[: n_sym * SPS_OUT].reshape(n_sym, SPS_OUT)
    lo, hi = SPS_OUT // 3, (3 * SPS_OUT) // 4
    soft = sym[:, lo:hi].mean(axis=1)
    bits = (soft > 0).astype(np.uint8)
    train = np.tile([1, 0], TRAIN // 2).astype(np.uint8)
    agree = int((bits[:TRAIN] == train).sum())
    if agree < TRAIN // 2:
        bits ^= 1
        agree = TRAIN - agree
    assert agree >= TRAIN - 2, f"training sync failed ({agree}/{TRAIN})"
    return bits


def _fsk_outputs(ref_binary, q: int, extra_args=()):
    bits = make_bits(192)
    raw = synth_fsk_bytes(bits)
    n_full = (len(raw) // BLOCK) * BLOCK
    assert n_full >= 3 * BLOCK
    data = raw[:n_full].tobytes()
    # FLEX pipeline flags (test.sh:75-81) + block sizing + conditioning mode
    args = ["-m", "3", "-S", "96000", "-l", "9600", "-b", "-4",
            "-q", str(q), *extra_args]
    mine = run_cli(data, args)
    ref = run_reference(ref_binary, data, args)
    # exclude the reference's racy final block (src/main.c:72-91)
    n_cmp = (n_full // BLOCK - 1) * (BLOCK // 4)
    return bits, mine[:n_cmp], ref[:n_cmp]


@pytest.mark.parametrize("q", [0, 1, 2, 3])
def test_fsk_bits_match_reference(ref_binary, q):
    """Bit-identical FSK recovery from our output and the C binary's, for
    every input-conditioning mode (src/matrix.c:208-222)."""
    bits, mine, ref = _fsk_outputs(ref_binary, q)
    got_mine = slice_bits(mine)
    got_ref = slice_bits(ref)
    assert got_mine.shape == got_ref.shape
    np.testing.assert_array_equal(got_mine, got_ref)
    # and both must carry the transmitted payload.  The first symbols sit in
    # the filter's block-head transient, and -q1's DC tracker perturbs one
    # boundary symbol while converging (shared identically by both
    # pipelines), so tolerate ≤2 stray bits — a functional break (polarity
    # flip, time shift) flips ~50% of them.
    n = len(got_mine)
    errs = int((got_mine[2:n] != bits[2:n]).sum())
    assert errs <= 2, f"{errs}/{n - 2} payload bit errors vs transmitted"


def test_fsk_bits_with_input_lowpass(ref_binary):
    """Same oracle through the -L input-filter chain (applyComplexFilter
    path, src/matrix.c:260-264)."""
    bits, mine, ref = _fsk_outputs(ref_binary, 0, extra_args=["-L", "12500"])
    got_mine = slice_bits(mine)
    got_ref = slice_bits(ref)
    np.testing.assert_array_equal(got_mine, got_ref)
    n = len(got_mine)
    assert int((got_mine[2:n] != bits[2:n]).sum()) == 0


TONES = (697.0, 1209.0, 941.0, 1633.0, 852.0, 1336.0)  # DTMF-style melody


def synth_tone_fm_bytes(seg_seconds: float = 0.06, amp: float = 80.0,
                        deviation: float = 2500.0, noise_std: float = 3.0,
                        seed: int = 5) -> np.ndarray:
    """NBFM carrying a sequence of voice-band tones (one per segment)."""
    n_seg = int(FS * seg_seconds)
    t = np.arange(n_seg) / FS
    msg = np.concatenate([np.sin(2 * np.pi * f * t) for f in TONES])
    phase = 2 * np.pi * np.cumsum(deviation * msg) / FS
    iq = amp * np.exp(1j * phase)
    rng = np.random.default_rng(seed)
    iq = iq + (rng.standard_normal(len(iq))
               + 1j * rng.standard_normal(len(iq))) * noise_std
    out = np.empty(2 * len(iq), dtype=np.uint8)
    out[0::2] = np.clip(np.round(iq.real + 127.4), 0, 255).astype(np.uint8)
    out[1::2] = np.clip(np.round(iq.imag + 127.4), 0, 255).astype(np.uint8)
    return out


def dominant_tones(audio: np.ndarray, seg_seconds: float = 0.06):
    """Per-segment dominant frequency, windowed away from segment edges."""
    n_seg = int(OUT_FS * seg_seconds)
    found = []
    for k in range(len(audio) // n_seg):
        seg = audio[k * n_seg + n_seg // 8: (k + 1) * n_seg - n_seg // 8]
        mag = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        freqs = np.fft.rfftfreq(len(seg), 1 / OUT_FS)
        keep = freqs > 300.0  # ignore DC / block-transient energy
        found.append(float(freqs[keep][np.argmax(mag[keep])]))
    return found


def test_voice_band_tone_sequence(ref_binary):
    """DSD-pipeline analog: the tone melody survives both demodulators
    identically (test.sh:68-73 flags)."""
    raw = synth_tone_fm_bytes()
    n_full = (len(raw) // BLOCK) * BLOCK
    data = raw[:n_full].tobytes()
    args = ["-m", "3", "-S", "96000", "-l", "12500", "-b", "-4"]
    mine = run_cli(data, args)
    ref = run_reference(ref_binary, data, args)
    n_cmp = (n_full // BLOCK - 1) * (BLOCK // 4)
    seq_mine = dominant_tones(mine[:n_cmp])
    seq_ref = dominant_tones(ref[:n_cmp])
    assert seq_mine == pytest.approx(seq_ref, abs=1.0)
    # both recover the transmitted melody (±30 Hz FFT-bin tolerance)
    want = [TONES[min(k, len(TONES) - 1)] for k in range(len(seq_mine))]
    for got, exp in zip(seq_mine, want):
        assert abs(got - exp) < 30.0, (seq_mine, want)
