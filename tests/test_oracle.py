"""Golden-model validation: the numpy oracle vs the compiled C reference.

The final output block of any stream is excluded from comparison: the
reference's producer overwrites args->bufSize with the final 0-byte EOF
read while the consumer is mid-DSP, so its last block is garbage
(conditioned IQ instead of audio) — see src/main.c:88 + src/matrix.c:253-268.
Our framework demodulates the final block correctly instead.
"""
import numpy as np
import pytest

from demodulator_tpu.config import config_from_cli_opts
from demodulator_tpu.design.biquad import design_sos
from demodulator_tpu.oracle import ops
from demodulator_tpu.oracle.pipeline import OraclePipeline
from tests.conftest import run_reference, snr_db

BASE = {"S": "192000", "l": "12500", "b": "-6"}  # bufSize 4096

CASES = [
    ([], {}),
    (["-q", "1"], {"q": "1"}),
    (["-q", "2"], {"q": "2"}),
    (["-q", "3"], {"q": "3"}),
    (["-L", "12500"], {"L": "12500"}),
    (["-m", "1", "-e", "2"], {"m": "1", "e": "2"}),
    (["-L", "12500", "-m", "3", "-D", "4", "-d", "5"],
     {"L": "12500", "m": "3", "D": "4", "d": "5"}),
    (["-d", "5", "-q", "1"], {"d": "5", "q": "1"}),
    (["-L", "9000", "-D", "7", "-m", "2"], {"L": "9000", "D": "7", "m": "2"}),
    (["-L", "12500", "-q", "2"], {"L": "12500", "q": "2"}),
    (["-d", "1"], {"d": "1"}),
    (["-d", "2", "-m", "1"], {"d": "2", "m": "1"}),
]


@pytest.mark.parametrize("cli,opts", CASES, ids=[" ".join(c) or "default" for c, _ in CASES])
def test_oracle_matches_reference(ref_binary, iq_data, cli, opts):
    cfg = config_from_cli_opts({**BASE, **opts})
    pipe = OraclePipeline(cfg)
    mine = pipe.process_stream(iq_data.tobytes())
    ref = run_reference(ref_binary, iq_data.tobytes(),
                        ["-S", "192000", "-l", "12500", "-b", "-6", *cli])
    out_len = 4096 >> 2
    # the racy EOF iteration sometimes produces a 4th garbage block
    assert len(ref) in (3 * out_len, 4 * out_len)
    assert len(mine) == 3 * out_len
    n = 2 * out_len  # exclude racy final block(s)
    s = snr_db(ref[:n], mine[:n])
    assert s > 120.0, f"SNR vs C reference too low: {s:.1f} dB"


def test_final_block_race_documented(ref_binary, iq_data):
    """The reference's tail output is race-dependent (the producer's 0-byte
    EOF read overwrites args->bufSize mid-DSP, src/main.c:88): the final
    block is usually raw conditioned IQ instead of audio, sometimes doubled,
    occasionally correct.  Only the non-final blocks are deterministic."""
    ref = run_reference(ref_binary, iq_data.tobytes(),
                        ["-S", "192000", "-l", "12500", "-b", "-6"])
    assert len(ref) in (3 * 1024, 4 * 1024)
    cfg = config_from_cli_opts(BASE)
    want = OraclePipeline(cfg).process_stream(iq_data.tobytes())
    # non-final blocks always match the golden model
    assert snr_db(ref[:2048], want[:2048]) > 120.0
    # The tail itself is NOT asserted: it is the racy part.  Observed
    # outcomes include shiftOrigin-conditioned IQ (common), correct audio,
    # a doubled block, and occasional other garbage — classifying it here
    # is informational only (a hard assert flakes ~1% of runs).
    cond = ops.shift_origin(iq_data[2 * 4096:])
    tail_is_conditioned = np.array_equal(ref[2048:3072], cond[:1024])
    tail_is_audio = snr_db(want[2048:3072], ref[2048:3072]) > 60.0
    del tail_is_conditioned, tail_is_audio


def test_partial_tail_dropped(ref_binary, iq_data):
    """Partial final reads never produce *demodulated* output — the racy exit
    either drops the tail (usual) or emits one garbage block (occasional)."""
    data = iq_data.tobytes() + b"\x80" * 1000  # 3 blocks + 1000 stray bytes
    ref = run_reference(ref_binary, data,
                        ["-S", "192000", "-l", "12500", "-b", "-6"])
    assert len(ref) in (3 * 1024, 4 * 1024)


def test_apply_filter_isolated_bitexact(ref_harness):
    """Our recurrence model is bit-identical to the C function in isolation."""
    import subprocess
    rng = np.random.default_rng(7)
    for degree, mode in [(3, 0), (5, 1), (4, 0), (1, 0), (7, 1)]:
        sos = design_sos(mode, degree, 12500, 192000, 0.3, dtype=np.float32)
        x = (rng.standard_normal(512) * 3).astype(np.float32)
        args = [ref_harness, "real", "512", str(len(sos))] + \
            [repr(float(v)) for v in np.asarray(sos).flatten()]
        r = subprocess.run(args, input=x.tobytes(), capture_output=True,
                           check=True)
        ref = np.frombuffer(r.stdout, dtype=np.float32)
        mine = ops.apply_filter(x, 512, sos)
        np.testing.assert_array_equal(ref, mine)


def test_apply_complex_filter_isolated_bitexact(ref_harness):
    import subprocess
    rng = np.random.default_rng(8)
    for degree, mode in [(3, 0), (4, 1), (3, 2)]:
        fc = 1.0 if mode == 2 else 12500.0
        sos = design_sos(mode, degree, fc, 192000, 0.3, dtype=np.float32)
        x = (rng.standard_normal(512) * 40).astype(np.float32)
        args = [ref_harness, "cplx", "512", str(len(sos))] + \
            [repr(float(v)) for v in np.asarray(sos).flatten()]
        r = subprocess.run(args, input=x.tobytes(), capture_output=True,
                           check=True)
        ref = np.frombuffer(r.stdout, dtype=np.float32)
        mine = ops.apply_complex_filter(x, 512, sos)
        np.testing.assert_array_equal(ref, mine)


def test_shift_origin_wraps_255():
    out = ops.shift_origin(np.array([0, 127, 128, 254, 255], dtype=np.uint8))
    np.testing.assert_array_equal(out, [-127.0, 0.0, 1.0, 127.0, -128.0])


def test_correct_iq_converges_to_dc():
    """The tracker should converge toward the per-lane DC offset."""
    rng = np.random.default_rng(3)
    buf = (rng.integers(100, 156, size=8192)).astype(np.uint8)
    off = np.zeros(2, dtype=np.float32)
    for _ in range(4):
        out, off = ops.correct_iq(buf, off, np.float32(50.0 / 192000.0))
    assert 100 < off[0] < 156 and 100 < off[1] < 156


def test_fm_demod_constant_rotation():
    """A constant-frequency complex exponential demodulates to a constant
    proportional to the per-2-sample phase step (conjugate order as in C)."""
    w = 0.3
    n = 256
    ph = w * np.arange(n)
    x = np.empty(2 * n, dtype=np.float32)
    x[0::2] = np.cos(ph)
    x[1::2] = np.sin(ph)
    out = ops.fm_demod(x)
    np.testing.assert_allclose(out[1:], -w, atol=1e-5)
