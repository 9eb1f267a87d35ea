"""Numerics matrix: float64 precision mode vs the reference's
-DSET_PRECISION double build, and a jax_debug_nans sanitizer pass
(SURVEY.md §5 — the framework's answer to the reference's absent
sanitizers)."""
import os
import subprocess

import numpy as np
import jax
import pytest

from demodulator_tpu.config import DemodConfig, config_from_cli_opts
from demodulator_tpu.models.nbfm import BlockPipeline
from tests.conftest import REF_SRC, _build_ref, snr_db

BUF = 4096


@pytest.fixture(scope="session")
def ref_binary_f64():
    """Reference built with -DSET_PRECISION (double I/O + DSP)."""
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference sources not available")
    return _build_ref("f64", ["-DSET_PRECISION=ON"])


def _iq(blocks=3, seed=11):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, blocks * BUF, dtype=np.uint8)


def test_float64_matches_double_reference(ref_binary_f64):
    """--precision float64 vs the C double build: non-final blocks must
    agree far beyond float32 depth."""
    iq = _iq()
    r = subprocess.run(
        [ref_binary_f64, "-i", "-", "-o", "-", "-S", "192000",
         "-l", "12500", "-b", "-6"],
        input=iq.tobytes(), capture_output=True)
    ref = np.frombuffer(r.stdout, dtype=np.float64)

    cfg = config_from_cli_opts({"S": "192000", "l": "12500", "b": "-6"})
    cfg.precision = "float64"
    pipe = BlockPipeline(cfg)
    mine = np.asarray(pipe(pipe.init_state(),
                           iq.reshape(3, BUF))[1]).ravel()
    n = 2 * (BUF // 4)  # deterministic non-final blocks
    assert ref.size >= n
    s = snr_db(ref[:n], mine[:n])
    assert s > 200.0, s  # double-vs-double: far beyond f32's ~140 dB floor


def test_float64_pipeline_dtype():
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      buf_size=BUF, precision="float64")
    pipe = BlockPipeline(cfg)
    _, audio = pipe(pipe.init_state(), _iq(1).reshape(1, BUF))
    assert audio.dtype == np.float64


@pytest.mark.parametrize("q", [0, 1, 2, 3])
def test_debug_nans_clean(q):
    """The full per-block graph stays NaN-free under jax_debug_nans for
    every conditioning mode (the discriminator's NaN clamp is explicit,
    src/matrix.c:170-174 semantics)."""
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      buf_size=BUF, mode=0x10 | (q << 2))
    pipe = BlockPipeline(cfg, fast_atan2=True)
    raw = _iq(2, seed=q).reshape(2, BUF)
    old = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", True)
        _, audio = jax.jit(pipe.__call__)(pipe.init_state(), raw)
        assert np.all(np.isfinite(np.asarray(audio)))
    finally:
        jax.config.update("jax_debug_nans", old)


def test_debug_nans_zero_input():
    """All-zero IQ (atan2(0,0) corner): clamps to 0, no NaN trap."""
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0, buf_size=BUF)
    pipe = BlockPipeline(cfg, fast_atan2=True)
    raw = np.full((1, BUF), 127, dtype=np.uint8)  # shiftOrigin → exact zeros
    old = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", True)
        _, audio = jax.jit(pipe.__call__)(pipe.init_state(), raw)
        np.testing.assert_array_equal(np.asarray(audio), 0.0)
    finally:
        jax.config.update("jax_debug_nans", old)
