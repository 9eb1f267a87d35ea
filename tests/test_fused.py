"""Fused Pallas NBFM kernel vs the XLA reference path.

The fused kernel (ops/pallas/fused_nbfm.py) runs in interpret mode on the
CPU mesh here; on real TPU it is the flagship fast path selected by
BlockPipeline(backend='auto').  Numerics: identical conditioning math,
identical polynomial atan2, identical tap order — differences are limited
to f32 rounding of the shifted-MAC FIR, so we assert tight SNR.
"""
import numpy as np
import pytest

from demodulator_tpu.config import DemodConfig
from demodulator_tpu.models.nbfm import BlockPipeline
from tests.conftest import snr_db

# small lane-aligned block: 4096 bytes → 1024 demod samples → 8×128 tile
BUF = 4096


def _raw(blocks=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(blocks, BUF), dtype=np.uint8)


@pytest.mark.parametrize("q", [0, 3])  # shift_origin, normalize_input
def test_fused_matches_xla(q):
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      buf_size=BUF, mode=0x10 | (q << 2))
    pipe = BlockPipeline(cfg, fast_atan2=True, backend="xla")
    assert pipe.fused_eligible
    raw = _raw()
    state = pipe.init_state()
    _, want = pipe(state, raw)
    _, got = pipe.fused_call(state, raw, interpret=True)
    assert got.shape == want.shape == (3, BUF // 4)
    got, want = np.asarray(got), np.asarray(want)
    assert snr_db(want.ravel(), got.ravel()) > 110.0
    # head rows are computed by the identical f64 patch on both paths
    W = pipe.out_fir.H
    np.testing.assert_array_equal(got[:, :W], want[:, :W])


@pytest.mark.parametrize("q", [0, 3])
def test_fused_precise_is_default_and_matches_exact_atan2(q):
    """VERDICT weak #4: the default-flag pipeline (no --fast-atan2) is now
    fused-eligible; its precise kernel (exact division + the ~1-ULP
    polynomial) must track the exact-arctan2 XLA path to float32 noise."""
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      buf_size=BUF, mode=0x10 | (q << 2))
    pipe = BlockPipeline(cfg, backend="xla")  # fast_atan2 defaults False
    assert pipe.fused_eligible
    raw = _raw(blocks=3, seed=11)
    state = pipe.init_state()
    _, want = pipe(state, raw)             # XLA path: jnp.arctan2
    _, got = pipe.fused_call(state, raw, interpret=True)
    got, want = np.asarray(got), np.asarray(want)
    assert snr_db(want.ravel(), got.ravel()) > 110.0
    # per-sample bound: |poly - arctan2| ≤ 2.4e-7 rad through the FIR taps
    assert float(np.max(np.abs(got - want))) < 5e-6
    W = pipe.out_fir.H
    np.testing.assert_array_equal(got[:, :W], want[:, :W])


def test_fused_inlpf_precise_default():
    """-L chain, default flags: fused-eligible with the precise kernel."""
    import jax.numpy as jnp
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=6500.0,
                      lowpass_in=12500.0, buf_size=BUF)
    pipe = BlockPipeline(cfg, backend="xla")
    assert pipe.fused_inlpf_eligible()
    rng = np.random.default_rng(13)
    raw = rng.integers(0, 256, size=(2, BUF), dtype=np.uint8)
    st = pipe.init_state((2,))
    _, want = pipe(st, raw)
    _, got = pipe.fused_call_inlpf(st, jnp.asarray(raw), interpret=True)
    w, g = np.asarray(want), np.asarray(got)
    assert snr_db(w.ravel(), g.ravel()) > 110.0


def test_fused_matches_oracle():
    """End-to-end: fused kernel vs the numpy golden model of the C chain."""
    from demodulator_tpu.oracle.pipeline import OraclePipeline
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0, buf_size=BUF)
    pipe = BlockPipeline(cfg, fast_atan2=True, backend="fused")
    raw = _raw(blocks=2, seed=7)
    _, got = pipe.fused_call(pipe.init_state(), raw, interpret=True)
    want = OraclePipeline(cfg).process_stream(raw.tobytes())
    assert snr_db(want, np.asarray(got).ravel()) > 60.0


def test_fused_eligibility_gates():
    # input LPF present → not eligible
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      lowpass_in=15000.0, in_filter_degree=4, buf_size=BUF)
    assert not BlockPipeline(cfg, backend="xla").fused_eligible
    # stateful conditioning (correctIq) → not eligible
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      buf_size=BUF, mode=0x10 | (1 << 2))
    assert not BlockPipeline(cfg, backend="xla").fused_eligible
    # non-lane-aligned block → not eligible
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0, buf_size=256)
    assert not BlockPipeline(cfg, backend="xla").fused_eligible


def test_fused_chebyshev_taps():
    """Fused path with Chebyshev-I output filter (different taps/degree)."""
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=9500.0,
                      out_filter_degree=5, epsilon=0.25, mode=0x11,
                      buf_size=BUF)
    pipe = BlockPipeline(cfg, fast_atan2=True, backend="xla")
    assert pipe.fused_eligible
    raw = _raw(blocks=2, seed=3)
    state = pipe.init_state()
    _, want = pipe(state, raw)
    _, got = pipe.fused_call(state, raw, interpret=True)
    assert snr_db(np.asarray(want).ravel(), np.asarray(got).ravel()) > 110.0


@pytest.mark.parametrize("deg,q,m", [(3, 0, 0), (2, 3, 1), (5, 0, 0), (8, 0, 2)])
def test_fused_inlpf_matches_xla(deg, q, m):
    """The -L fused kernel (conditioning → complex FIR → discriminator →
    audio FIR in one pass) vs the XLA path, interpret mode: tight SNR and
    bit-exact head region (the dense f64 patches are the same code)."""
    import jax.numpy as jnp
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=6500.0,
                      lowpass_in=12500.0, in_filter_degree=deg, buf_size=BUF)
    cfg.mode |= (q << 2) | (m & 3)
    pipe = BlockPipeline(cfg, fast_atan2=True, backend="xla")
    assert pipe.fused_inlpf_eligible()
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=(2, BUF), dtype=np.uint8)
    st = pipe.init_state((2,))
    _, want = pipe(st, raw)
    _, got = pipe.fused_call_inlpf(st, jnp.asarray(raw), interpret=True)
    w, g = np.asarray(want), np.asarray(got)
    assert snr_db(w.ravel(), g.ravel()) > 110.0
    H = pipe.out_fir.H
    np.testing.assert_array_equal(g[:, :H], w[:, :H])


@pytest.mark.parametrize("m", [0, 1])
def test_fused_dcblock_matches_xla(m):
    """-q2 (highpassDc, src/matrix.c:142-157) rides the same fused kernel:
    the DC-block is a complex FIR between conditioning and the
    discriminator — exactly the -L chain with the degree-3 Butterworth HP
    at 1 Hz as the stage taps."""
    import jax.numpy as jnp
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      buf_size=BUF)
    cfg.mode |= (2 << 2) | (m & 1)
    pipe = BlockPipeline(cfg, fast_atan2=True, backend="xla")
    assert pipe.fused_inlpf_eligible()
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, size=(2, BUF), dtype=np.uint8)
    st = pipe.init_state((2,))
    _, want = pipe(st, raw)
    _, got = pipe.fused_call_inlpf(st, jnp.asarray(raw), interpret=True)
    w, g = np.asarray(want), np.asarray(got)
    assert snr_db(w.ravel(), g.ravel()) > 110.0
    H = pipe.out_fir.H
    np.testing.assert_array_equal(g[:, :H], w[:, :H])


def test_fused_inlpf_3d_bytes_identical():
    """3-D and flat entries produce identical bytes (same kernel, same
    patches; only the output shape differs)."""
    import jax
    import jax.numpy as jnp
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=6500.0,
                      lowpass_in=12500.0, buf_size=BUF)
    pipe = BlockPipeline(cfg, fast_atan2=True, backend="xla")
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, size=(2, BUF), dtype=np.uint8)
    st = pipe.init_state((2,))
    _, flat = pipe.fused_call_inlpf(st, jnp.asarray(raw), interpret=True)
    rows = (BUF // 4) // 128
    u32 = jnp.asarray(raw.view(np.uint32).reshape(2, rows, 128))
    _, a3d = pipe.fused_call_inlpf_u32_3d(st, u32, interpret=True)
    np.testing.assert_array_equal(np.asarray(a3d).reshape(2, -1),
                                  np.asarray(flat))


def test_fused_q1_matches_xla_and_chains_state():
    """correctIq fused kernel (interpret mode): matches the XLA blocked-
    affine-prefix path to f32 noise, including the f64 head patch and the
    cross-block DC-tracker chain; two sequential dispatches equal one
    batched dispatch (streaming continuity)."""
    import jax.numpy as jnp
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      buf_size=BUF, mode=0x10 | (1 << 2))
    pipe = BlockPipeline(cfg, backend="xla")
    assert pipe.fused_q1_eligible()
    rng = np.random.default_rng(21)
    B = 6
    raw = rng.integers(0, 256, size=(B, BUF), dtype=np.uint8)
    rows = (BUF // 4) // 128
    u32 = jnp.asarray(raw.view(np.uint32).reshape(B, rows, 128))
    st0 = pipe.init_state()

    st_f, audio = pipe.fused_call_q1_u32_3d(st0, u32, interpret=True)
    got = np.asarray(audio).reshape(B, -1)
    st_x, want = pipe.process_blocks(st0, raw)
    want = np.asarray(want)
    assert snr_db(want.ravel(), got.ravel()) > 110.0
    # head patch: f64 dense rows, same as the XLA path's head
    H = pipe.out_fir.H
    assert float(np.max(np.abs(got[:, :H] - want[:, :H]))) < 1e-4
    # carry state matches the XLA chain
    np.testing.assert_allclose(np.asarray(st_f.iq_off),
                               np.asarray(st_x.iq_off), atol=1e-3)

    # streaming continuity: block-at-a-time == batched
    st = st0
    outs = []
    for b in range(B):
        st, a1 = pipe.fused_call_q1_u32_3d(st, u32[b:b + 1], interpret=True)
        outs.append(np.asarray(a1).reshape(1, -1))
    seq = np.concatenate(outs)
    assert snr_db(got.ravel(), seq.ravel()) > 125.0


@pytest.mark.parametrize("deg,m", [(3, 0), (2, 1), (5, 0), (8, 2)])
def test_fused_q2l_matches_xla(deg, m):
    """-q2 combined with -L: BOTH complex stages (highpassDc then the input
    lowpass, src/matrix.c:142-157 + 253-266) fused into one kernel pass,
    vs the XLA path, interpret mode.  Tight SNR, bit-exact audio head
    (same dense f64 patch code), and the tail region must carry the
    dc-overrun y-coupling (ops.fir yc_tail) the kernel can't see."""
    import jax.numpy as jnp
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=6500.0,
                      lowpass_in=12500.0, in_filter_degree=deg, buf_size=BUF)
    cfg.mode |= (2 << 2) | (m & 3)
    pipe = BlockPipeline(cfg, fast_atan2=True, backend="xla")
    assert pipe.fused_q2l_eligible()
    assert not pipe.fused_inlpf_eligible()  # two stages → not the 1-stage path
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, size=(2, BUF), dtype=np.uint8)
    st = pipe.init_state((2,))
    _, want = pipe(st, raw)
    _, got = pipe.fused_call_q2l(st, jnp.asarray(raw), interpret=True)
    w, g = np.asarray(want), np.asarray(got)
    assert snr_db(w.ravel(), g.ravel()) > 110.0
    H = pipe.out_fir.H
    np.testing.assert_array_equal(g[:, :H], w[:, :H])
    # tail: the y-coupling patch region must match the XLA path tightly
    at = pipe._q2l_geometry()["at"]
    assert snr_db(w[:, -at:].ravel(), g[:, -at:].ravel()) > 100.0


def test_fused_q2l_vs_c_binary(ref_binary):
    """Fused -q2 -L chain (interpret) vs the real C binary end-to-end."""
    from tests.conftest import run_reference
    from demodulator_tpu.config import config_from_cli_opts
    rng = np.random.default_rng(12)
    iq = rng.integers(0, 256, 3 * BUF, dtype=np.uint8)
    args = ["-S", "192000", "-l", "6500", "-L", "12500", "-q", "2",
            "-b", "-6"]
    ref = run_reference(ref_binary, iq.tobytes(), args)
    cfg = config_from_cli_opts({"S": "192000", "l": "6500", "L": "12500",
                                "q": "2", "b": "-6"})
    pipe = BlockPipeline(cfg, backend="xla")
    assert pipe.fused_q2l_eligible()
    st = pipe.init_state((3,))
    import jax.numpy as jnp
    _, got = pipe.fused_call_q2l(st, jnp.asarray(iq.reshape(3, BUF)),
                                 interpret=True)
    mine = np.asarray(got).ravel()
    n = 2 * (BUF // 4)  # deterministic non-final blocks
    assert snr_db(ref[:n], mine[:n]) > 110.0


def test_fused_q1_twopass_matches_sequential():
    """Two-pass q1 (parallel summaries + prefix + parallel apply) matches
    the sequential single-pass kernel to f32 prefix noise, interpret
    mode: audio, entering offsets, and the final carry."""
    import jax.numpy as jnp
    from demodulator_tpu.ops.pallas.fused_nbfm import (
        fused_nbfm_q1_twopass_u32_3d, fused_nbfm_q1_u32_3d)
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      buf_size=BUF, mode=0x10 | (1 << 2))
    pipe = BlockPipeline(cfg, backend="xla")
    taps = tuple(float(t) for t in pipe.out_fir.host_taps)
    rng = np.random.default_rng(33)
    B = 5
    raw = rng.integers(0, 256, size=(B, BUF), dtype=np.uint8)
    rows = (BUF // 4) // 128
    u32 = jnp.asarray(raw.view(np.uint32).reshape(B, rows, 128))
    off0 = jnp.asarray([3.0, -2.0], jnp.float32)
    esr = float(pipe.esr)
    a2, offs2, fin2 = fused_nbfm_q1_twopass_u32_3d(
        u32, off0, taps, esr, interpret=True)
    a1, offs1, fin1 = fused_nbfm_q1_u32_3d(
        u32, off0, taps, esr, interpret=True)
    np.testing.assert_allclose(np.asarray(offs2), np.asarray(offs1),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fin2), np.asarray(fin1),
                               rtol=1e-5, atol=1e-3)
    assert snr_db(np.asarray(a1).ravel(), np.asarray(a2).ravel()) > 110.0
