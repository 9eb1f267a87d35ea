"""Throughput benchmark: flagship NBFM demod chain, single chip.

Prints ONE JSON line: IQ complex Msamples/s through the full per-block
pipeline (uint8 conditioning → quadrature discriminator → audio FIR) on
device-resident data, fused Pallas path when on TPU.

Methodology (validated against jax.profiler device traces): host-side
timing of individual dispatches is unreliable through the remote-TPU
tunnel (dispatch is async, block_until_ready returns early, and each
dispatch round-trip costs ~10 ms), so the step runs N times inside ONE
on-device lax.fori_loop.  The loop carries a true data dependency without
any buffer copies by feeding each iteration's audio output back as the
next iteration's raw input via a free bitcast (f32 → u32): a one-element
"poke" of the input buffer — the obvious alternative — is NOT aliased in
place by XLA and silently copies the whole 64 MiB batch every iteration
(~1.5 ms, 4x the step itself).  Two loop lengths cancel the fixed
dispatch latency.  vs_baseline is the ratio to the reference's
demonstrated real-time rate (192 ksps complex sustained through its
decode pipelines — the only performance fact it exhibits; BASELINE.md).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from demodulator_tpu.config import DemodConfig
    from demodulator_tpu.models.nbfm import BlockPipeline

    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0)
    pipe = BlockPipeline(cfg, fast_atan2=True, backend="auto")

    B = 256   # blocks per step: 64 MiB uint8 in, 64 MiB float32 out
    rows = (cfg.buf_size // 4) // 128
    rng = np.random.default_rng(0)
    raw_np = rng.integers(0, 256, size=(B, cfg.buf_size), dtype=np.uint8)
    state = pipe.init_state()
    if pipe._use_fused() and pipe._use_fused_3d_ok():
        # host-side view+reshape (free) — the device never repacks u8→u32
        # and never pays the flat↔3-D tiled-layout copy
        raw = jax.device_put(raw_np.view(np.uint32).reshape(B, rows, 128))
        step = lambda r: pipe.fused_call_u32_3d(state, r)[1]
        reinterpret = lambda audio: jax.lax.bitcast_convert_type(
            audio, jnp.uint32)
    else:
        raw = jax.device_put(raw_np)
        step = lambda r: pipe(state, r)[1]

        def reinterpret(audio):
            # audio is [B, n/4] f32 → raw [B, n] u8 for the next iteration
            u8x4 = jax.lax.bitcast_convert_type(audio, jnp.uint8)
            return u8x4.reshape(B, cfg.buf_size)

    fns = {}

    def timed(N):
        if N not in fns:
            @jax.jit
            def bench(x):
                def body(i, x):
                    return reinterpret(step(x))
                x = jax.lax.fori_loop(0, N, body, x)
                return x.reshape(-1)[0].astype(jnp.float32)
            float(bench(raw))  # compile + warmup
            fns[N] = bench
        t0 = time.perf_counter()
        float(fns[N](raw))
        return time.perf_counter() - t0

    # tunnel noise is additive and positive (host hiccups), so take the
    # MIN over repeats per loop length before differencing; the slope
    # cancels the fixed dispatch latency
    n_lo, n_hi = 10, 70
    reps = 4
    t_lo = min(timed(n_lo) for _ in range(reps))
    t_hi = min(timed(n_hi) for _ in range(reps))
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    if dt <= 0:  # pathological hiccup: fall back to the long run alone
        dt = t_hi / n_hi

    msps = B * cfg.buf_size / 2 / dt / 1e6
    print(json.dumps({
        "metric": "nbfm_demod_iq_throughput_per_chip",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps * 1e6 / 192000.0, 1),
    }))


if __name__ == "__main__":
    main()
