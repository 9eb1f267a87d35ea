"""Throughput benchmark: flagship NBFM demod chain, single chip.

Prints ONE JSON line: IQ complex Msamples/s through the full per-block
pipeline (uint8 conditioning → quadrature discriminator → audio FIR) on
device-resident data, fused Pallas path when on TPU.

Methodology: the step runs N times inside one on-device lax.fori_loop with
a data dependency per iteration (host-side timing through the remote-TPU
tunnel is unreliable — dispatch is async and block_until_ready returns
before execution completes).  vs_baseline is the ratio to the reference's
demonstrated real-time rate (192 ksps complex sustained through its decode
pipelines — the only performance fact it exhibits; BASELINE.md).
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
    N = 30    # on-device iterations per timing call
    rng = np.random.default_rng(0)
    raw_np = rng.integers(0, 256, size=(B, cfg.buf_size), dtype=np.uint8)
    state = pipe.init_state()
    use_u32 = pipe._use_fused()
    if use_u32:
        # host-side reinterpret (free) — the device never repacks u8→u32
        raw = jax.device_put(raw_np.view(np.uint32))
        step = lambda s, r: pipe.fused_call_u32(s, r)[1]
        poke = jnp.uint32
    else:
        raw = jax.device_put(raw_np)
        step = lambda s, r: pipe(s, r)[1]
        poke = jnp.uint8

    @jax.jit
    def bench(raw):
        # Defeat loop-invariant hoisting without copying the input: the
        # buffer rides the loop carry, so XLA aliases it in place and each
        # iteration's one-element poke only touches one row.
        def body(i, carry):
            r, acc = carry
            r = jax.lax.dynamic_update_slice(
                r, i.astype(poke)[None, None], (i % B, 0))
            out = step(state, r)
            return r, acc + out[0, 0] + out[-1, -1]
        return jax.lax.fori_loop(0, N, body, (raw, jnp.float32(0)))[1]

    float(bench(raw))  # compile + warmup
    t0 = time.perf_counter()
    float(bench(raw))
    dt = (time.perf_counter() - t0) / N

    msps = B * cfg.buf_size / 2 / dt / 1e6
    print(json.dumps({
        "metric": "nbfm_demod_iq_throughput_per_chip",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps * 1e6 / 192000.0, 1),
    }))


if __name__ == "__main__":
    main()
