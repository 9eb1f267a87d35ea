"""Throughput benchmark: flagship NBFM demod chain, single chip.

Prints ONE JSON line: IQ complex Msamples/s through the full per-block
pipeline (conditioning → discriminator → audio FIR) on device-resident
data.  vs_baseline is the ratio to the reference's demonstrated real-time
rate (192 ksps complex sustained through its decode pipelines — the only
performance fact the reference exhibits; BASELINE.md).
"""
import json
import time

import numpy as np


def main():
    import jax
    from demodulator_tpu.config import DemodConfig
    from demodulator_tpu.models.nbfm import BlockPipeline

    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0)
    pipe = BlockPipeline(cfg, fast_atan2=True)

    B = 32  # blocks per step: 32 × 256 KiB = 8 MiB uint8 per step
    rng = np.random.default_rng(0)
    raw_np = rng.integers(0, 256, size=(B, cfg.buf_size), dtype=np.uint8)
    raw = jax.device_put(raw_np)
    state = pipe.init_state()

    fn = jax.jit(pipe.process_blocks)
    out = fn(state, raw)[1]
    out.block_until_ready()  # compile + warmup

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(state, raw)[1]
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    complex_samples = B * cfg.buf_size / 2
    msps = complex_samples / dt / 1e6
    print(json.dumps({
        "metric": "nbfm_demod_iq_throughput_per_chip",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps * 1e6 / 192000.0, 1),
    }))


if __name__ == "__main__":
    main()
