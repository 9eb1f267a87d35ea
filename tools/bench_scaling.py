#!/usr/bin/env python3
"""Scaling-efficiency bench: weak scaling of the sharded demod step.

The reference scales only across compilers/ISAs (test.sh:83-86, qemu cross
runs); this framework's scaling story is the device mesh (SURVEY.md §2.10).
This harness measures weak-scaling efficiency over the `time` (or `chan`)
mesh axis: each device count d processes `--blocks-per-device` 256 KiB
blocks per device, and efficiency is thr(d) / (d · thr(1)) — the
BASELINE.md target is ≥85% at full-slice counts.

On a real TPU slice this measures ICI-attached chips; on CPU pass
`--virtual 8` to validate the harness and the sharded code path on a
virtual device mesh (numbers are then illustrative, not hardware claims).

    python tools/bench_scaling.py [--virtual 8] [--blocks-per-device 16]
        [--repeats 5] [--axis time|chan] [--q 0..3] [--profile compat]

Prints one JSON line per device count:
    {"devices": d, "msps": ..., "efficiency": ..., ...}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (harness validation)")
    ap.add_argument("--blocks-per-device", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--axis", choices=("time", "chan"), default="time")
    ap.add_argument("--q", type=int, default=0, choices=range(4),
                    help="conditioning mode (reference -q)")
    ap.add_argument("--profile", choices=("compat", "continuous"),
                    default="compat")
    ap.add_argument("--fast-atan2", action="store_true", default=True)
    args = ap.parse_args(argv)

    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from demodulator_tpu.config import DemodConfig
    from demodulator_tpu.parallel.mesh import (make_demod_mesh, TIME_AXIS,
                                               CHAN_AXIS)
    from demodulator_tpu.parallel.sharding import ShardedPipeline

    devices = jax.devices()
    counts = []
    d = 1
    while d <= len(devices):
        counts.append(d)
        d *= 2
    if counts[-1] != len(devices):
        counts.append(len(devices))

    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      mode=0x10 | (args.q << 2), profile=args.profile)
    n = cfg.buf_size
    rng = np.random.default_rng(0)
    base = None
    for d in counts:
        mesh = make_demod_mesh(devices=devices[:d]) if args.axis == "time" \
            else make_demod_mesh(n_time=1, n_chan=d, devices=devices[:d])
        sp = ShardedPipeline(cfg, mesh, fast_atan2=args.fast_atan2)
        nb = args.blocks_per_device * (d if args.axis == "time" else 1)
        nc = d if args.axis == "chan" else 1
        raw_np = rng.integers(0, 256, size=(nc, nb, n), dtype=np.uint8)
        spec = P(None, TIME_AXIS, None) if args.axis == "time" \
            else P(CHAN_AXIS, None, None)
        raw = jax.device_put(raw_np, NamedSharding(mesh, spec))
        off0 = jax.device_put(
            np.zeros((nc, 2), np.float32),
            NamedSharding(mesh, P(CHAN_AXIS if args.axis == "chan" else None,
                                  None)))
        # warmup (compile)
        off, audio = sp(off0, raw)
        jax.block_until_ready(audio)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            off, audio = sp(off0, raw)
            jax.block_until_ready(audio)
            best = min(best, time.perf_counter() - t0)
        samples = nc * nb * n / 2  # complex IQ samples in
        msps = samples / best / 1e6
        if base is None:
            base = msps
        eff = msps / (base * d)
        print(json.dumps({
            "devices": d, "axis": args.axis, "q": args.q,
            "profile": args.profile, "blocks": nc * nb,
            "msps": round(msps, 1), "efficiency": round(eff, 4),
            "backend": jax.default_backend(),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
