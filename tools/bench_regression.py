#!/usr/bin/env python3
"""Timed-run regression harness.

The framework's equivalent of the reference's 3× repeated `time demodulator`
matrix over option sets (test.sh:57-59,94-125; oldTest.sh:53-55,107-165):
runs the real CLI end-to-end (file in → file out, includes compile-or-cache,
host IO, device transfer) R times per config and reports min/median wall
time and effective Msps as JSON lines, so perf regressions show up as
diffs in CI logs.

    python tools/bench_regression.py [--blocks 64] [--repeats 3] [--configs all]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    # name → CLI args (BASELINE.json config shapes).  "{d}" expands to the
    # run's temp dir.  The *_xla rows force the unfused backend and the
    # _fast/_fused rows the Pallas one, so a regression in EITHER backend
    # path shows as a diff (the reference's compiler×flag matrix analog,
    # test.sh:83-86, oldTest.sh:122-166).
    "nbfm": ["-S", "96000", "-l", "12500"],
    "nbfm_fast": ["-S", "96000", "-l", "12500", "--fast-atan2"],
    "nbfm_xla": ["-S", "96000", "-l", "12500", "--backend", "xla"],
    "nbfm_inlpf": ["-S", "96000", "-L", "12500", "-l", "6500"],
    "nbfm_inlpf_xla": ["-S", "96000", "-L", "12500", "-l", "6500",
                       "--backend", "xla"],
    "nbfm_q2l": ["-S", "96000", "-L", "12500", "-l", "6500", "-q", "2"],
    "nbfm_cheby": ["-S", "96000", "-l", "6500", "-m", "1", "-e", "2"],
    "nbfm_correctiq": ["-S", "96000", "-l", "12500", "-q", "1"],
    "nbfm_checkpointed": ["-S", "96000", "-l", "12500",
                          "--checkpoint", "{d}/ck.npz",
                          "--checkpoint-every", "64"],
    # extension chain: 4-channel bank (PFB, on-grid) — catches regressions
    # in the channelizer/bank path the NBFM configs never touch
    "bank4": ["-S", "96000", "-l", "12500", "--bank",
              "-384000,-192000,0,192000", "--iq-rate", "768000",
              "--channel-rate", "192000"],
    # broadcast WBFM receiver chain (resampler + de-emphasis): the other
    # extension path with no NBFM overlap
    "wbfm": ["-S", "96000", "-l", "12500", "--wbfm",
             "--iq-rate", "2400000", "--audio-rate", "48000"],
}


def run_once(src: str, dst: str, args: list[str]) -> tuple[float, dict]:
    """One timed CLI run → (wall seconds, phase dict).

    DEMODULATOR_TPU_PHASES splits the wall time into build / first-output
    (trace+compile — where cache misses and tunnel stalls land) / stream,
    so an outlier run is attributable instead of corrupting the medians
    silently (the r3 REGRESSION.json lesson)."""
    env = dict(os.environ, DEMODULATOR_TPU_PHASES="1")
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "demodulator_tpu", "-i", src, "-o", dst,
         *args], cwd=REPO, capture_output=True, env=env)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        raise RuntimeError(r.stderr.decode()[-2000:])
    phases = {}
    for line in r.stderr.decode().splitlines():
        if line.startswith("PHASES "):
            phases = json.loads(line[len("PHASES "):])
    return dt, phases


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--blocks", type=int, default=64,
                    help="256 KiB blocks of random IQ per run")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--configs", default="all",
                    help="comma list of config names, or 'all'")
    ap.add_argument("--warmup", type=int, default=1,
                    help="unrecorded cache-priming runs per config (the "
                    "reference times a warm binary; this times a warm "
                    "compile cache)")
    ap.add_argument("--cooldown", type=float, default=15.0,
                    help="minimum seconds between CLI processes: the "
                    "remote TPU tunnel blocks a client that starts before "
                    "the previous one's session is torn down, and teardown "
                    "time scales with how much the previous process "
                    "compiled — the harness therefore waits "
                    "max(cooldown, 0.3×previous wall time)")
    args = ap.parse_args(argv)

    names = list(CONFIGS) if args.configs == "all" \
        else args.configs.split(",")
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, args.blocks * 262144, dtype=np.uint8)
    complex_in = data.size // 2

    # NOTE: no '-' anywhere in the temp paths (reference strstr quirk)
    with tempfile.TemporaryDirectory(prefix="benchreg", dir="/tmp") as d:
        src = os.path.join(d, "iq.dat")
        data.tofile(src)
        for name in names:
            dst = os.path.join(d, f"{name}.raw")
            cfg_args = [a.replace("{d}", d) for a in CONFIGS[name]]
            for _ in range(args.warmup):
                t, _ = run_once(src, dst, cfg_args)
                time.sleep(max(args.cooldown, 0.3 * t))
            times, phases = [], []
            for _ in range(args.repeats):
                t, ph = run_once(src, dst, cfg_args)
                times.append(t)
                phases.append(ph)
                time.sleep(max(args.cooldown, 0.3 * t))
            best = min(times)
            print(json.dumps({
                "config": name,
                "runs": [round(t, 3) for t in times],
                "median_s": round(statistics.median(times), 3),
                "best_msps_complex_e2e": round(complex_in / best / 1e6, 2),
                "stream_s": [ph.get("stream_s") for ph in phases],
                "first_output_s": [ph.get("first_output_s")
                                   for ph in phases],
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
