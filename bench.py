"""Throughput benchmark: flagship NBFM demod chain, single chip.

Default invocation prints ONE JSON line (the driver contract): IQ complex
Msamples/s through the full per-block pipeline (uint8 conditioning →
quadrature discriminator → audio FIR) on device-resident data, fused
Pallas path when on TPU.

``--matrix`` additionally benchmarks every hot configuration — q0-q3, the
fused -L / -q2 chains, float64, WBFM, the channel bank, and the sharded
step — printing one JSON line per config (with a roofline note: achieved
fraction of the minimum-HBM-traffic floor) and writing BENCH_MATRIX.json.
The reference's analog is the test.sh config×compiler timing matrix
(/root/reference/test.sh:94-125).

Methodology (validated against jax.profiler device traces): host-side
timing of individual dispatches is unreliable through the remote-TPU
tunnel (dispatch is async, block_until_ready returns early, and each
dispatch round-trip costs ~10 ms), so the step runs N times inside ONE
on-device lax.fori_loop.  The loop carries a true data dependency without
any buffer copies by feeding each iteration's audio output back as the
next iteration's raw input via a free bitcast (f32 → u32); stateful
pipelines (WBFM, bank) instead chain their carry state, with the input
dynamic-sliced by the loop index so XLA cannot hoist the computation.
A one-element "poke" of the input buffer — the obvious alternative — is
NOT aliased in place by XLA and silently copies the whole 64 MiB batch
every iteration (~1.5 ms, 4x the step itself).  Two loop lengths cancel
the fixed dispatch latency.  vs_baseline is the ratio to the reference's
demonstrated real-time rate (192 ksps complex sustained through its
decode pipelines — the only performance fact it exhibits; BASELINE.md).
"""
import argparse
import json
import time

import numpy as np

# v5e/v5-lite HBM bandwidth (public spec ~819 GB/s): the minimum-traffic
# roofline for a chain that reads the raw bytes once and writes the audio
# once.  Reported as a *note*; the floor uses each config's actual
# minimum in+out bytes.
HBM_BYTES_PER_S = 819e9


def _timed_loop(body, carry0, n_lo=10, n_hi=70, reps=4):
    """Seconds per body() application, measured as the slope between two
    on-device fori_loop lengths (min over repeats: tunnel noise is
    additive and positive)."""
    import jax
    import jax.numpy as jnp
    fns = {}

    def timed(N):
        if N not in fns:
            @jax.jit
            def bench(c):
                c = jax.lax.fori_loop(0, N, body, c)
                # consume EVERY carry leaf: XLA deletes dead while-loop
                # tuple elements, so returning only one leaf lets the
                # whole DSP chain of the others be dead-code-eliminated
                # (state-carried pipelines measured 6× too fast that way)
                tot = jnp.float32(0)
                for leaf in jax.tree.leaves(c):
                    tot += leaf.astype(jnp.float32).sum()
                return tot
            float(bench(carry0))  # compile + warmup
            fns[N] = bench
        t0 = time.perf_counter()
        float(fns[N](carry0))
        return time.perf_counter() - t0

    t_lo = min(timed(n_lo) for _ in range(reps))
    t_hi = min(timed(n_hi) for _ in range(reps))
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    if dt <= 0:  # pathological hiccup: fall back to the long run alone
        dt = t_hi / n_hi
    return dt


def _audio_to_u8(audio, B, n):
    import jax
    import jax.numpy as jnp
    u8 = jax.lax.bitcast_convert_type(audio, jnp.uint8)
    return u8.reshape(B, -1)[:, :n]


# ---------------------------------------------------------------------------
# config builders: each returns (body, carry0, iq_complex_per_step,
#                                 min_traffic_bytes)
# ---------------------------------------------------------------------------

def _flagship(fast_atan2, q=0, B=256):
    """Fused 3-D path (q0/q3): audio [B, rows, 128] f32 bitcasts straight
    back to the next iteration's u32 input — zero-copy feedback."""
    import jax
    import jax.numpy as jnp
    from demodulator_tpu.config import DemodConfig
    from demodulator_tpu.models.nbfm import BlockPipeline
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      mode=0x10 | (q << 2))
    pipe = BlockPipeline(cfg, fast_atan2=fast_atan2, backend="auto")
    n = cfg.buf_size
    rows = (n // 4) // 128
    rng = np.random.default_rng(0)
    raw_np = rng.integers(0, 256, size=(B, n), dtype=np.uint8)
    state = pipe.init_state()
    if pipe._use_fused() and pipe._use_fused_3d_ok():
        raw = jax.device_put(raw_np.view(np.uint32).reshape(B, rows, 128))

        def body(i, x):
            audio = pipe.fused_call_u32_3d(state, x)[1]
            return jax.lax.bitcast_convert_type(audio, jnp.uint32)
    else:
        raw = jax.device_put(raw_np)

        def body(i, x):
            audio = pipe(state, x)[1]
            return _audio_to_u8(audio, B, n)
    return body, raw, B * n // 2, 2 * B * n


def _inlpf(q=0, lowpass_in=True, B=256):
    """Fused -L / -q2 / combined -q2 -L chains (complex FIR stage(s)
    inside the kernel)."""
    import jax
    import jax.numpy as jnp
    from demodulator_tpu.config import DemodConfig
    from demodulator_tpu.models.nbfm import BlockPipeline
    kw = dict(sample_rate=192000.0, lowpass_out=12500.0,
              mode=0x10 | (q << 2))
    if lowpass_in:
        kw.update(lowpass_in=12500.0)
    cfg = DemodConfig(**kw)
    pipe = BlockPipeline(cfg, fast_atan2=True, backend="auto")
    n = cfg.buf_size
    rows = (n // 4) // 128
    rng = np.random.default_rng(1)
    raw_np = rng.integers(0, 256, size=(B, n), dtype=np.uint8)
    state = pipe.init_state()
    if pipe._use_fused_inlpf() or pipe._use_fused_q2l():
        call = (pipe.fused_call_inlpf_u32_3d if pipe._use_fused_inlpf()
                else pipe.fused_call_q2l_u32_3d)
        raw = jax.device_put(raw_np.view(np.uint32).reshape(B, rows, 128))

        def body(i, x):
            audio = call(state, x)[1]
            return jax.lax.bitcast_convert_type(audio, jnp.uint32)
    else:
        raw = jax.device_put(raw_np)

        def body(i, x):
            audio = pipe(state, x)[1]
            return _audio_to_u8(audio, B, n)
    return body, raw, B * n // 2, 2 * B * n


def _q1(B=256):
    """correctIq: two-pass fused kernels (parallel-grid summaries →
    log-depth prefix → parallel-grid apply; XLA blocked-affine-prefix
    fallback off-TPU).  Min traffic = input read twice + audio out."""
    import jax
    import jax.numpy as jnp
    from demodulator_tpu.config import DemodConfig
    from demodulator_tpu.models.nbfm import BlockPipeline
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      mode=0x10 | (1 << 2))
    pipe = BlockPipeline(cfg, fast_atan2=True, backend="auto")
    n = cfg.buf_size
    rng = np.random.default_rng(2)
    raw_np = rng.integers(0, 256, size=(B, n), dtype=np.uint8)
    st0 = pipe.init_state()
    if pipe._use_fused_q1():
        rows = (n // 4) // 128
        u32 = jax.device_put(raw_np.view(np.uint32).reshape(B, rows, 128))

        def body(i, carry):
            st, x = carry
            st, audio = pipe.fused_call_q1_u32_3d(st, x)
            return st, jax.lax.bitcast_convert_type(audio, jnp.uint32)
        return body, (st0, u32), B * n // 2, 3 * B * n
    raw = jax.device_put(raw_np)

    def body(i, carry):
        st, x = carry
        st, audio = pipe.process_blocks(st, x)
        return st, _audio_to_u8(audio, B, n)
    return body, (st0, raw), B * n // 2, 2 * B * n


def _f64(B=64):
    """float64 chain (-DSET_PRECISION analog): XLA path, f64 audio out."""
    import jax
    from demodulator_tpu.config import DemodConfig
    from demodulator_tpu.models.nbfm import BlockPipeline
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0,
                      precision="float64")
    pipe = BlockPipeline(cfg, backend="auto")
    n = cfg.buf_size
    rng = np.random.default_rng(3)
    raw = jax.device_put(rng.integers(0, 256, size=(B, n), dtype=np.uint8))
    state = pipe.init_state()

    def body(i, x):
        import jax.numpy as jnp
        audio = pipe(state, x)[1]          # [B, n/4] f64 = 2n bytes
        # demote before the bitcast: a 64-bit bitcast lowers through a u64
        # intermediate the TPU X64 rewriter rejects
        return _audio_to_u8(audio.astype(jnp.float32), B, n)
    return body, raw, B * n // 2, 3 * B * n  # n in + 2n out


def _wbfm():
    """WBFM broadcast chain at 2.4 Msps: state-chained loop (the overlap
    histories keep the whole audio path live), input dynamic-sliced by the
    loop index so nothing hoists."""
    import jax
    import jax.numpy as jnp
    from demodulator_tpu.models.wbfm import WbfmConfig, WbfmPipeline
    pipe = WbfmPipeline(WbfmConfig())
    T = pipe.block_complex
    rng = np.random.default_rng(4)
    base = jax.device_put(rng.integers(0, 1 << 16, size=2 * T,
                                       dtype=np.uint16))
    st0 = pipe.init_state()

    def body(i, carry):
        st, acc = carry
        x = jax.lax.dynamic_slice(base, ((i * 997) % T,), (T,))
        st, audio = pipe.call_u16(st, x)
        # accumulate the audio: a state-only carry lets XLA dead-code the
        # audio chain beyond what the histories need (_timed_loop note)
        return st, acc + audio.sum()
    out_bytes = 4 * (T * pipe.chan.L // pipe.chan.M
                     if hasattr(pipe, "chan") else T)
    return body, (st0, jnp.float32(0)), T, 2 * T + out_bytes


def _bank(n_chan=8, on_grid=False):
    """Polyphase channel bank: n_chan NBFM channels from one wide stream.
    Fed as the u16 view (one u16 per complex sample), matching the CLI's
    zero-copy host view — a device-side u8 dynamic slice into the u8→u16
    bitcast costs ~400 µs/block of pure relayout (call_u16 docstring).
    on_grid=False: half-channel offsets → the arbitrary-offset mixer path;
    on_grid=True: k·fs/C offsets → the polyphase-FFT filterbank path."""
    import jax
    import jax.numpy as jnp
    from demodulator_tpu.models.channel_bank import (ChannelBankConfig,
                                                     ChannelBankPipeline)
    fs = n_chan * 192000.0
    half = 0.0 if on_grid else 0.5
    offs = tuple((c - n_chan / 2 + half) * 192000.0 for c in range(n_chan))
    pipe = ChannelBankPipeline(ChannelBankConfig(
        sample_rate=fs, channel_rate=192000.0, offsets_hz=offs,
        lowpass_out=12500.0))
    assert pipe.method == ("pfb" if on_grid else "mixer"), pipe.method
    T = pipe.block_complex
    rng = np.random.default_rng(5)
    base = jax.device_put(rng.integers(0, 1 << 16, size=2 * T,
                                       dtype=np.uint16))
    st0 = pipe.init_state()

    def body(i, carry):
        st, acc = carry
        x = jax.lax.dynamic_slice(base, ((i * 997) % T,), (T,))
        st, audio = pipe.call_u16(st, x)
        return st, acc + audio.sum()   # keep the audio chain live
    return body, (st0, jnp.float32(0)), T, \
        2 * T + n_chan * (T // (fs // 96000.0) * 4)


def _sharded(B_per=2):
    """One sharded step on the available mesh (single chip here: exercises
    the shard_map overhead; scaling itself is tools/bench_scaling.py)."""
    import jax
    import jax.numpy as jnp
    from demodulator_tpu.config import DemodConfig
    from demodulator_tpu.parallel.mesh import make_demod_mesh
    from demodulator_tpu.parallel.sharding import ShardedPipeline
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_demod_mesh()
    n_t = mesh.devices.shape[0]
    NB = n_t * B_per * 64
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0)
    n = cfg.buf_size
    sp = ShardedPipeline(cfg, mesh, fast_atan2=True)
    rng = np.random.default_rng(6)
    raw_np = rng.integers(0, 256, size=(1, NB, n), dtype=np.uint8)
    off = jax.device_put(np.zeros((1, 2), np.float32),
                         NamedSharding(mesh, P(None, None)))
    if sp.fused_u32_ok() and sp.pipe._use_fused():
        rows = (n // 4) // 128
        u32 = jax.device_put(
            raw_np.view(np.uint32).reshape(1, NB, rows, 128),
            NamedSharding(mesh, P(None, "time", None, None)))

        def body(i, carry):
            off, x = carry
            off, audio = sp.call_u32(off, x)
            return off, jax.lax.bitcast_convert_type(audio, jnp.uint32)
        return body, (off, u32), NB * n // 2, 2 * NB * n
    raw = jax.device_put(raw_np, NamedSharding(mesh, P(None, "time", None)))

    def body(i, carry):
        off, x = carry
        off, audio = sp(off, x)
        u8 = jax.lax.bitcast_convert_type(audio, jnp.uint8)
        return off, u8.reshape(1, NB, n)
    return body, (off, raw), NB * n // 2, 2 * NB * n


def _memcpy_floor(B=256):
    """DMA-only kernel at the flagship's exact shapes: the MEASURED HBM
    read+write light-speed (the 819 GB/s paper spec is not achievable —
    see docs/PERF_NBFM.md), reported as its own matrix row and used as
    the denominator for each fused row's frac_of_measured_memcpy."""
    import jax
    import jax.numpy as jnp
    from demodulator_tpu.ops.pallas.fused_nbfm import dma_floor_u32_3d
    n = 262144
    rows = (n // 4) // 128
    rng = np.random.default_rng(8)
    u32 = jax.device_put(
        rng.integers(0, 256, size=(B, n), dtype=np.uint8)
        .view(np.uint32).reshape(B, rows, 128))

    def body(i, x):
        out = dma_floor_u32_3d(x)
        return jax.lax.bitcast_convert_type(out, jnp.uint32)
    return body, u32, B * n // 2, 2 * B * n


def _measure_e2e(name, n_blocks=96, fast_atan2=True, backend="auto",
                 pipeline_factory=None):
    """End-to-end file→device→file wall clock through StreamProcessor:
    the host-feed number the device-resident loops can't see (the
    reference's whole-process `time` runs, test.sh:57-59).  Input lives
    on tmpfs; output goes to /dev/null, so the measurement is read +
    device round-trip + write-path overhead.  ``backend`` forwards to
    BlockPipeline (fused vs xla e2e rows); ``pipeline_factory`` swaps in
    an extension pipeline (WBFM) with its own block size."""
    import os
    import tempfile
    from demodulator_tpu.config import DemodConfig
    from demodulator_tpu.runtime.stream import StreamProcessor
    cfg = DemodConfig(sample_rate=192000.0, lowpass_out=12500.0)
    proc = StreamProcessor(cfg, fast_atan2=fast_atan2, backend=backend,
                           pipeline=pipeline_factory()
                           if pipeline_factory else None)
    n = proc.block_bytes
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=n_blocks * n, dtype=np.uint8).tobytes()
    d = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.NamedTemporaryFile(dir=d, delete=False) as f:
        path = f.name
    try:  # write inside the unlinking try: no leak if the write fails
        with open(path, "wb") as f:
            f.write(data)
        with open(os.devnull, "wb") as devnull:
            with open(path, "rb") as fin:  # warmup: compile + cache
                proc.run(fin, devnull)
            best = float("inf")
            for _ in range(3):
                with open(path, "rb") as fin:
                    t0 = time.perf_counter()
                    proc.run(fin, devnull)
                    best = min(best, time.perf_counter() - t0)
    finally:
        os.unlink(path)
    msps = n_blocks * n / 2 / best / 1e6
    try:
        # the link probe must not discard an already-measured e2e number
        link = _host_link_bound(n)
    except Exception:
        link = None
    return {
        "metric": f"iq_throughput_{name}",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps * 1e6 / 192000.0, 1),
        "host_link_bound_msps": round(link, 1) if link else None,
        "e2e_frac_of_link": round(msps / link, 3) if link else None,
        "note": "file→device→file wall clock (host feed included). "
                "host_link_bound_msps is the serialized device_put+get "
                "round-trip limit of THIS host↔device link (a dev tunnel "
                "here, PCIe on a real TPU VM); frac>1 means the inflight "
                "window overlaps transfers beyond the serial bound.",
    }


def _measure_e2e_bank(n_blocks=12, n_chan=4):
    """End-to-end wall clock of the --bank CLI loop body: tmpfs file →
    u16 view → ChannelBankPipeline (PFB) → per-channel /dev/null writes,
    with the CLI's one-block inflight window."""
    import os
    import tempfile
    import jax
    from demodulator_tpu.models.channel_bank import (ChannelBankConfig,
                                                     ChannelBankPipeline)
    fs = n_chan * 192000.0
    offs = tuple((c - n_chan / 2) * 192000.0 for c in range(n_chan))
    pipe = ChannelBankPipeline(ChannelBankConfig(
        sample_rate=fs, channel_rate=192000.0, offsets_hz=offs,
        lowpass_out=12500.0))
    rng = np.random.default_rng(13)
    data = rng.integers(0, 256, size=n_blocks * pipe.block_bytes,
                        dtype=np.uint8)
    d = "/dev/shm" if os.path.isdir("/dev/shm") else None
    fn = jax.jit(pipe.call_u16)

    def run(path, sink):
        state = pipe.init_state()
        pending = None
        with open(path, "rb") as fin:
            while True:
                raw = fin.read(pipe.block_bytes)
                if len(raw) < pipe.block_bytes:
                    break
                u16 = np.frombuffer(raw, np.uint16)
                state, audio = fn(state, u16)
                if pending is not None:
                    sink.write(np.asarray(pending).tobytes())
                pending = audio
            if pending is not None:
                sink.write(np.asarray(pending).tobytes())

    with tempfile.NamedTemporaryFile(dir=d, delete=False) as f:
        path = f.name
    try:
        with open(path, "wb") as f:
            f.write(data.tobytes())
        with open(os.devnull, "wb") as devnull:
            run(path, devnull)                      # warmup / compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run(path, devnull)
                best = min(best, time.perf_counter() - t0)
    finally:
        os.unlink(path)
    msps = n_blocks * pipe.block_bytes / 2 / best / 1e6
    return {
        "metric": "iq_throughput_e2e_bank4_pfb",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps * 1e6 / 192000.0, 1),
        "note": "4-channel PFB bank, file→device→per-channel-write wall "
                "clock (the --bank CLI loop body)",
    }


def _host_link_bound(n, reps=6):
    """Serialized per-block device round-trip limit: device_put a block's
    uint32 view, trivial jitted op, fetch the audio-sized f32 back."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    u32 = rng.integers(0, 256, size=n, dtype=np.uint8).view(
        np.uint32).reshape(1, (n // 4) // 128, 128)
    f = jax.jit(lambda x: x.astype(jnp.float32) * 1.5)
    np.asarray(f(jax.device_put(u32)))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(jax.device_put(u32)))
        best = min(best, time.perf_counter() - t0)
    return n / 2 / best / 1e6


MATRIX = [
    ("hbm_memcpy_floor", _memcpy_floor),
    ("nbfm_q0_fused_precise", lambda: _flagship(False, q=0)),
    ("nbfm_q0_fused_fast", lambda: _flagship(True, q=0)),
    ("nbfm_q3_fused_fast", lambda: _flagship(True, q=3)),
    ("nbfm_q1_correctiq", _q1),
    ("nbfm_q2_dcblock_fused", lambda: _inlpf(q=2, lowpass_in=False)),
    ("nbfm_inlpf_fused", lambda: _inlpf(q=0, lowpass_in=True)),
    ("nbfm_q2_inlpf_fused", lambda: _inlpf(q=2, lowpass_in=True)),
    ("nbfm_f64", _f64),
    ("wbfm_2p4msps", _wbfm),
    ("channel_bank_8ch", _bank),
    ("channel_bank_8ch_pfb", lambda: _bank(on_grid=True)),
    ("channel_bank_64ch_pfb", lambda: _bank(n_chan=64, on_grid=True)),
    ("sharded_step", _sharded),
]


def _measure(name, build, n_lo=10, n_hi=70):
    body, carry0, iq_per_step, traffic = build()
    dt = _timed_loop(body, carry0, n_lo=n_lo, n_hi=n_hi)
    msps = iq_per_step / dt / 1e6
    floor_s = traffic / HBM_BYTES_PER_S
    return {
        "metric": f"iq_throughput_{name}",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps * 1e6 / 192000.0, 1),
        "roofline": {
            "min_traffic_bytes_per_step": int(traffic),
            "hbm_floor_msps": round(iq_per_step / floor_s / 1e6, 1),
            "achieved_frac": round(dt and floor_s / dt, 3),
        },
    }


def main():
    # persistent compile cache (same location as the CLI's): the fused
    # Pallas kernels take minutes to Mosaic-compile over the remote-TPU
    # tunnel on first use; a warmed cache makes repeat bench runs ~50 s.
    from demodulator_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", action="store_true",
                    help="benchmark every hot config; write BENCH_MATRIX.json")
    ap.add_argument("--rows", default="",
                    help="comma list of matrix row names to run (default "
                    "all); with --matrix, unlisted rows keep their values "
                    "from the existing BENCH_MATRIX.json")
    args = ap.parse_args()

    # headline: long loops — short ones sit inside the tunnel's dispatch
    # jitter and can read tens of percent low/high (same rationale as the
    # matrix rows)
    flagship = _measure("nbfm_q0_fused_fast", lambda: _flagship(True, q=0),
                        n_lo=20, n_hi=120)
    flagship_line = {
        "metric": "nbfm_demod_iq_throughput_per_chip",
        "value": flagship["value"],
        "unit": "Msamples/s",
        "vs_baseline": flagship["vs_baseline"],
    }
    if not args.matrix:
        print(json.dumps(flagship_line))
        return

    results = [flagship]
    keep_rows = set(args.rows.split(",")) if args.rows else None
    prior = {}
    if keep_rows:
        try:
            with open("BENCH_MATRIX.json") as f:
                prior = {r["metric"]: r for r in json.load(f)}
        except Exception:
            pass
    memcpy_msps = None
    for name, build in MATRIX:
        if name == "nbfm_q0_fused_fast":
            continue  # already measured as the flagship
        if keep_rows and name not in keep_rows:
            old = prior.get(f"iq_throughput_{name}")
            if old is not None:
                results.append(old)
                if name == "hbm_memcpy_floor" and "value" in old:
                    memcpy_msps = old["value"]
                with open("BENCH_MATRIX.json", "w") as f:
                    json.dump(results, f, indent=1)
            continue
        # stateful configs: steps are now ~100-250 µs, so SHORT loops sit
        # inside the tunnel's ~ms dispatch jitter and can read 2-4× high
        # or negative — use longer loops; only the slow f64/sharded rows
        # keep moderate lengths (their steps are ms-scale already)
        short = name in ("sharded_step", "nbfm_f64")
        try:
            r = _measure(name, build, n_lo=10 if short else 20,
                         n_hi=60 if short else 120)
        except Exception as e:  # one broken config must not hide the rest
            r = {"metric": f"iq_throughput_{name}", "error": repr(e)[:400]}
        if name == "hbm_memcpy_floor" and "value" in r:
            memcpy_msps = r["value"]
        results.append(r)
        print(json.dumps(r), flush=True)
        with open("BENCH_MATRIX.json", "w") as f:  # incremental: crash-safe
            json.dump(results, f, indent=1)
    if memcpy_msps:
        # honest roofline: fraction of the MEASURED memcpy light-speed, for
        # every row with the flagship's traffic shape (docs/PERF_NBFM.md)
        for r in results:
            t = r.get("roofline", {}).get("min_traffic_bytes_per_step")
            if t == 2 * 256 * 262144 and "value" in r:
                r["roofline"]["frac_of_measured_memcpy"] = round(
                    r["value"] / memcpy_msps, 3)
    def _wbfm_pipe():
        from demodulator_tpu.models.wbfm import WbfmConfig, WbfmPipeline
        return WbfmPipeline(WbfmConfig(sample_rate=2.4e6))

    # e2e surface: every CLI-reachable family gets a wall-clock row
    # (VERDICT r3 next #7) — default fused, forced XLA, and the WBFM
    # extension chain through the same StreamProcessor; the bank via its
    # own per-channel-output loop below
    e2e_rows = [
        ("e2e_stream_q0", dict()),
        ("e2e_stream_q0_xla", dict(backend="xla")),
        ("e2e_stream_wbfm", dict(pipeline_factory=_wbfm_pipe, n_blocks=24)),
    ]
    for nm, kw in e2e_rows:
        if keep_rows and nm not in keep_rows:
            old = prior.get(f"iq_throughput_{nm}")
            if old is not None:
                results.append(old)
            continue
        try:
            r = _measure_e2e(nm, **kw)
        except Exception as e:
            r = {"metric": f"iq_throughput_{nm}", "error": repr(e)[:400]}
        results.append(r)
        print(json.dumps(r), flush=True)
        with open("BENCH_MATRIX.json", "w") as f:
            json.dump(results, f, indent=1)
    if keep_rows and "e2e_bank4_pfb" not in keep_rows:
        old = prior.get("iq_throughput_e2e_bank4_pfb")
        r = old if old is not None else {
            "metric": "iq_throughput_e2e_bank4_pfb", "error": "skipped"}
    else:
        try:
            r = _measure_e2e_bank()
        except Exception as e:
            r = {"metric": "iq_throughput_e2e_bank4_pfb",
                 "error": repr(e)[:400]}
    results.append(r)
    print(json.dumps(r), flush=True)
    with open("BENCH_MATRIX.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(flagship_line))


if __name__ == "__main__":
    main()
