"""Reference-compatible command line front end.

Replicates the reference's getopt loop (src/main.c:125-183) so the README
pipelines run verbatim against this binary:

    demodulator-tpu -i file|- -o file|- [-L -l -S -D -d -e -m -b -c -q]

Quirks preserved: an -i/-o argument CONTAINING '-' selects stdin/stdout
(the reference uses strstr, src/main.c:127-142); -e is divided by 10; -r/-n
are accepted and ignored; -b shifts DEFAULT_BUF_SIZE.

Framework extensions use long options (never colliding with the reference's
short ones): --profile compat|continuous, --precision float32|float64,
--fast-atan2, --tail drop|pad, --verbose-design, --chunk-blocks N (blocks
per device dispatch on the NBFM paths, default 16; 1 = per-block), and the
WBFM broadcast receiver --wbfm [--iq-rate 2400000 --audio-rate 48000
--deviation 75000 --deemphasis 75] (rational polyphase resample +
de-emphasis; models/wbfm.py).
"""
from __future__ import annotations

import sys

from .config import DemodConfig, config_from_cli_opts

SHORT_OPTS = "i:o:r:L:l:S:D:d:e:m:b:c:q:n:"


def parse_args(argv):
    """getopt-style parse → (opts dict, extras dict).  Unknown short options
    are ignored like the reference's default case."""
    takes_arg = {SHORT_OPTS[i]: True for i in range(0, len(SHORT_OPTS), 2)}
    opts: dict = {}
    extras = {"profile": "compat", "precision": "float32", "fast_atan2": False,
              "tail": None, "verbose_design": False, "wbfm": False,
              "iq_rate": "2400000", "audio_rate": "48000",
              "deviation": "75000", "deemphasis": "75",
              "checkpoint": None, "checkpoint_every": "64", "resume": False,
              "metrics": False, "trace": None,
              "bank": None, "channel_rate": "192000", "inputs": None,
              "shard_time": None, "shard_chan": None,
              "distributed": False, "shared_out": False, "backend": "auto",
              "block_seconds": None, "chunk_blocks": "auto"}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--fast-atan2":
            extras["fast_atan2"] = True
        elif a == "--verbose-design":
            extras["verbose_design"] = True
        elif a == "--wbfm":
            extras["wbfm"] = True
        elif a == "--resume":
            extras["resume"] = True
        elif a == "--metrics":
            extras["metrics"] = True
        elif a == "--distributed":
            extras["distributed"] = True
        elif a == "--shared-out":
            extras["shared_out"] = True
        elif a in ("--profile", "--precision", "--tail", "--iq-rate",
                   "--audio-rate", "--deviation", "--deemphasis",
                   "--checkpoint", "--checkpoint-every", "--trace",
                   "--bank", "--channel-rate", "--shard-time",
                   "--shard-chan", "--backend", "--block-seconds",
                   "--chunk-blocks", "--inputs"):
            i += 1
            if i >= len(argv):
                raise SystemExit(f"option {a} requires an argument")
            extras[a[2:].replace("-", "_")] = argv[i]
        elif a.startswith("--"):
            raise SystemExit(f"unknown option {a}")
        elif a.startswith("-") and len(a) >= 2 and a[1] in takes_arg:
            key = a[1]
            if len(a) > 2:
                opts[key] = a[2:]
            else:
                i += 1
                if i >= len(argv):
                    raise SystemExit(f"option -{key} requires an argument")
                opts[key] = argv[i]
        # unknown single-dash options fall through silently (getopt default:)
        i += 1
    return opts, extras


def _dump_design(cfg: DemodConfig):
    """--verbose-design: print the SOS tables like the reference's VERBOSE
    build (src/filter.c:160-204) for A/B comparison."""
    import numpy as np
    from .design.biquad import design_sos
    def show(tag, mode, degree, fc):
        sos = np.asarray(design_sos(mode, degree, fc, cfg.sample_rate,
                                    cfg.epsilon, dtype=np.float64))
        print(f"\n{tag}: mode={mode} degree={degree} fc={fc} "
              f"fs={cfg.sample_rate}", file=sys.stderr)
        for row in sos:
            print(" ".join(f"{v:.6f}" for v in row), file=sys.stderr)
    show("out", cfg.out_filter_family(), cfg.out_filter_degree, cfg.lowpass_out)
    if cfg.lowpass_in:
        show("in", cfg.in_filter_family(), cfg.effective_in_filter_degree(),
             cfg.lowpass_in)


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-run TPU compiles of the fused
    kernel / conv chains are tens of seconds to minutes through a remote
    backend; subsequent CLI invocations then start instantly."""
    import os
    import jax
    cache = os.environ.get("DEMODULATOR_TPU_JIT_CACHE",
                           os.path.join(os.path.expanduser("~"),
                                        ".cache", "demodulator_tpu", "jit"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # write EVERY entry: through the remote axon backend jax's measured
        # compile time is often sub-second (the server does the heavy
        # lifting), so the default 1.0 s floor silently skipped the write
        # and every fresh process re-compiled — the r3 REGRESSION.json
        # "warm-cache" outliers
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # cache is best-effort


def _run_bank(cfg, opts, extras, fin, oarg) -> int:
    """--bank f1,f2,...: channel-bank mode (models/channel_bank.py).  The -o
    argument is a filename template; each channel writes <out>.ch<N>.raw
    (stdout is refused — N parallel streams don't interleave usefully).
    --checkpoint/--resume and --metrics work like the single-stream modes."""
    import numpy as np
    from .models.channel_bank import ChannelBankConfig, ChannelBankPipeline
    from .runtime.stream import make_reader
    if "-" in oarg:
        print("--bank requires a file -o (one output per channel)",
              file=sys.stderr)
        return -1
    offsets = tuple(float(v) for v in extras["bank"].split(","))
    bcfg = ChannelBankConfig(sample_rate=float(extras["iq_rate"]),
                             channel_rate=float(extras["channel_rate"]),
                             offsets_hz=offsets,
                             lowpass_out=cfg.lowpass_out,
                             out_filter_degree=cfg.out_filter_degree,
                             out_filter_family=cfg.out_filter_family(),
                             epsilon=cfg.epsilon,
                             block_seconds=float(extras["block_seconds"])
                             if extras["block_seconds"] else 0.0)
    import jax
    pipe = ChannelBankPipeline(bcfg)
    state = pipe.init_state()
    if extras["shard_chan"]:
        # DP over the channel axis (SURVEY.md §2.10): LUTs + per-channel
        # state placed over the mesh's chan axis; the per-channel stages
        # then run SPMD with zero communication (channel_bank.shard_over)
        nc = int(extras["shard_chan"])
        if len(offsets) % nc:
            print("--shard-chan must divide the channel count",
                  file=sys.stderr)
            return -1
        from .parallel.mesh import make_demod_mesh
        mesh = make_demod_mesh(n_time=1, n_chan=nc)
        state, _ = pipe.shard_over(mesh, state)
    fn = jax.jit(pipe.call_u16)
    blocks = 0
    byte_offset = 0
    ck = extras["checkpoint"]
    ck_every = max(1, int(extras["checkpoint_every"]))
    open_mode = "wb"
    if extras["resume"]:
        if not ck:
            print("--resume requires --checkpoint", file=sys.stderr)
            return -1
        from .runtime.checkpoint import load_checkpoint
        state, byte_offset, blocks = load_checkpoint(ck, state, cfg=bcfg)
        open_mode = "ab"
    metrics = None
    if extras["metrics"]:
        from .utils.metrics import StreamMetrics
        metrics = StreamMetrics(pipe.block_bytes, pipe.block_bytes // 2)
    outs = [open(f"{oarg}.ch{c}.raw", open_mode)
            for c in range(len(offsets))]
    try:
        reader = make_reader(fin, pipe.block_bytes,
                             tail_policy=extras["tail"] or "drop",
                             offset=byte_offset)
        done = 0  # blocks since (re)start — byte_offset already covers the rest

        def _write(dev_audio):
            audio = np.asarray(dev_audio, dtype=np.float32)  # sync here
            for c, f in enumerate(outs):
                f.write(audio[c].tobytes())
            if metrics is not None:
                # count at materialization (post-sync), not dispatch: with
                # the inflight window a dispatched block may still be
                # computing on device
                metrics.block_done()

        pending = None  # one-block inflight window: jit dispatch is async,
        # so materializing block c only AFTER dispatching c+1 overlaps the
        # host read + file writes with device compute (the single-stream
        # StreamProcessor's window, stream.py)
        for raw in reader:
            # zero-copy u16 view of the block (low byte = I): skips the
            # device-side u8→u16 bitcast relayout (models/channel_bank.py
            # call_u16 docstring)
            u16 = np.ascontiguousarray(raw).view(np.uint16)
            state, audio = fn(state, u16)
            if pending is not None:
                _write(pending)
            pending = audio
            done += 1
            blocks += 1
            if ck and done % ck_every == 0:
                # flush the window first: the checkpoint's byte_offset
                # asserts everything before it was written
                if pending is not None:
                    _write(pending)
                    pending = None
                # materialize device state only at checkpoint boundaries
                # (a per-block sync would serialize dispatch)
                state_h = jax.tree.map(np.asarray, state)
                from .runtime.checkpoint import save_checkpoint
                save_checkpoint(ck, state_h,
                                byte_offset=byte_offset
                                + done * pipe.block_bytes,
                                blocks=blocks, cfg=bcfg)
        if pending is not None:
            _write(pending)
        if ck:
            from .runtime.checkpoint import save_checkpoint
            save_checkpoint(ck, jax.tree.map(np.asarray, state),
                            byte_offset=byte_offset
                            + done * pipe.block_bytes,
                            blocks=blocks, cfg=bcfg)
    finally:
        for f in outs:
            f.close()
    if metrics is not None:
        import json as _json
        print(_json.dumps(metrics.final()), file=sys.stderr)
    return 0


def _run_wbfm_bank(extras, oarg) -> int:
    """--wbfm --inputs f1,..,fC: C independent WBFM stations (one IQ file
    each, e.g. an SDR array) demodulated as ONE [C]-leading batch per
    dispatch; station c writes <out>.st<c>.raw.  --shard-chan N places
    the batch over an N-device chan mesh (models/wbfm.py shard_over —
    zero-communication DP).  Stops at the shortest input's last full
    block (streams advance in lockstep)."""
    import numpy as np
    import jax
    from .models.wbfm import WbfmConfig, WbfmPipeline
    paths = [p for p in extras["inputs"].split(",") if p]
    C = len(paths)
    if "-" in oarg:
        print("--inputs requires a file -o (one output per station)",
              file=sys.stderr)
        return -1
    wcfg = WbfmConfig(sample_rate=float(extras["iq_rate"]),
                      audio_rate=float(extras["audio_rate"]),
                      deviation=float(extras["deviation"]),
                      deemphasis_us=float(extras["deemphasis"]),
                      block_seconds=float(extras["block_seconds"])
                      if extras["block_seconds"] else 0.0)
    pipe = WbfmPipeline(wcfg)
    state = pipe.init_state((C,))
    in_sh = None
    if extras["shard_chan"]:
        nc = int(extras["shard_chan"])
        if C % nc:
            print("--shard-chan must divide the station count",
                  file=sys.stderr)
            return -1
        from .parallel.mesh import make_demod_mesh
        mesh = make_demod_mesh(n_time=1, n_chan=nc)
        state, in_sh = pipe.shard_over(mesh, state)
    fn = jax.jit(pipe.call_u16, donate_argnums=(0,))
    bb = pipe.block_bytes
    fins = [open(p, "rb") for p in paths]
    outs = [open(f"{oarg}.st{c}.raw", "wb") for c in range(C)]
    pending = None

    def _write(dev_audio):
        audio = np.asarray(dev_audio, dtype=np.float32)  # sync here
        for c, f in enumerate(outs):
            f.write(audio[c].tobytes())

    try:
        while True:
            chunk = np.empty((C, bb), dtype=np.uint8)
            short = False
            for c, f in enumerate(fins):
                got = f.readinto(memoryview(chunk[c]))
                while got and got < bb:
                    r = f.readinto(memoryview(chunk[c])[got:])
                    if not r:
                        break
                    got += r
                if got < bb:
                    short = True
            if short:
                break
            u16 = chunk.view(np.uint16)
            dev = jax.device_put(u16, in_sh) if in_sh is not None else u16
            state, audio = fn(state, dev)
            if pending is not None:
                _write(pending)  # one-block inflight window
            pending = audio
        if pending is not None:
            _write(pending)
    finally:
        for f in fins + outs:
            f.close()
    return 0


def main(argv=None) -> int:
    import os as _os
    import time as _time
    _phases = {} if _os.environ.get("DEMODULATOR_TPU_PHASES") else None
    _t0 = _time.perf_counter()
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return -1
    opts, extras = parse_args(argv)
    cfg = config_from_cli_opts(opts)
    cfg.profile = extras["profile"]
    cfg.precision = extras["precision"]
    cfg.validate()
    if cfg.profile == "continuous" and (extras["wbfm"] or extras["bank"]):
        print("--profile continuous applies to the NBFM stream paths only "
              "(not --wbfm/--bank)", file=sys.stderr)
        return -1

    if extras["verbose_design"]:
        _dump_design(cfg)

    # -i / -o: any argument containing '-' means stdin/stdout (strstr quirk)
    iarg, oarg = opts.get("i"), opts.get("o")
    if extras["inputs"] and iarg is None:
        iarg = extras["inputs"].split(",")[0]  # -i unused in bank modes
    if iarg is None or oarg is None:
        print("both -i and -o are required", file=sys.stderr)
        return -1
    try:
        ck_every = int(extras["checkpoint_every"])
        if ck_every < 1:
            raise ValueError
    except ValueError:
        print("--checkpoint-every requires a positive integer",
              file=sys.stderr)
        return -1
    fin = sys.stdin.buffer if "-" in iarg else open(iarg, "rb")
    # bank mode manages its own per-channel outputs — never open/truncate -o
    fout = None if extras["bank"] else (
        sys.stdout.buffer if "-" in oarg else open(oarg, "wb"))
    if extras["distributed"]:
        if not extras["shard_time"]:
            print("--distributed requires --shard-time N (the sharded "
                  "streaming path)", file=sys.stderr)
            return -1
        # must run before ANY jax backend use (incl. the compile cache)
        from .parallel.distributed import init_distributed
        init_distributed()
    _enable_compile_cache()
    trace_ctx = None
    if extras["trace"]:
        import jax
        jax.profiler.start_trace(extras["trace"])
        trace_ctx = extras["trace"]
    try:
        from .runtime.stream import StreamProcessor
        run_kw = {"tail_policy": extras["tail"],
                  "checkpoint_path": extras["checkpoint"],
                  "checkpoint_every": ck_every,
                  "resume": extras["resume"]}
        if extras["bank"]:
            try:
                return _run_bank(cfg, opts, extras, fin, oarg)
            except Exception as e:
                from .runtime.checkpoint import CheckpointError
                if isinstance(e, CheckpointError):
                    print(f"checkpoint error: {e}", file=sys.stderr)
                    return -1
                raise
        if extras["wbfm"] and extras["inputs"]:
            return _run_wbfm_bank(extras, oarg)
        if extras["shard_time"]:
            if extras["wbfm"]:
                print("--shard-time is incompatible with --wbfm "
                      "(NBFM stream only)", file=sys.stderr)
                return -1
            import os as _os
            import jax
            from .runtime.stream import ShardedStreamProcessor
            cfg.num_channels = 1
            sproc = ShardedStreamProcessor(
                cfg, n_time=int(extras["shard_time"]),
                fast_atan2=extras["fast_atan2"],
                shared_output=extras["shared_out"]
                and jax.process_count() > 1)
            if jax.process_count() > 1:
                if "-" in iarg:
                    print("--distributed ingest requires a file -i "
                          "(each host reads its own block ranges)",
                          file=sys.stderr)
                    return -1
                if extras["shared_out"]:
                    # every process pwrites its own time shards into ONE
                    # shared-filesystem output file (zero output DCN
                    # traffic); non-zero processes must NOT truncate it
                    if "-" in oarg:
                        print("--shared-out requires a file -o",
                              file=sys.stderr)
                        return -1
                    if jax.process_index() != 0:
                        if fout is not None:
                            fout.close()
                        ofd = _os.open(oarg, _os.O_WRONLY | _os.O_CREAT,
                                       0o644)
                        fout = _os.fdopen(ofd, "wb")
                elif jax.process_index() != 0:
                    # only process 0 writes the output stream
                    if fout is not None and fout is not sys.stdout.buffer:
                        fout.close()
                    fout = open(_os.devnull, "wb")
            smet = None
            if extras["metrics"]:
                from .utils.metrics import StreamMetrics
                smet = StreamMetrics(sproc.block_bytes,
                                     sproc.block_bytes // 2)
            sproc.run(fin, fout, tail_policy=extras["tail"], metrics=smet,
                      checkpoint_path=extras["checkpoint"],
                      checkpoint_every=ck_every, resume=extras["resume"])
            if smet is not None:
                import json as _json
                print(_json.dumps(smet.final()), file=sys.stderr)
            return 0
        if extras["wbfm"]:
            from .models.wbfm import WbfmConfig, WbfmPipeline
            wcfg = WbfmConfig(sample_rate=float(extras["iq_rate"]),
                              audio_rate=float(extras["audio_rate"]),
                              deviation=float(extras["deviation"]),
                              deemphasis_us=float(extras["deemphasis"]),
                              block_seconds=float(extras["block_seconds"])
                              if extras["block_seconds"] else 0.0)
            proc = StreamProcessor(cfg, pipeline=WbfmPipeline(wcfg))
            run_kw["tail_policy"] = extras["tail"] or "drop"
        else:
            if extras["chunk_blocks"] == "auto":
                # target ~4 MiB per device dispatch: 16 blocks at the
                # default 256 KiB bufSize, more for small -b blocks
                nb = max(1, min(256, (4 << 20) // cfg.buf_size))
            else:
                nb = max(1, int(extras["chunk_blocks"]))
            proc = StreamProcessor(cfg, fast_atan2=extras["fast_atan2"],
                                   backend=extras["backend"],
                                   chunk_blocks=nb)
        if extras["metrics"]:
            from .utils.metrics import StreamMetrics
            run_kw["metrics"] = StreamMetrics(proc.block_bytes,
                                              proc.block_bytes // 2)
        if _phases is not None:
            _phases["build_s"] = round(_time.perf_counter() - _t0, 3)
        try:
            proc.run(fin, fout, **run_kw)
            if _phases is not None:
                # DEMODULATOR_TPU_PHASES=1: one stderr JSON line splitting
                # wall time into build (imports+backend+filter design),
                # first output (trace+compile+first dispatch — where
                # compile-cache misses and tunnel stalls land), and steady
                # streaming, so regression outliers are attributable
                import json as _json
                _phases["first_output_s"] = round(
                    getattr(proc, "first_output_s", None) or 0.0, 3)
                _phases["total_s"] = round(_time.perf_counter() - _t0, 3)
                _phases["stream_s"] = round(
                    _phases["total_s"] - _phases["build_s"]
                    - _phases["first_output_s"], 3)
                print("PHASES " + _json.dumps(_phases), file=sys.stderr)
        except Exception as e:
            from .runtime.checkpoint import CheckpointError
            if isinstance(e, CheckpointError):
                print(f"checkpoint error: {e}", file=sys.stderr)
                return -1
            raise
        if extras["metrics"]:
            import json as _json
            print(_json.dumps(run_kw["metrics"].final()), file=sys.stderr)
    except BlockingIOError as e:
        # reference exitFlag -3: zero read with neither EOF nor error
        # (src/main.c:84-85)
        print(f"input starved: {e}", file=sys.stderr)
        return -3
    except OSError as e:
        # reference exitFlag -2: ferror on the input stream
        # (src/main.c:78-83); the native reader surfaces the same code
        print(f"stream error: {e}", file=sys.stderr)
        return -2
    finally:
        if trace_ctx:
            import jax
            jax.profiler.stop_trace()
        if fin is not sys.stdin.buffer:
            fin.close()
        if fout is not None and fout is not sys.stdout.buffer:
            fout.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
