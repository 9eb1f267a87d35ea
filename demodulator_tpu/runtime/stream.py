"""Streaming runtime: double-buffered block feeder + pipelined device compute.

TPU-native replacement for the reference's producer/consumer thread pair
(src/main.c:58-98, src/matrix.c:236-242).  The pthread+semaphore ping-pong
becomes: a reader thread filling a bounded prefetch queue (the semaphore
pair's moral equivalent), the main thread dispatching async device work
(jit dispatch is non-blocking, so host reads overlap device compute), and a
small in-flight window before synchronizing outputs for the writer.

Framing semantics (compat profile):
  * only FULL bufSize blocks are processed — the reference drops partial
    tails via its exit-flag race (verified empirically; src/main.c:72-91);
  * each block's output is bufSize/4 float32 samples (src/matrix.c:193);
  * profile="continuous" / tail_policy="pad" extensions process the tail
    zero-padded.
"""
from __future__ import annotations

import queue
import threading
from typing import BinaryIO, Iterator, Optional

import numpy as np

from ..config import DemodConfig
from ..models.nbfm import BlockPipeline

__all__ = ["BlockReader", "StreamProcessor", "ShardedStreamProcessor"]


class BlockReader:
    """Background-thread block reader with a bounded prefetch queue."""

    def __init__(self, f: BinaryIO, block_size: int, depth: int = 4,
                 tail_policy: str = "drop"):
        self.f = f
        self.block_size = block_size
        self.tail_policy = tail_policy
        self.q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(maxsize=depth)
        self.error: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            # keep last raw block around: the reference's short final read
            # overlays fresh bytes on the previous block's buffer
            prev = np.zeros(self.block_size, dtype=np.uint8)
            while True:
                data = self.f.read(self.block_size)
                if not data:
                    break
                buf = np.frombuffer(data, dtype=np.uint8)
                if len(buf) < self.block_size:
                    if self.tail_policy == "pad":
                        blk = prev.copy()
                        blk[: len(buf)] = buf
                        self.q.put(blk)
                    break  # "drop": partial tail never produces output
                prev = buf
                self.q.put(buf)
        except BaseException as e:  # surfaced to the consumer
            self.error = e
        finally:
            self.q.put(None)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            item = self.q.get()
            if item is None:
                if self.error is not None:
                    raise self.error
                return
            yield item


class ShardedStreamProcessor:
    """Time-sharded streaming: one long IQ stream over a device mesh.

    Chunks of NB = n_time · blocks_per_shard blocks are sharded over the
    mesh's ``time`` axis and processed by parallel.sharding.ShardedPipeline
    (zero communication in the compat profile, except correctIq's O(1)
    affine-summary all_gather; ppermute FIR halos in continuous).  The
    stream tail (fewer than NB blocks) falls back to the per-block pipeline
    carrying the same state, so output matches unsharded streaming to fp
    tolerance.  For multi-host runs call
    parallel.distributed.init_distributed() first and pass a global mesh.
    """

    def __init__(self, cfg: DemodConfig, n_time: int | None = None,
                 fast_atan2: bool = False, blocks_per_shard: int = 2,
                 mesh=None):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import make_demod_mesh, TIME_AXIS
        from ..parallel.sharding import ShardedPipeline
        cfg.validate()
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_demod_mesh(
            n_time=n_time, n_chan=1)
        n_t = self.mesh.devices.shape[0]
        self.NB = n_t * max(1, blocks_per_shard)
        self.sp = ShardedPipeline(cfg, self.mesh, fast_atan2=fast_atan2)
        self.block_bytes = cfg.buf_size
        self._raw_sh = NamedSharding(self.mesh, P(None, TIME_AXIS, None))
        self._off_sh = NamedSharding(self.mesh, P(None, None))
        self._jax = jax

    def run(self, fin: BinaryIO, fout: BinaryIO,
            tail_policy: str | None = None, metrics=None) -> int:
        import jax
        import jax.numpy as jnp
        from ..models.nbfm import PipelineState
        if tail_policy is None:
            tail_policy = "drop" if self.cfg.profile == "compat" else "pad"
        reader = BlockReader(fin, self.block_bytes, tail_policy=tail_policy)
        out_dtype = self.cfg.np_dtype()
        off = np.zeros((1, 2), dtype=out_dtype)
        blocks = 0
        buf: list[np.ndarray] = []

        def flush_chunk():
            nonlocal off, blocks
            raw = np.stack(buf, axis=0)[None]          # [1, NB, n]
            raw_g = jax.device_put(raw, self._raw_sh)
            off_g = jax.device_put(off, self._off_sh)
            new_off, audio = self.sp(off_g, raw_g)
            fout.write(np.asarray(audio, dtype=out_dtype).tobytes())
            off = np.asarray(new_off)
            blocks += len(buf)
            if metrics is not None:
                for _ in buf:
                    metrics.block_done()
            buf.clear()

        for raw in reader:
            buf.append(raw)
            if len(buf) == self.NB:
                flush_chunk()
        if buf:
            # tail: per-block pipeline with the carried state (avoids a
            # second sharded compile for every possible remainder length)
            pipe = self.sp.pipe
            st = PipelineState(iq_off=jnp.asarray(off))
            fn = jax.jit(pipe.__call__)
            for blk in buf:
                st, out = fn(st, blk[None])
                fout.write(np.asarray(out, dtype=out_dtype).tobytes())
                blocks += 1
                if metrics is not None:
                    metrics.block_done()
        fout.flush()
        return blocks


class StreamProcessor:
    """Connects a BlockReader to the jitted pipeline and an output file.

    ``inflight`` bounds the number of dispatched-but-unread device results,
    overlapping host IO with device compute (the reference's 2-thread
    pipeline, without locks).
    """

    def __init__(self, cfg: DemodConfig, fast_atan2: bool = False,
                 inflight: int = 2, pipeline=None, use_native: bool = True):
        """``pipeline`` overrides the NBFM BlockPipeline with any per-block
        model exposing init_state() / __call__(state, raw) / block_bytes
        (e.g. models.wbfm.WbfmPipeline)."""
        import jax
        self.cfg = cfg
        self._continuous = False
        if pipeline is None:
            self.pipe = BlockPipeline(cfg, fast_atan2=fast_atan2)
            self.block_bytes = cfg.buf_size
            if cfg.profile == "continuous":
                # carry-state continuous filtering: conditioning stays
                # per-block, the filters run stationary with a one-block
                # lookahead halo (BlockPipeline.continuous_post)
                self._continuous = True
                self._cond_fn = jax.jit(self.pipe.condition_block,
                                        donate_argnums=(0,))
                self._post_fn = jax.jit(self.pipe.continuous_post)
                self._halo_reals = 2 * self.pipe.halo_pairs
                self.fn = None
            elif self.pipe._use_fused() and self.pipe._use_fused_3d_ok():
                # feed host-viewed uint32 shaped [1, rows, 128] (free numpy
                # .view+.reshape): skips both the device u8→u32 relayout and
                # the flat↔3-D tiled-layout copies; the 3-D audio's
                # row-major bytes are identical to the flat audio for the
                # writer's .tobytes()
                f32c = jax.jit(self.pipe.fused_call_u32_3d,
                               donate_argnums=(0,))
                rows = (cfg.buf_size // 4) // 128
                self.fn = lambda st, raw: f32c(
                    st, np.ascontiguousarray(raw).view(np.uint32)
                    .reshape(1, rows, 128))
            elif self.pipe._use_fused_inlpf():
                # -L configs: whole chain fused, same zero-copy 3-D feed
                f32c = jax.jit(self.pipe.fused_call_inlpf_u32_3d,
                               donate_argnums=(0,))
                rows = (cfg.buf_size // 4) // 128
                self.fn = lambda st, raw: f32c(
                    st, np.ascontiguousarray(raw).view(np.uint32)
                    .reshape(1, rows, 128))
            elif self.pipe._use_fused():
                # feed host-viewed uint32 (free numpy .view) so the device
                # never pays the u8→u32 relayout (~1.9 ms per 64 MiB)
                f32c = jax.jit(self.pipe.fused_call_u32, donate_argnums=(0,))
                self.fn = lambda st, raw: f32c(
                    st, np.ascontiguousarray(raw).view(np.uint32)
                    .reshape(1, -1))
            else:
                self.fn = self.pipe.jit_block_fn()
        else:
            self.pipe = pipeline
            self.block_bytes = pipeline.block_bytes
            if hasattr(pipeline, "call_u16"):
                # host-viewed uint16 (one complex sample per element):
                # skips the device-side byte-pair pack (WBFM)
                f16 = jax.jit(pipeline.call_u16)
                self.fn = lambda st, raw: f16(
                    st, np.ascontiguousarray(raw).view(np.uint16))
            else:
                self.fn = jax.jit(pipeline.__call__)
        self.inflight = max(1, inflight)
        self.use_native = use_native

    def _make_reader(self, fin: BinaryIO, tail_policy: str,
                     offset: int = 0):
        """Prefer the native C++ ring-buffer reader (runtime/native) when the
        input is a real file or stdin; any other BinaryIO uses the Python
        reader.  Both yield identical full uint8 blocks."""
        if self.use_native:
            import sys
            path = None
            if fin is sys.stdin.buffer:
                path = "-"
            else:
                name = getattr(fin, "name", None)
                if isinstance(name, str) and name not in ("<stdin>",):
                    import os
                    if os.path.exists(name):
                        path = name
            if path is not None and not (path == "-" and offset):
                try:
                    from . import native
                    if native.available():
                        return native.NativeBlockReader(
                            path, self.block_bytes, tail_policy=tail_policy,
                            offset=offset)
                except Exception:
                    pass  # fall back to the Python reader
        return BlockReader(fin, self.block_bytes, tail_policy=tail_policy)

    def run(self, fin: BinaryIO, fout: BinaryIO,
            tail_policy: str | None = None,
            checkpoint_path: str | None = None,
            checkpoint_every: int = 64,
            resume: bool = False,
            metrics=None) -> int:
        """Process the stream; returns number of blocks emitted.

        checkpoint_path/resume: save carry state + byte offset every
        ``checkpoint_every`` blocks (and at EOF); resuming seeks ``fin``
        to the saved offset (requires a seekable input) and restores state.
        metrics: optional utils.metrics.StreamMetrics.
        """
        if tail_policy is None:
            tail_policy = "drop" if self.cfg.profile == "compat" else "pad"
        state = self.pipe.init_state()
        blocks = 0
        byte_offset = 0
        checkpoint_every = max(1, int(checkpoint_every))
        # fingerprint the config that actually built the graph: a pipeline
        # override (WBFM, channel bank) carries its own dataclass
        ck_cfg = getattr(self.pipe, "cfg", self.cfg)
        if resume:
            if not checkpoint_path:
                raise ValueError("resume requires checkpoint_path")
            from .checkpoint import load_checkpoint
            state, byte_offset, blocks = load_checkpoint(
                checkpoint_path, state, cfg=ck_cfg)
            fin.seek(byte_offset)
        reader = self._make_reader(fin, tail_policy, offset=byte_offset)
        if self._continuous:
            return self._run_continuous(reader, fout, state, blocks,
                                        byte_offset, checkpoint_path,
                                        checkpoint_every, ck_cfg, metrics)
        pending: list = []
        out_dtype = self.cfg.np_dtype()

        def ckpt():
            if checkpoint_path:
                from .checkpoint import save_checkpoint
                save_checkpoint(checkpoint_path, state_done,
                                byte_offset=byte_offset + done * self.block_bytes,
                                blocks=blocks, cfg=ck_cfg)

        done = 0            # blocks fully written since (re)start
        state_done = state  # carry state as of `done` blocks
        state_q: list = []  # host copies paired with pending outputs
        for raw in reader:
            state, out = self.fn(state, raw)
            pending.append(out)
            if checkpoint_path:
                # materialize now: the device buffers are donated (hence
                # deleted) by the next fn call
                import jax as _jax
                state_q.append(_jax.tree.map(np.asarray, state))
            else:
                state_q.append(None)
            if len(pending) >= self.inflight:
                fout.write(np.asarray(pending.pop(0),
                                      dtype=out_dtype).tobytes())
                state_done = state_q.pop(0)
                blocks += 1
                done += 1
                if metrics is not None:
                    metrics.block_done()
                if checkpoint_path and done % checkpoint_every == 0:
                    ckpt()
        for out in pending:
            fout.write(np.asarray(out, dtype=out_dtype).tobytes())
            state_done = state_q.pop(0)
            blocks += 1
            done += 1
            if metrics is not None:
                metrics.block_done()
        fout.flush()
        ckpt()
        return blocks

    def _run_continuous(self, reader, fout, state, blocks, byte_offset,
                        checkpoint_path, checkpoint_every, ck_cfg, metrics):
        """Continuous-profile streaming: condition each block on arrival,
        filter the PREVIOUS block with the new block's conditioned head as
        its stationary halo (zero halo at EOF).  Output sample i of block k
        equals the infinite-stream stationary response — no per-block
        transients.  jit dispatch is async, so conditioning block k+1
        overlaps the device filtering of block k."""
        import jax
        out_dtype = self.cfg.np_dtype()
        done = 0
        cond_prev = None

        def ckpt(n_done, st):
            if checkpoint_path and st is not None:
                from .checkpoint import save_checkpoint
                save_checkpoint(checkpoint_path, st,
                                byte_offset=byte_offset
                                + n_done * self.block_bytes,
                                blocks=blocks, cfg=ck_cfg)

        # resume semantics: a checkpoint at `done` blocks written holds the
        # conditioning state after blocks 0..done-1, so the resumed run
        # re-conditions block `done` (the previous run's halo block) itself
        state_h = jax.tree.map(np.asarray, state) if checkpoint_path else None
        for raw in reader:
            # state_h currently = state after the blocks already WRITTEN
            new_state, cond = self._cond_fn(state, raw)
            if cond_prev is not None:
                out = self._post_fn(cond_prev,
                                    self.pipe.continuous_halo(cond))
                fout.write(np.asarray(out, dtype=out_dtype).tobytes())
                blocks += 1
                done += 1
                if metrics is not None:
                    metrics.block_done()
                if checkpoint_path and done % checkpoint_every == 0:
                    ckpt(done, state_h)
            cond_prev = cond
            state = new_state
            if checkpoint_path:
                state_h = jax.tree.map(np.asarray, state)
        if cond_prev is not None:
            halo = np.zeros((*cond_prev.shape[:-1], self._halo_reals),
                            dtype=out_dtype)
            out = self._post_fn(cond_prev, halo)
            fout.write(np.asarray(out, dtype=out_dtype).tobytes())
            blocks += 1
            done += 1
            if metrics is not None:
                metrics.block_done()
        fout.flush()
        ckpt(done, state_h)
        return blocks
