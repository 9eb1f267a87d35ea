"""Streaming checkpoint/resume.

The reference has no checkpointing (SURVEY.md §5): its only persistent
state is correctIq's static DC offsets and highpassDc's scratch
(src/matrix.c:125,147-153), and a killed capture restarts from byte 0.
This module makes hour-long captures resumable (BASELINE config 3): the
checkpoint is the consumed-byte offset plus the pipeline's carry-state
pytree (NBFM PipelineState / WBFM WbfmState / resampler histories),
written atomically as a single ``.npz``.

Format: numpy archive with ``__meta__`` (JSON: version, byte offset,
blocks emitted, config fingerprint) and one array per state leaf, keyed by
its pytree path.  Resume validates the fingerprint so state is never
loaded into a differently-shaped pipeline.
"""
from __future__ import annotations

import dataclasses
import hashlib
import io
import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["config_fingerprint", "save_checkpoint", "load_checkpoint",
           "CheckpointError"]

_VERSION = 1


class CheckpointError(RuntimeError):
    pass


def config_fingerprint(cfg: Any) -> str:
    """Stable digest of the config dataclass driving the pipeline graph."""
    if dataclasses.is_dataclass(cfg):
        d = dataclasses.asdict(cfg)
    else:
        d = dict(vars(cfg))
    blob = json.dumps(d, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def _flatten(state) -> dict[str, np.ndarray]:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in leaves:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, state, *, byte_offset: int, blocks: int,
                    cfg: Any) -> None:
    """Atomic write (tmp + rename) of state + stream position."""
    arrays = _flatten(state)
    meta = {
        "version": _VERSION,
        "byte_offset": int(byte_offset),
        "blocks": int(blocks),
        "fingerprint": config_fingerprint(cfg),
        "keys": sorted(arrays),
    }
    buf = io.BytesIO()
    np.savez(buf, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_checkpoint(path: str, template_state, *, cfg: Any):
    """→ (state, byte_offset, blocks).  ``template_state`` supplies the
    pytree structure (from pipe.init_state()); arrays are validated against
    its leaf shapes/dtypes."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]))
        if meta.get("version") != _VERSION:
            raise CheckpointError(f"unsupported version {meta.get('version')}")
        fp = config_fingerprint(cfg)
        if meta["fingerprint"] != fp:
            raise CheckpointError(
                f"checkpoint was written by a different config "
                f"({meta['fingerprint']} != {fp})")
        arrays = {k: z[k] for k in z.files if k != "__meta__"}

    leaves, treedef = jax.tree_util.tree_flatten_with_path(template_state)
    new_leaves = []
    for pathk, leaf in leaves:
        key = jax.tree_util.keystr(pathk)
        if key not in arrays:
            raise CheckpointError(f"missing state leaf {key}")
        arr = arrays[key]
        want = np.asarray(leaf)
        if arr.shape != want.shape or arr.dtype != want.dtype:
            raise CheckpointError(
                f"leaf {key}: checkpoint {arr.shape}/{arr.dtype} vs "
                f"pipeline {want.shape}/{want.dtype}")
        new_leaves.append(arr)
    state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template_state), new_leaves)
    return state, int(meta["byte_offset"]), int(meta["blocks"])
