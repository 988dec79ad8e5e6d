"""Full train-state checkpointing with resume (SURVEY.md C15, §5).

The reference saves only the best model's ``state_dict`` — no optimizer/step
resume. Here the FULL TrainState (params, Adam moments, step, lr) plus loop
metadata (epoch, best dev BLEU, eval patience counters, RNG seed) round-trips
through flax.serialization msgpack, so training resumes bit-exactly. A
``best`` pointer mirrors the reference's best-by-dev-BLEU model."""

from __future__ import annotations

import concurrent.futures
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

from vag_nmt_tpu.train.state import TrainState

_STATE_FILE = "state_{tag}.msgpack"
_META_FILE = "meta_{tag}.json"


_FETCH_CHUNK_ELEMS = 1 << 26        # ~256 MB fp32 per transient buffer


def _pack_device(tree):
    """Phase 1 of the batched fetch (DEVICE ops — main thread only): ravel +
    concatenate leaves per dtype into a few large flat buffers. Chunked so
    the transient device buffer stays bounded (~256 MB) instead of doubling
    the fp32 state in HBM. Returns (flat device arrays, per-chunk leaf
    layout, treedef). Split from the transfer phase because dispatching
    device ops from a second thread aborted the process (C++ `Aborted` in
    the CPU runtime) when racing the main thread's train steps — the
    background worker must only TRANSFER, never execute."""
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    by_dtype: Dict[Any, list] = {}
    for pos, x in enumerate(leaves):
        by_dtype.setdefault(jax.numpy.asarray(x).dtype, []).append(pos)
    flats = []
    layouts = []        # per flat buffer: list of (leaf_pos, shape, size)

    def pack(chunk_positions):
        if not chunk_positions:
            return
        flats.append(jax.numpy.concatenate(
            [jax.numpy.ravel(leaves[p]) for p in chunk_positions]))
        lay = []
        for p in chunk_positions:
            shape = jax.numpy.shape(leaves[p])
            lay.append((p, shape, int(np.prod(shape)) if shape else 1))
        layouts.append(lay)

    for dt, positions in by_dtype.items():
        chunk: list = []
        elems = 0
        for p in positions:
            sz = max(int(np.prod(jax.numpy.shape(leaves[p]) or (1,))), 1)
            if chunk and elems + sz > _FETCH_CHUNK_ELEMS:
                pack(chunk)
                chunk, elems = [], 0
            chunk.append(p)
            elems += sz
        pack(chunk)
    return flats, layouts, treedef, len(leaves)


def _unpack_host(flats, layouts, treedef, n_leaves):
    """Phase 2 (TRANSFER only — safe off-thread): fetch each flat buffer in
    one device->host transfer and slice it back into leaf arrays. Each
    jax.device_get of a separate leaf pays a fixed round-trip (~150 ms on a
    tunneled chip; dozens of leaves = 20 s per save before batching)."""
    import numpy as np

    out = [None] * n_leaves
    for flat, lay in zip(flats, layouts):
        host = np.asarray(flat)
        off = 0
        for p, shape, size in lay:
            out[p] = host[off: off + size].reshape(shape)
            off += size
    return jax.tree_util.tree_unflatten(treedef, out)


def _fetch_batched(tree):
    """Batched device->host fetch, bit-exact transport re-packing."""
    return _unpack_host(*_pack_device(tree))


def _write_checkpoint(ckpt_dir: str, tag: str, state: TrainState,
                      meta: Optional[Dict[str, Any]]) -> None:
    """Serialize an already-fetched (host) state + meta to disk atomically."""
    os.makedirs(ckpt_dir, exist_ok=True)
    meta = {"step": int(state.step), **(meta or {})}
    payload = serialization.to_bytes(state._asdict())
    bundle = serialization.msgpack_serialize(
        {"state_bytes": payload, "meta_json": json.dumps(meta)})
    state_path = os.path.join(ckpt_dir, _STATE_FILE.format(tag=tag))
    tmp = state_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bundle)
    os.replace(tmp, state_path)
    meta_path = os.path.join(ckpt_dir, _META_FILE.format(tag=tag))
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)


def save_checkpoint(ckpt_dir: str, tag: str, state: TrainState,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    """State + meta are bundled in ONE msgpack file replaced atomically, so a
    crash can never pair a new state with stale meta (a stale best_bleu would
    let a worse model overwrite "best"; a stale epoch would re-run or skip an
    epoch on resume). The JSON sidecar is a human-readable mirror only, also
    written atomically; load ignores it when the bundle carries meta."""
    _write_checkpoint(ckpt_dir, tag, _fetch_batched(state), meta)


class AsyncCheckpointer:
    """Overlap checkpoint device->host fetch + file write with training.

    The synchronous save stalls the train loop for the full state fetch
    (measured 26-52 s per save at m30k scale on a tunneled chip; seconds on
    local PCIe). save() instead snapshots the state ON DEVICE — one cheap
    HBM-to-HBM copy per leaf — and hands fetch/serialize/atomic-write to a
    single background worker, so the next epoch's steps run during the
    transfer. The device snapshot is what makes this safe under buffer
    donation: the jitted step donates state buffers in place, so fetching
    the live arrays after the next step would read reused memory.

    One save in flight at a time: a new save() first drains the previous
    (bounds peak HBM to one extra state copy, preserves write order). Call
    wait() at loop exit so "last" is durable before the process returns;
    worker exceptions re-raise there."""

    def __init__(self):
        self._ex = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt")
        self._fut: Optional[concurrent.futures.Future] = None

    def save(self, ckpt_dir: str, tag: str, state: TrainState,
             meta: Optional[Dict[str, Any]] = None,
             skip_if_busy: bool = False) -> bool:
        """skip_if_busy=True: if a previous save is still fetching/writing,
        skip this one and return False. Used for routine epoch-boundary
        "last" saves so a slow link (fetch > epoch time) self-tunes to
        checkpointing as often as the link allows, at the cost of resume
        lag — never used for the final save or for "best"."""
        if skip_if_busy and self._fut is not None and not self._fut.done():
            return False
        self.wait()
        # DEVICE work happens HERE, on the caller's thread: the snapshot
        # copies and the per-dtype pack concatenations are async dispatches
        # (cheap to enqueue). The worker thread only TRANSFERS the packed
        # buffers and writes the file — dispatching device ops off-thread
        # aborted the process when racing main-thread train steps.
        snap = jax.tree.map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, state)
        packed = _pack_device(snap)

        def fetch_and_write():
            _write_checkpoint(ckpt_dir, tag, _unpack_host(*packed), meta)

        self._fut = self._ex.submit(fetch_and_write)
        return True

    def wait(self) -> None:
        if self._fut is not None:
            fut, self._fut = self._fut, None
            fut.result()


def load_checkpoint(ckpt_dir: str, tag: str,
                    template: TrainState) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the structure of `template` (from create_train_state).

    Accepts both the current format (bundle: {state_bytes, meta_json}) and
    the pre-bundle format (the serialized state dict itself + a meta JSON
    sidecar), so checkpoints written before the atomic-bundle change keep
    loading."""
    with open(os.path.join(ckpt_dir, _STATE_FILE.format(tag=tag)), "rb") as f:
        raw = f.read()
    bundle = serialization.msgpack_restore(raw)
    if isinstance(bundle, dict) and "meta_json" in bundle:
        meta = json.loads(bundle["meta_json"])
        restored = serialization.from_bytes(template._asdict(),
                                            bytes(bundle["state_bytes"]))
        return TrainState(**restored), meta
    # legacy layout: the file IS the state; meta lives in the sidecar
    restored = serialization.from_bytes(template._asdict(), raw)
    meta_path = os.path.join(ckpt_dir, _META_FILE.format(tag=tag))
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return TrainState(**restored), meta


def has_checkpoint(ckpt_dir: str, tag: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, _STATE_FILE.format(tag=tag)))
