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


def _fetch_batched(tree):
    """device->host fetch with leaves CONCATENATED on device per dtype and
    transferred in a few large buffers. jax.device_get pulls leaf by leaf and
    each transfer pays a fixed round-trip latency (~150 ms on a tunneled
    chip; a full TrainState has dozens of leaves — measured 20 s per save
    before this, ~11 s after). Concatenation is CHUNKED so the transient
    device buffer stays bounded (~256 MB) instead of doubling the fp32 state
    in HBM. Bit-exact: pure transport re-packing."""
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    by_dtype: Dict[Any, list] = {}
    for pos, x in enumerate(leaves):
        by_dtype.setdefault(jax.numpy.asarray(x).dtype, []).append(pos)
    out = [None] * len(leaves)
    for dt, positions in by_dtype.items():
        chunk: list = []
        elems = 0

        def flush(chunk_positions):
            nonlocal out
            if not chunk_positions:
                return
            flat = jax.numpy.concatenate(
                [jax.numpy.ravel(leaves[p]) for p in chunk_positions])
            host = np.asarray(flat)
            off = 0
            for p in chunk_positions:
                shape = jax.numpy.shape(leaves[p])
                size = int(np.prod(shape)) if shape else 1
                out[p] = host[off: off + size].reshape(shape)
                off += size

        for p in positions:
            sz = max(int(np.prod(jax.numpy.shape(leaves[p]) or (1,))), 1)
            if chunk and elems + sz > _FETCH_CHUNK_ELEMS:
                flush(chunk)
                chunk, elems = [], 0
            chunk.append(p)
            elems += sz
        flush(chunk)
    return jax.tree_util.tree_unflatten(treedef, out)


def save_checkpoint(ckpt_dir: str, tag: str, state: TrainState,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    """State + meta are bundled in ONE msgpack file replaced atomically, so a
    crash can never pair a new state with stale meta (a stale best_bleu would
    let a worse model overwrite "best"; a stale epoch would re-run or skip an
    epoch on resume). The JSON sidecar is a human-readable mirror only, also
    written atomically; load ignores it when the bundle carries meta."""
    os.makedirs(ckpt_dir, exist_ok=True)
    state = _fetch_batched(state)
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
        snap = jax.tree.map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, state)
        self._fut = self._ex.submit(save_checkpoint, ckpt_dir, tag, snap, meta)
        return True

    def wait(self) -> None:
        if self._fut is not None:
            fut, self._fut = self._fut, None
            fut.result()


def load_checkpoint(ckpt_dir: str, tag: str,
                    template: TrainState) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the structure of `template` (from create_train_state)."""
    with open(os.path.join(ckpt_dir, _STATE_FILE.format(tag=tag)), "rb") as f:
        raw = f.read()
    bundle = serialization.msgpack_restore(raw)
    meta = json.loads(bundle["meta_json"])
    restored = serialization.from_bytes(template._asdict(),
                                        bytes(bundle["state_bytes"]))
    return TrainState(**restored), meta


def has_checkpoint(ckpt_dir: str, tag: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, _STATE_FILE.format(tag=tag)))
