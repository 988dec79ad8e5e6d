"""Epoch training loop (SURVEY.md C11): joint CE+VSE steps, periodic dev-set
decode + BLEU, LR decay on plateau, early stop, best/last checkpoints, full
resume. One loop serves every preset (the reference duplicates this per
language pair)."""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vag_nmt_tpu.core.config import Config
from vag_nmt_tpu.core.metrics import MetricsLogger
from vag_nmt_tpu.data.batching import BucketBatcher, Example
from vag_nmt_tpu.data.prefetch import device_prefetch
from vag_nmt_tpu.data.vocab import Vocab
from vag_nmt_tpu.decode.translate import translate_corpus
from vag_nmt_tpu.evaluation.bleu import corpus_bleu
from vag_nmt_tpu.parallel.sharding import batch_sharding
from vag_nmt_tpu.train.checkpoint import (
    AsyncCheckpointer,
    has_checkpoint,
    load_checkpoint,
)
from vag_nmt_tpu.train.state import TrainState, create_train_state
from vag_nmt_tpu.train.step import make_train_step


def train_loop(
    cfg: Config,
    out_dir: str,
    train_examples: Sequence[Example],
    dev_examples: Sequence[Example],
    tgt_vocab: Vocab,
    dev_refs: Sequence[str],          # de-BPE'd tokenized reference lines
    *,
    mesh=None,
    max_steps: Optional[int] = None,
    logger: Optional[MetricsLogger] = None,
) -> Dict[str, float]:
    log = logger or MetricsLogger(os.path.join(out_dir, "metrics.jsonl"))
    ckpt_dir = os.path.join(out_dir, cfg.train.checkpoint_dir)
    # Saves snapshot on device and fetch/write in the background, so epoch
    # boundaries don't stall on the full-state transfer (26-52 s measured at
    # m30k scale on a tunneled chip). Drained in the finally below.
    ckpt = AsyncCheckpointer()

    state = create_train_state(jax.random.key(cfg.train.seed), cfg)
    # Image features live on device for the whole run; per-step batches carry
    # int32 row ids and the gather runs on device (feeding ~0.5 MB of pool5
    # rows per step from the host dominated wall-clock step time).
    use_table = cfg.model.multimodal
    train_img_table = None
    if use_table:
        missing = sum(ex.img is None for ex in train_examples)
        if missing:
            # Silently feeding all-zero pool5 rows into the VSE loss would
            # poison the grounding objective with no signal to the user —
            # fail like the dev-set check below does.
            raise ValueError(
                f"multimodal training needs image features for every train "
                f"example; {missing}/{len(train_examples)} are missing .img")
        from vag_nmt_tpu.decode.translate import build_img_table

        train_img_table = build_img_table(list(train_examples),
                                          cfg.model.img_feat_dim)
    # Compact batches (uint16 tokens + lengths, masks built on device by the
    # train step) cut per-step feed bytes ~4x and host device_put calls ~2x;
    # uint16 transport needs vocab ids < 65536 (all presets qualify).
    compact = (cfg.model.src_vocab_size <= 65535
               and cfg.model.tgt_vocab_size <= 65535)
    batcher = BucketBatcher(
        train_examples, cfg.data.batch_size, cfg.data.length_buckets,
        seed=cfg.data.shuffle_seed,
        image_ids=use_table, img_dim=cfg.model.img_feat_dim,
        compact=compact)

    example_batch = next(iter(batcher.epoch(0)))
    step_fn, state_sh = make_train_step(cfg, mesh, state, example_batch,
                                        with_img_table=use_table)
    # K-step dispatcher: same-shape batches are stacked K deep and run as
    # ONE lax.scan'ed jitted call — per-execution dispatch overhead is paid
    # once per K steps (measured 13.8 ms/step completion-rate on a tunneled
    # chip vs 0.74 ms device compute with one-step dispatch).
    K = max(1, int(cfg.train.steps_per_dispatch))
    multi_fn = None
    if K > 1 and mesh is not None:
        # Mesh path only: the single-device path dispatches K-stacks through
        # the packed fns below and never calls this one.
        from vag_nmt_tpu.train.step import make_multi_step

        example_stack = {k: np.stack([v] * K) for k, v in
                         example_batch.items()}
        multi_fn, _ = make_multi_step(cfg, mesh, state, example_stack,
                                      with_img_table=use_table)
    if state_sh is not None:
        state = jax.device_put(state, state_sh)
    if mesh is None:
        sharding = None
    else:
        from vag_nmt_tpu.parallel.sharding import stacked_batch_sharding

        row_sh = batch_sharding(mesh)
        stack_sh = stacked_batch_sharding(mesh)

        def sharding(batch):   # stacked batches carry a leading K axis
            return stack_sh if batch["src"].ndim == 3 else row_sh

    base_rng = jax.random.key(cfg.train.seed + 1)
    start_epoch = 0
    start_cursor = 0                 # steps already done WITHIN start_epoch
    best_bleu = -1.0
    evals_since_best = 0
    if cfg.train.resume and has_checkpoint(ckpt_dir, "last"):
        state, meta = load_checkpoint(ckpt_dir, "last", state)
        if state_sh is not None:
            state = jax.device_put(state, state_sh)
        start_epoch = int(meta.get("epoch", 0))
        start_cursor = int(meta.get("epoch_cursor", 0))
        best_bleu = float(meta.get("best_bleu", -1.0))
        evals_since_best = int(meta.get("evals_since_best", 0))
        log.log("resume", step=int(state.step), epoch=start_epoch,
                epoch_cursor=start_cursor, best_bleu=best_bleu)

    stop = False
    final: Dict[str, float] = {}

    # Dev-set image features live on device for the whole run (re-uploading
    # per eval costs seconds over a slow host<->device link). Missing dev
    # features fail HERE, not after eval_every_steps of wasted training.
    dev_img_table = None
    if cfg.model.multimodal and dev_examples:
        if not all(ex.img is not None for ex in dev_examples):
            raise ValueError(
                "multimodal training needs dev-set image features for the "
                "periodic BLEU eval (dev examples are missing .img)")
        from vag_nmt_tpu.decode.translate import build_img_table

        dev_img_table = build_img_table(list(dev_examples),
                                        cfg.model.img_feat_dim)

    def run_eval(state: TrainState, epoch: int,
                 step: Optional[int] = None) -> Dict[str, float]:
        nonlocal best_bleu, evals_since_best
        step = int(state.step) if step is None else step
        hyps, dstats = translate_corpus(
            state.params, cfg, dev_examples, tgt_vocab,
            beam_size=cfg.decode.beam_size, img_table=dev_img_table,
            mesh=mesh)
        bleu = corpus_bleu(hyps, list(dev_refs))
        improved = bleu.bleu > best_bleu
        if improved:
            best_bleu = bleu.bleu
            evals_since_best = 0
            ckpt.save(ckpt_dir, "best", state,
                      {"epoch": epoch, "best_bleu": best_bleu})
        else:
            evals_since_best += 1
            if (evals_since_best % cfg.train.lr_decay_patience == 0
                    and evals_since_best > 0):
                state = state._replace(
                    lr=state.lr * cfg.train.lr_decay_factor)
                log.log("lr_decay", lr=float(state.lr))
        log.log("eval", step=step, epoch=epoch, dev_bleu=bleu.bleu,
                best_bleu=best_bleu,
                dev_sent_per_sec=dstats["sentences_per_sec"])
        return {"state": state, "bleu": bleu.bleu,
                "early_stop": evals_since_best >= cfg.train.early_stop_patience}

    # Host<->device discipline in the hot loop (measured on a tunneled chip;
    # the same discipline is what keeps a real host's pipeline full):
    # - the step counter is mirrored on the HOST (reading state.step every
    #   iteration cost ~50 ms/step);
    # - metric rows are fetched ONCE per log point (default every 100 steps)
    #   — the fetch doubles as the completion fence that makes step_time_s
    #   an honest completion rate rather than an async-dispatch rate, and
    #   its cost amortizes to ~noise at the default cadence.
    host_step = int(state.step)
    last_t, last_step = time.perf_counter(), host_step
    log_mod = 1 % max(cfg.train.log_every_steps, 1)
    pending: list = []               # (step, epoch, dt_per_step, device row)

    # Analytic FLOPs per step by batch shape (host-side, one dict lookup per
    # log point; core/flops.py formulas are XLA-cost-model-validated).
    from vag_nmt_tpu.core.flops import train_step_flops

    flops_by_shape: Dict = {}

    def step_flops(batch) -> int:
        tgt = batch["tgt"] if "tgt" in batch else batch["tgt_in"]
        key = (batch["src"].shape[-2:], tgt.shape[-2:])   # stacked or single
        f = flops_by_shape.get(key)
        if f is None:
            (b, t), (_, tt) = key
            f = flops_by_shape[key] = train_step_flops(cfg, b, t, tt)
        return f

    def flush_logs() -> None:
        # Rows were fetched at their log points (completion-rate timing);
        # this just writes them out.
        for s, e, dtt, fl, keys, vals in pending:
            log.log("train", step=s, epoch=e, step_time_s=dtt,
                    tflops=fl / max(dtt, 1e-9) / 1e12,
                    **{k: float(v) for k, v in zip(keys, vals)})
        pending.clear()

    def reset_timer() -> None:
        # Call after anything that isn't training steps (eval, checkpoint,
        # compile) so step_time_s reflects only the steps in the window.
        nonlocal last_t, last_step
        last_t, last_step = time.perf_counter(), host_step

    log_every = max(cfg.train.log_every_steps, 1)

    # Single-device fast path: each (stacked) batch travels as ONE flat
    # uint8 buffer, unpacked inside the jit — one host->device transfer per
    # dispatch instead of one per leaf (the per-transfer latency dominated
    # the feed: see train/step.make_packed_step). Mesh paths keep per-leaf
    # puts, which carry the batch shardings.
    use_packed = mesh is None
    if use_packed:
        from vag_nmt_tpu.data.packing import pack_batch
        from vag_nmt_tpu.train.step import make_packed_step

        p_single = make_packed_step(cfg, with_img_table=use_table,
                                    multi=False)
        p_multi = (make_packed_step(cfg, with_img_table=use_table,
                                    multi=True) if K > 1 else None)

    def dispatch(arg, multi_k, epoch, spec=None, flops_src=None):
        """Run one jitted dispatch (single step or a K-step stack) and
        capture any metric-cadence hits as device rows."""
        nonlocal state, last_t, last_step
        base = host_step
        if spec is not None:
            fn = p_multi if multi_k > 1 else p_single
            if use_table:
                state, aux = fn(state, arg, base_rng, train_img_table,
                                spec=spec)
            else:
                state, aux = fn(state, arg, base_rng, spec=spec)
        else:
            fn = multi_fn if multi_k > 1 else step_fn
            if use_table:
                state, aux = fn(state, arg, base_rng, train_img_table)
            else:
                state, aux = fn(state, arg, base_rng)
        hits = [j for j in range(1, multi_k + 1)
                if (base + j) % log_every == log_mod]
        if hits:
            keys = sorted(aux)
            if multi_k > 1:
                rows = jnp.stack([jnp.stack(
                    [aux[kk][h - 1].astype(jnp.float32) for kk in keys])
                    for h in hits])
            else:
                rows = jnp.stack([aux[kk].astype(jnp.float32)
                                  for kk in keys])[None]
            # Fetch the rows NOW (one tiny transfer per dispatch with a log
            # point): the fetch waits for every step dispatched so far,
            # which makes the logged step_time_s a COMPLETION rate. Pure
            # dispatch-rate windows overstated throughput whenever the
            # device lagged the host (async dispatch returns immediately) —
            # measured 3-4 ms/step dispatch-rate vs 6.6 ms/step
            # completion-rate at m30k shapes.
            rows = np.asarray(rows)
            now = time.perf_counter()
            dt = (now - last_t) / max(base + multi_k - last_step, 1)
            last_t, last_step = now, base + multi_k
            fl = step_flops(flops_src if flops_src is not None else arg)
            for h, row in zip(hits, rows):
                pending.append((base + h, epoch, dt, fl, keys, row))

    def boundary_checks(epoch) -> bool:
        """Eval / max_steps / stop bookkeeping; returns True to stop."""
        nonlocal state, stop
        if (cfg.train.eval_every_steps > 0
                and host_step % cfg.train.eval_every_steps == 0):
            flush_logs()
            r = run_eval(state, epoch, host_step)
            state = r["state"]
            final["dev_bleu"] = r["bleu"]
            if r["early_stop"]:
                log.log("early_stop", step=host_step)
                stop = True
            reset_timer()
        if max_steps is not None and host_step >= max_steps:
            stop = True
        return stop

    def _skip_step_rows(stream, n_skip: int):
        """Within-epoch resume cursor (SURVEY.md §5 checkpoint spec): skip
        the first n_skip STEP-rows of an epoch's (stacked) batch stream —
        the batcher's per-epoch order is seed-deterministic, so skipping
        reproduces exactly the batches the interrupted run never trained
        on. A stack straddling the cursor is split into single-step rows."""
        skipped = 0
        for b in stream:
            k = int(b["src"].shape[0]) if b["src"].ndim == 3 else 1
            if skipped >= n_skip:
                yield b
            elif skipped + k <= n_skip:
                skipped += k
            else:
                start = n_skip - skipped
                skipped = n_skip
                for i in range(start, k):
                    yield {kk: vv[i] for kk, vv in b.items()}

    K_steps = K
    epoch_cursor = 0
    # Terminal-state guard on resume (review finding): boundary_checks only
    # runs AFTER a dispatch, so a run resumed at or past max_steps would
    # train (and checkpoint) at least one extra step per rerun, breaking
    # the bit-identical-resume guarantee. Check the resumed step count
    # BEFORE entering the loop.
    if max_steps is not None and host_step >= max_steps:
        log.log("resume_at_terminal_state", step=host_step,
                max_steps=max_steps)
        final.update({"steps": float(host_step), "best_bleu": best_bleu})
        log.log("done", **final)
        return final
    try:
        for epoch in range(start_epoch, cfg.train.max_epochs):
            interrupted = False
            skip = start_cursor if epoch == start_epoch else 0
            epoch_cursor = skip
            if use_packed:
                from collections import deque

                meta_q: "deque" = deque()

                def packed_iter(ep=epoch, n_skip=skip):
                    for b in _skip_step_rows(
                            batcher.epoch_stacked(ep, K_steps), n_skip):
                        buf, spec = pack_batch(b)
                        meta_q.append((spec, b))
                        yield buf

                feed = device_prefetch(packed_iter(), size=2)
            else:
                meta_q = None
                feed = device_prefetch(
                    _skip_step_rows(batcher.epoch_stacked(epoch, K_steps),
                                    skip),
                    size=2, sharding=sharding)
            for item in feed:
                if use_packed:
                    spec, hb = meta_q.popleft()
                else:
                    spec, hb = None, item
                is_multi = hb["src"].ndim == 3
                k = int(hb["src"].shape[0]) if is_multi else 1
                rem_eval = (cfg.train.eval_every_steps
                            - host_step % cfg.train.eval_every_steps
                            if cfg.train.eval_every_steps > 0 else k + 1)
                rem_max = (max_steps - host_step
                           if max_steps is not None else k + 1)
                if is_multi and k <= min(rem_eval, rem_max):
                    dispatch(item, k, epoch, spec=spec, flops_src=hb)
                    host_step += k
                    epoch_cursor += k
                    if boundary_checks(epoch):
                        interrupted = True
                        break
                elif is_multi:
                    # an eval/max_steps boundary falls INSIDE this stack:
                    # run its rows as single steps so the boundary hits at
                    # the exact step count (stacks rarely straddle one)
                    stopped = False
                    for i in range(k):
                        if use_packed:
                            row = {kk: vv[i] for kk, vv in hb.items()}
                            rbuf, rspec = pack_batch(row)
                            dispatch(rbuf, 1, epoch, spec=rspec,
                                     flops_src=row)
                        else:
                            row_batch = jax.tree.map(lambda a: a[i], item)
                            dispatch(row_batch, 1, epoch)
                        host_step += 1
                        epoch_cursor += 1
                        if boundary_checks(epoch):
                            stopped = True
                            break
                    if stopped:
                        interrupted = True
                        break
                else:
                    dispatch(item, 1, epoch, spec=spec, flops_src=hb)
                    host_step += 1
                    epoch_cursor += 1
                    if boundary_checks(epoch):
                        interrupted = True
                        break
            flush_logs()
            # A mid-epoch stop (max_steps / early stop) records the CURRENT
            # epoch plus the within-epoch step cursor, so resume fast-
            # forwards the seed-deterministic batch stream to the exact next
            # batch (batch-exact: the step RNG folds in state.step, so a
            # resumed run is bit-identical to an uninterrupted one —
            # tested). Epoch-boundary saves record (epoch+1, cursor 0).
            # Routine epoch-boundary saves may be skipped while a previous
            # save is still in flight (slow links self-tune); the FINAL save
            # — stop or last epoch — always lands.
            last_epoch = epoch == cfg.train.max_epochs - 1
            ckpt.save(ckpt_dir, "last", state,
                      {"epoch": epoch if interrupted else epoch + 1,
                       "epoch_cursor": epoch_cursor if interrupted else 0,
                       "best_bleu": best_bleu,
                       "evals_since_best": evals_since_best},
                      skip_if_busy=not (stop or last_epoch))
            reset_timer()
            if stop:
                break
    finally:
        # A crash mid-epoch must not discard the buffered loss/grad rows —
        # they are exactly what diagnoses the failure. (Suppressed errors:
        # if the device itself died, the fetch fails too and the original
        # exception must not be masked.)
        try:
            flush_logs()
        except Exception:
            pass
        # "last" must be durable before this function returns (resume
        # correctness); also re-raises any background write error — unless
        # an exception is already propagating, which must not be masked.
        import sys
        if sys.exc_info()[0] is None:
            ckpt.wait()
        else:
            try:
                ckpt.wait()
            except Exception:
                pass

    final.update({"steps": float(int(state.step)), "best_bleu": best_bleu})
    log.log("done", **final)
    return final
