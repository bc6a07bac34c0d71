"""Training loop: the HF-Trainer-shaped outer loop, functional inside.

Replaces HF ``Trainer``/TRL ``SFTTrainer`` usage in the reference
(train.py:357-369, stage1.py:329-335): epoch iteration, grad accumulation
(as a microbatch axis), periodic logging, Orbax checkpointing with
retention, eval, resume.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import jax
import numpy as np

from speech_distill_tpu.core.checkpoint import CheckpointManager
from speech_distill_tpu.core.metrics import MetricsLogger


@dataclasses.dataclass
class LoopConfig:
    num_epochs: int = 3
    max_steps: Optional[int] = None
    logging_steps: int = 10
    save_steps: Optional[int] = None      # None -> save per epoch
    save_total_limit: int = 3
    output_dir: str = "./output"
    report_to: str = "none"
    eval_steps: Optional[int] = None      # None + eval_fn -> eval per epoch
    load_best_at_end: bool = True         # reference train.py:343


def shuffled_stream(dataset: Iterable,
                    shuffle_seed: Optional[int] = None,
                    epoch: int = 0,
                    shuffle_buffer: Optional[int] = None,
                    host_count: int = 1,
                    host_index: int = 0) -> Iterator:
    """Stream dataset items with O(shuffle_buffer) host memory.

    Replaces the materialize-the-epoch ``list(dataset)`` (the reference
    relies on torch DataLoader workers + sampler, train.py:348-353; here a
    windowed shuffle buffer gives the streaming equivalent):

      * ``host_count``/``host_index``: deterministic every-Nth-item shard
        split (multi-host data loading hook), applied BEFORE shuffling so
        hosts draw disjoint items regardless of buffer size.
      * ``shuffle_buffer=None`` (or >= dataset size): the buffer swallows
        the whole stream and emits ``rng.permutation`` of it — *identical*
        order to the old materialized implementation for the same
        (seed, epoch).
      * bounded ``shuffle_buffer=W``: classic windowed shuffle — fill W
        items, then for each incoming item emit a uniformly drawn buffer
        slot and replace it; drain the tail in a final permutation. Every
        item is emitted exactly once; order is deterministic per
        (seed, epoch, W).
    """
    it = iter(dataset)
    if host_count > 1:
        it = (x for i, x in enumerate(it) if i % host_count == host_index)
    if shuffle_seed is None:
        yield from it
        return
    rng = np.random.default_rng(shuffle_seed + epoch)
    if shuffle_buffer is None:
        items = list(it)
        for i in rng.permutation(len(items)):
            yield items[i]
        return
    buf: List = []
    for x in it:
        if len(buf) < shuffle_buffer:
            buf.append(x)
            continue
        j = int(rng.integers(len(buf)))
        out, buf[j] = buf[j], x
        yield out
    for i in rng.permutation(len(buf)):
        yield buf[i]


def batches_from(dataset: Iterable[Dict[str, np.ndarray]],
                 collate: Callable, batch_size: int, accum: int,
                 drop_last: bool = True,
                 shuffle_seed: Optional[int] = None,
                 epoch: int = 0,
                 shuffle_buffer: Optional[int] = None,
                 host_count: int = 1,
                 host_index: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Group examples into [A, B, ...] microbatched host batches.

    Streaming: host memory is O(shuffle_buffer + batch_size*accum), not
    O(epoch) — see :func:`shuffled_stream` for the shuffle/shard semantics
    (``shuffle_buffer=None`` reproduces the old materialized order).
    """
    chunk = batch_size * accum
    group: List = []
    for x in shuffled_stream(dataset, shuffle_seed, epoch, shuffle_buffer,
                             host_count, host_index):
        group.append(x)
        if len(group) < chunk:
            continue
        big = collate(group)
        group = []
        yield {k: v.reshape((accum, batch_size) + v.shape[1:])
               for k, v in big.items()}
    if group and not drop_last:
        # repeat-pad (tiling) the final group to a full static shape
        group = (group * (-(-chunk // len(group))))[:chunk]
        big = collate(group)
        yield {k: v.reshape((accum, batch_size) + v.shape[1:])
               for k, v in big.items()}


def train_loop(step_fn: Callable, state, frozen_args: tuple,
               batch_iter_fn: Callable[[int], Iterator[Dict[str, np.ndarray]]],
               cfg: LoopConfig,
               put_batch: Optional[Callable] = None,
               eval_fn: Optional[Callable] = None,
               ckpt: Optional[CheckpointManager] = None,
               tokens_per_batch: Optional[int] = None):
    """Run the loop. ``step_fn(state, *frozen_args, batch) -> (state, metrics)``.

    ``batch_iter_fn(epoch)`` yields host batches; ``put_batch`` places them
    on the mesh (defaults to identity — jit will transfer).
    Returns the final state.
    """
    import os
    from speech_distill_tpu.core.metrics import ProfilerWindow

    # multi-host: Orbax coordinates the multi-process save itself — every
    # process passes the ON-DEVICE state and writes only its addressable
    # shards (jax.device_get raises on non-addressable cross-process
    # shards). Metrics/prints come from the primary only; save/restore/eval
    # run on every process (they contain collectives).
    multiproc = jax.process_count() > 1
    primary = jax.process_index() == 0
    host_view = (lambda s: s) if multiproc else jax.device_get

    logger = MetricsLogger(cfg.output_dir, cfg.report_to if primary
                           else "none", write=primary)
    profiler = ProfilerWindow(
        os.environ.get("SDT_PROFILE", f"{cfg.output_dir}/trace"),
        enabled=bool(os.environ.get("SDT_PROFILE")) and primary)
    if ckpt is None:
        ckpt = CheckpointManager(f"{cfg.output_dir}/ckpt", cfg.save_total_limit)

    # resume
    start_step = 0
    latest = ckpt.latest_step()
    if latest is not None:
        restored = ckpt.restore(state, latest)
        if restored is not None:
            state = restored
            start_step = latest
            if primary:
                print(f"resumed from step {latest}")

    from speech_distill_tpu.core.prefetch import prefetch

    global_step = start_step
    done = False
    best = {"loss": float("inf"), "step": None}

    def run_eval():
        eval_metrics = eval_fn(state)
        logger.log(global_step,
                   {f"eval_{k}": v for k, v in eval_metrics.items()})
        loss = float(eval_metrics.get("loss", float("inf")))
        if loss < best["loss"]:
            best["loss"] = loss
            best["step"] = global_step
            if ckpt.latest_step() != global_step:
                ckpt.save(global_step, host_view(state))

    for epoch in range(cfg.num_epochs):
        if done:
            break
        # prefetch: collation + device placement run in a background thread
        for batch in prefetch(batch_iter_fn(epoch), put=put_batch, depth=2):
            state, metrics = step_fn(state, *frozen_args, batch)
            global_step += 1
            profiler.on_step(global_step)
            if global_step % cfg.logging_steps == 0:
                metrics = jax.device_get(metrics)
                logger.log(global_step, metrics, tokens_per_batch)
            if cfg.save_steps and global_step % cfg.save_steps == 0:
                ckpt.save(global_step, host_view(state))
            if cfg.eval_steps and eval_fn and global_step % cfg.eval_steps == 0:
                run_eval()
            if cfg.max_steps and global_step >= cfg.max_steps:
                done = True
                break
        if eval_fn and not cfg.eval_steps:
            run_eval()                        # per-epoch eval (reference)
        if not cfg.save_steps and ckpt.latest_step() != global_step:
            # per-epoch save (reference default)
            ckpt.save(global_step, host_view(state))
    if ckpt.latest_step() != global_step:
        ckpt.save(global_step, host_view(state), force=True)
    ckpt.wait()
    if (cfg.load_best_at_end and eval_fn and best["step"] is not None
            and best["step"] != global_step):
        restored = ckpt.restore(host_view(state), best["step"])
        if restored is not None:
            state = restored
            if primary:
                print(f"loaded best model from step {best['step']} "
                      f"(eval loss {best['loss']:.4f})")
    logger.close()
    return state
