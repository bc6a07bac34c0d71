"""Stage-1 warm-up CLI: align text with new speech tokens
(reference stage1.py:96-531).

Only the new speech-token embedding rows train (gradient row-masking); data
is formatted through the same template processor and packed into fixed-length
sequences (TRL packing=True equivalent, stage1.py:323) for static shapes.
"""
from __future__ import annotations

import argparse
import os
from typing import Iterator, List

import numpy as np


def pack_sequences(id_lists: List[List[int]], seq_len: int,
                   eos_id: int) -> np.ndarray:
    """Concatenate examples and slice into fixed [N, seq_len] rows — the
    static-shape equivalent of TRL's packing=True."""
    flat: List[int] = []
    for ids in id_lists:
        flat.extend(ids)
        flat.append(eos_id)
    n = len(flat) // seq_len
    if n == 0:
        return np.zeros((0, seq_len), np.int32)
    return np.asarray(flat[:n * seq_len], np.int32).reshape(n, seq_len)


def train_stage1(config):
    import jax
    from speech_distill_tpu.core.config import MeshConfig, parse_prefix
    from speech_distill_tpu.core.trainer import LoopConfig, train_loop
    from speech_distill_tpu.data.processor import SpeechDistillProcessor
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.models.hf_loader import load_pretrained
    from speech_distill_tpu.parallel import mesh as meshlib
    from speech_distill_tpu.parallel import sharding
    from speech_distill_tpu.pipelines.common import (
        load_hf_dataset, load_tokenizer)

    tokenizer = load_tokenizer(config.model_path)
    cfg, params = load_pretrained(config.model_path)
    sp = getattr(config, "sp", 1)
    if sp > 1:
        import dataclasses
        cfg = dataclasses.replace(cfg, attn_impl="ring")
    num_new = config.num_new_tokens
    old_vocab_size = cfg.vocab_size - num_new

    dataset = load_hf_dataset(config.dataset_path)
    from speech_distill_tpu.tokenizer.s3 import default_speech_tokens_fn
    processor = SpeechDistillProcessor(
        tokenizer, speech_tokens_fn=default_speech_tokens_fn(),
        prefix=parse_prefix(config.prefix),
        text_bos=config.text_bos, text_eos=config.text_eos,
        text_prefix=parse_prefix(config.text_prefix),
        speech_bos=config.speech_bos, speech_eos=config.speech_eos)

    def process_one(example):
        try:
            return processor.process_example(example)["input_ids"]
        except Exception:
            text = example.get("text", "").strip()
            return tokenizer.encode(text) if text else None

    if config.num_workers > 1:
        # host-side audio->token work parallelizes across threads
        # (reference dataloader_num_workers, stage1.py:320)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(config.num_workers) as pool:
            processed = list(pool.map(
                process_one, (dataset[i] for i in range(len(dataset)))))
    else:
        processed = [process_one(dataset[i]) for i in range(len(dataset))]
    id_lists = [ids for ids in processed if ids]

    # eval split before packing (reference train_test_split seed=42,
    # stage1.py:172-182)
    eval_id_lists: List[List[int]] = []
    if config.eval_size > 0:
        order = np.random.default_rng(42).permutation(len(id_lists))
        n_eval = max(1, int(round(len(id_lists) * config.eval_size))) \
            if config.eval_size < 1 else int(config.eval_size)
        eval_id_lists = [id_lists[j] for j in order[:n_eval]]
        id_lists = [id_lists[j] for j in order[n_eval:]]
        print(f"Splitting dataset: {len(id_lists)} train, "
              f"{len(eval_id_lists)} eval")

    eos_id = tokenizer.eos_token_id or 0
    packed = pack_sequences(id_lists, config.max_seq_length, eos_id)
    if len(packed) == 0:
        raise ValueError("Train dataset is empty after processing!")
    print(f"Packed {len(id_lists)} examples into {len(packed)} sequences of "
          f"{config.max_seq_length}")
    eval_packed = pack_sequences(eval_id_lists, config.max_seq_length, eos_id)

    mesh = meshlib.make_mesh(MeshConfig(tp=1, sp=sp))
    meshlib.set_active_mesh(mesh)
    dp = mesh.shape["dp"]
    trainable = {"embed": {"weight": params["embed"]["weight"]}}
    if "lm_head" in params:
        trainable["lm_head"] = {"weight": params["lm_head"]["weight"]}

    B = config.batch_size * dp
    A = config.gradient_accumulation_steps
    steps = max(1, len(packed) // (B * A)) * config.num_epochs
    opt = train_step.make_optimizer(config.learning_rate, config.warmup_steps,
                                    steps, weight_decay=config.weight_decay,
                                    eight_bit=config.use_8bit_optimizer)
    state = train_step.init_state(trainable, opt)
    # long packed sequences (reference default 4096) need the fused CE —
    # materialized logits would be ~10GB at bs4 x seq4096 x 159k vocab
    import jax as _jax
    use_fused = config.max_seq_length >= 2048
    step_fn = train_step.make_stage1_step(
        cfg, opt, old_vocab_size, fused_loss=use_fused,
        fused_backend="pallas" if _jax.devices()[0].platform == "tpu"
        else "xla")
    base_s = sharding.shard_params(mesh, params, cfg)

    def batch_iter(epoch):
        order = np.random.default_rng(config.seed + epoch).permutation(len(packed))
        chunk = B * A
        for i in range(0, len(packed) - chunk + 1, chunk):
            ids = packed[order[i:i + chunk]].reshape(A, B, -1)
            labels = ids.astype(np.int64)
            yield {"input_ids": ids,
                   "attention_mask": np.ones_like(ids),
                   "labels": labels}

    eval_fn = None
    if len(eval_packed) > 0:
        eval_step = train_step.make_stage1_eval_step(cfg)
        # per-device eval batch (stage1.py:303), rounded up to the dp size
        eB = (max(config.eval_batch_size, 1) + dp - 1) // dp * dp

        def eval_fn(state):
            # every eval row is scored exactly once: the final short group
            # is padded to the static batch shape with repeated rows whose
            # labels are all IGNORE_INDEX, so they carry zero valid tokens
            # and drop out; the step returns (sum of CE, valid-token count)
            # per group, so the aggregate is the EXACT per-token mean even
            # with uneven valid-token counts across groups
            loss_sum, n_tokens = 0.0, 0.0
            for i in range(0, len(eval_packed), eB):
                rows = eval_packed[i:i + eB]
                n_real = len(rows)
                if n_real < eB:
                    pad = np.repeat(rows[-1:], eB - n_real, axis=0)
                    rows = np.concatenate([rows, pad], axis=0)
                labels = rows[None].astype(np.int64)
                if n_real < eB:
                    labels[0, n_real:] = -100
                b = {"input_ids": rows[None],
                     "attention_mask": np.ones_like(rows)[None],
                     "labels": labels}
                m = jax.device_get(eval_step(
                    state.trainable, base_s, sharding.shard_batch(mesh, b)))
                loss_sum += float(m["loss_sum"])
                n_tokens += float(m["n_tokens"])
            return {"loss": loss_sum / max(n_tokens, 1.0)}

    loop_cfg = LoopConfig(
        num_epochs=config.num_epochs, logging_steps=config.logging_steps,
        save_steps=config.save_steps, output_dir=config.output_dir,
        eval_steps=config.eval_steps if eval_fn else None,
        load_best_at_end=eval_fn is not None,  # stage1.py:311
        report_to="wandb" if config.use_wandb else "none")

    state = train_loop(step_fn, state, (base_s,), batch_iter, loop_cfg,
                       eval_fn=eval_fn,
                       put_batch=lambda b: sharding.shard_batch(mesh, b),
                       tokens_per_batch=B * A * config.max_seq_length)

    # save final model with updated embeddings
    from speech_distill_tpu.core.checkpoint import export_hf
    final = dict(params)
    final["embed"] = jax.device_get(state.trainable["embed"])
    if "lm_head" in state.trainable:
        final["lm_head"] = jax.device_get(state.trainable["lm_head"])
    out = os.path.join(config.output_dir, "final_model")
    export_hf(final, cfg, out)
    tokenizer.save_pretrained(out)
    print("Stage-1 training completed!")


def build_parser():
    from speech_distill_tpu.pipelines.common import add_template_args
    p = argparse.ArgumentParser(
        description="Stage 1: Text-to-Speech Token Alignment Training")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--num_epochs", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--eval_batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--eval_steps", type=int, default=500)
    p.add_argument("--eval_size", type=float, default=0)
    p.add_argument("--max_seq_length", type=int, default=4096)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel size (ring attention; "
                        "max_seq_length must divide by it)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--num_new_tokens", type=int, default=8220)
    p.add_argument("--prefix", type=str, default="")
    add_template_args(p, teacher_prefix=False, student_prefix=False)
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.set_defaults(gradient_checkpointing=True)
    p.add_argument("--use_8bit_optimizer", action="store_true")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    train_stage1(args)


if __name__ == "__main__":
    main()
