"""Teacher top-K logprob extraction: a batched TPU inference pass.

Reference: extract_teacher_logits.py:17-146 (order-preserving, no-grad
teacher forward, log_softmax -> top-K, truncation to true length, fp16/int32
columns). TPU-first changes: sequences are bucketed to pad_to_multiple_of so
XLA compiles one program per bucket, and the forward+topk runs as one jitted
function — extraction is limited by teacher FLOPs, not host glue.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.data.collator import pad_sequences, round_up


def make_extract_fn(teacher_forward: Callable, top_k: int,
                    vocab_limit: Optional[int] = None,
                    method: str = "exact",
                    hidden_forward: Optional[Callable] = None,
                    head_weight_fn: Optional[Callable] = None):
    """jitted (params, ids, mask) -> (top_v fp16 [B,T,K], top_i int32).

    With a dp mesh, shard the batch (parallel.sharding.shard_batch with
    microbatched=False) and the same jitted fn runs data-parallel — the
    extraction service scales to a pod slice unchanged.

    When ``hidden_forward`` + ``head_weight_fn`` are given, extraction runs
    fused with the lm-head matmul (ops.fused_lm_loss.fused_extract_top_k):
    the [B, T, 159k] fp32 teacher logits are never materialized, and the
    result set is exact (same as method='exact').
    """

    if hidden_forward is not None and head_weight_fn is not None:
        from speech_distill_tpu.ops.fused_lm_loss import fused_extract_top_k

        @jax.jit
        def fused_fn(params, ids, mask):
            hidden = hidden_forward(params, ids, mask)
            return fused_extract_top_k(hidden, head_weight_fn(params),
                                       top_k, vocab_limit)

        return fused_fn

    from speech_distill_tpu.distill.losses import extract_top_k

    @jax.jit
    def fn(params, ids, mask):
        logits = teacher_forward(params, ids, mask)
        return extract_top_k(logits, top_k, vocab_limit, method=method)

    return fn


def extract_teacher_logprobs(
        teacher_params,
        teacher_forward: Callable,
        sequences: Sequence[Dict],
        top_k: int = 100,
        batch_size: int = 4,
        pad_token_id: int = 0,
        pad_to_multiple_of: int = 128,
        vocab_limit: Optional[int] = None,
        progress: bool = True,
        mesh=None,
        method: str = "exact",
        hidden_forward: Optional[Callable] = None,
        head_weight_fn: Optional[Callable] = None,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Order-preserving extraction over a sequence of feature dicts.

    Each feature carries ``teacher_input_ids`` (or ``input_ids``) +
    matching attention mask. Returns per-example (values fp16 [t, K],
    indices int32 [t, K]) truncated to the true length t — exactly the
    on-disk format of the reference (extract_teacher_logits.py:119-129).
    """
    fn = make_extract_fn(teacher_forward, top_k, vocab_limit, method,
                         hidden_forward, head_weight_fn)
    put = None
    if mesh is not None:
        from speech_distill_tpu.parallel.sharding import shard_batch

        def put(ids, mask):
            b = shard_batch(mesh, {"ids": ids, "mask": mask},
                            microbatched=False)
            return b["ids"], b["mask"]
    all_v: List[np.ndarray] = []
    all_i: List[np.ndarray] = []
    it = range(0, len(sequences), batch_size)
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(list(it), desc=f"extract top-{top_k}")
        except ImportError:
            pass
    for start in it:
        feats = sequences[start:start + batch_size]
        ids_l = [f.get("teacher_input_ids", f.get("input_ids")) for f in feats]
        mask_l = [f.get("teacher_attention_mask",
                        f.get("attention_mask", [1] * len(i)))
                  for f, i in zip(feats, ids_l)]
        ids, mask = pad_sequences(ids_l, mask_l, pad_token_id,
                                  pad_to_multiple_of)
        if len(feats) < batch_size:      # final ragged batch: repeat-pad
            reps = batch_size - len(feats)
            ids = np.concatenate([ids, np.repeat(ids[-1:], reps, 0)])
            mask = np.concatenate([mask, np.repeat(mask[-1:], reps, 0)])
        if put is not None:
            jid, jmask = put(ids, mask)
        else:
            jid, jmask = jnp.asarray(ids), jnp.asarray(mask)
        v, i = fn(teacher_params, jid, jmask)
        v = np.asarray(v)
        i = np.asarray(i)
        lengths = mask.sum(axis=1)
        for b in range(len(feats)):
            n = int(lengths[b])
            all_v.append(v[b, :n].astype(np.float16))
            all_i.append(i[b, :n].astype(np.int32))
    return all_v, all_i


def main(argv=None):
    import argparse
    from speech_distill_tpu.core.config import parse_prefix
    from speech_distill_tpu.data.processor import SpeechDistillProcessor
    from speech_distill_tpu.models import qwen3
    from speech_distill_tpu.models.hf_loader import load_pretrained
    from speech_distill_tpu.pipelines.common import (
        add_template_args, load_hf_dataset, load_tokenizer)

    p = argparse.ArgumentParser(
        description="Extract teacher logprobs for distillation")
    p.add_argument("--teacher_model_path", type=str, required=True)
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--dataset_split", type=str, default="train")
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--max_length", type=int, default=None)
    p.add_argument("--pad_to_multiple_of", type=int, default=128)
    add_template_args(p, student_prefix=False)
    args = p.parse_args(argv)

    cfg, params = load_pretrained(args.teacher_model_path)
    tokenizer = load_tokenizer(args.teacher_model_path, args.pad_token)
    dataset = load_hf_dataset(args.dataset_path, args.dataset_split)

    if "input_ids" not in dataset.column_names and \
            "teacher_input_ids" not in dataset.column_names:
        processor = SpeechDistillProcessor(
            tokenizer,
            speech_tokens_fn=_default_speech_fn(),
            prefix=parse_prefix(args.teacher_prefix),
            text_bos=args.text_bos, text_eos=args.text_eos,
            text_prefix=parse_prefix(args.text_prefix),
            speech_bos=args.speech_bos, speech_eos=args.speech_eos,
            max_length=args.max_length)
        dataset = dataset.map(lambda ex: processor.process_example(ex),
                              desc="tokenize")

    def fwd(pp, ids, mask):
        return qwen3.forward(pp, ids, cfg, attention_mask=mask)

    feats = [dataset[i] for i in range(len(dataset))]
    # materialized logits + segmented exact top-k: measured 25.3k tok/s /
    # 46% teacher MFU on v5e vs 6.2k for the fused chunked scan (the fused
    # path stays available via hidden_forward= for HBM-constrained runs)
    all_v, all_i = extract_teacher_logprobs(
        params, fwd, feats, top_k=args.top_k, batch_size=args.batch_size,
        pad_token_id=tokenizer.pad_token_id,
        pad_to_multiple_of=args.pad_to_multiple_of)

    if len(all_v) != len(dataset):
        raise RuntimeError(
            f"Alignment mismatch! Extracted {len(all_v)} but dataset has "
            f"{len(dataset)}")
    dataset = dataset.add_column("teacher_top_k_v",
                                 [v.tolist() for v in all_v])
    dataset = dataset.add_column("teacher_top_k_i",
                                 [i.tolist() for i in all_i])
    dataset.save_to_disk(args.output_path)
    print(f"Saved enriched dataset to {args.output_path}")


def _default_speech_fn():
    from speech_distill_tpu.tokenizer.s3 import default_speech_tokens_fn
    return default_speech_tokens_fn()


if __name__ == "__main__":
    main()
