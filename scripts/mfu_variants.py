"""One-process MFU experiment: KD step-time across training-path variants.

Run on the real TPU (single claim, sequential variants):
    python scripts/mfu_variants.py [--steps 15]

Variants (bs8 x seq512 x topk128, precomputed KD — the bench headline):
  merged/full      round-1 baseline: merge_lora + full per-layer remat
  unmerged/full    unmerged adapters (no dense dW in bwd) + full remat
  unmerged/dots    unmerged + checkpoint_dots (save MXU outputs)
  unmerged/none    unmerged + no remat (fits now: no fp32 dW buffers)
  unmerged/dots/xla  same as dots but XLA SDPA instead of pallas flash
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


VARIANT_NAMES = ["merged/full", "unmerged/full", "unmerged/dots",
                 "unmerged/none", "unmerged/dots/xla", "unmerged/none/xla"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--top_k", type=int, default=128)
    p.add_argument("--variant", default=None,
                   help="run ONE variant in this process (internal)")
    args = p.parse_args()

    if args.variant is None:
        # dispatcher: one subprocess per variant — the no-remat configs
        # are memory-risky and a device OOM poisons the axon claim for
        # every later program in the same process
        import subprocess
        here = os.path.abspath(__file__)
        for name in VARIANT_NAMES:
            proc = subprocess.run(
                [sys.executable, here, "--variant", name,
                 "--steps", str(args.steps), "--warmup", str(args.warmup),
                 "--batch", str(args.batch), "--seq", str(args.seq),
                 "--top_k", str(args.top_k)],
                capture_output=True, text=True, timeout=1800)
            lines = [l for l in proc.stdout.splitlines()
                     if l.startswith("{")]
            if lines:
                print(lines[-1], flush=True)
            else:
                err = (proc.stderr or "").strip().splitlines()
                print(json.dumps({"variant": name,
                                  "error": err[-1][-200:] if err else "?"}),
                      flush=True)
        return

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import (
        DistillConfig, LoraConfig, qwen3_student_0p6b)
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.distill.lora import init_lora
    from speech_distill_tpu.models import qwen3

    cfg0 = qwen3_student_0p6b()
    dcfg = DistillConfig(top_k=args.top_k,
                         lora=LoraConfig(init_weights="gaussian"))
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg0)
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg0, dcfg.lora)
    del params

    rng = np.random.default_rng(0)
    B, T, K = args.batch, args.seq, args.top_k
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, cfg0.vocab_size, (1, B, T)),
                                 jnp.int32),
        "attention_mask": jnp.ones((1, B, T), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, cfg0.vocab_size, (1, B, T)),
                              jnp.int32),
        "teacher_top_k_v": jnp.asarray(rng.normal(size=(1, B, T, K)) - 3,
                                       jnp.float16),
        "teacher_top_k_i": jnp.asarray(
            rng.integers(0, cfg0.vocab_size, (1, B, T, K)), jnp.int32),
    }

    flops_token = 3.0 * qwen3.flops_per_token(cfg0, T)
    peak = 197e12

    variants = [
        ("merged/full", dict(merge_weights=True), dict()),
        ("unmerged/full", dict(merge_weights=False), dict()),
        ("unmerged/dots", dict(merge_weights=False),
         dict(remat_policy="dots")),
        ("unmerged/none", dict(merge_weights=False), dict(remat=False)),
        ("unmerged/dots/xla", dict(merge_weights=False),
         dict(remat_policy="dots", attn_impl="xla")),
        ("unmerged/none/xla", dict(merge_weights=False),
         dict(remat=False, attn_impl="xla")),
    ]
    variants = [v for v in variants if v[0] == args.variant]
    assert variants, f"unknown variant {args.variant}"
    results = {}
    for name, step_kw, cfg_kw in variants:
        cfg = dataclasses.replace(cfg0, **cfg_kw)
        opt = train_step.make_optimizer(5e-5, 10, 1000)
        state = train_step.init_state(lora, opt)
        step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                       donate=False, **step_kw)
        try:
            for _ in range(args.warmup):
                state, metrics = step(state, base, None, batch)
            float(metrics["loss"])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, metrics = step(state, base, None, batch)
            float(metrics["loss"])
            dt = time.perf_counter() - t0
        except Exception as e:  # OOM etc. — keep going
            results[name] = {"error": str(e)[:200]}
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        sps = args.steps / dt
        tps = sps * B * T
        mfu = tps * flops_token / peak
        results[name] = {"ms_per_step": round(1000 / sps, 1),
                         "tokens_per_sec": round(tps, 1),
                         "mfu": round(mfu, 4)}
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
