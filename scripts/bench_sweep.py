"""One-process KD throughput sweep over (batch, fused_loss, remat).

Informed by scripts/step_anatomy.py: model bwd carries a full-remat
recompute (~38ms) and the materialized-logits loss bwd costs ~70ms in
[B,T,159k] fp32 HBM round-trips — this sweep measures the candidates that
attack both, plus batch scaling within the reference's effective batch 16.
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


VARIANT_NAMES = ["bs16", "bs12", "bs8/save-everything",
                 "bs12/save-everything", "bs8"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--top_k", type=int, default=128)
    p.add_argument("--variant", default=None,
                   help="run ONE variant in this process (internal)")
    args = p.parse_args()

    if args.variant is None:
        # dispatcher: one subprocess per variant — several of these are
        # deliberately memory-risky, and a device OOM poisons the axon
        # process claim for every later program in the same process
        import subprocess
        here = os.path.abspath(__file__)
        for name in VARIANT_NAMES:
            proc = subprocess.run(
                [sys.executable, here, "--variant", name,
                 "--steps", str(args.steps), "--warmup", str(args.warmup),
                 "--seq", str(args.seq), "--top_k", str(args.top_k)],
                capture_output=True, text=True, timeout=1800)
            lines = [l for l in proc.stdout.splitlines()
                     if l.startswith("{")]
            if lines:
                print(lines[-1], flush=True)
            else:
                err = (proc.stderr or "").strip().splitlines()
                print(json.dumps({"variant": name,
                                  "error": err[-1][-160:] if err else "?"}),
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

    T, K = args.seq, args.top_k
    flops_token = 3.0 * qwen3.flops_per_token(cfg0, T)
    peak = 197e12
    rng = np.random.default_rng(0)

    def make_batch(B):
        return {
            "input_ids": jnp.asarray(
                rng.integers(0, cfg0.vocab_size, (1, B, T)), jnp.int32),
            "attention_mask": jnp.ones((1, B, T), jnp.int32),
            "labels": jnp.asarray(
                rng.integers(0, cfg0.vocab_size, (1, B, T)), jnp.int32),
            "teacher_top_k_v": jnp.asarray(
                rng.normal(size=(1, B, T, K)) - 3, jnp.float16),
            "teacher_top_k_i": jnp.asarray(
                rng.integers(0, cfg0.vocab_size, (1, B, T, K)), jnp.int32),
        }

    # (name, batch, step_kwargs, cfg_kwargs)
    variants = [
        ("bs16", 16, {}, {}),
        ("bs12", 12, {}, {}),
        ("bs8/save-everything", 8, {}, dict(remat_policy="everything")),
        ("bs12/save-everything", 12, {}, dict(remat_policy="everything")),
        ("bs8", 8, {}, {}),
    ]
    variants = [v for v in variants if v[0] == args.variant]
    assert variants, f"unknown variant {args.variant}"
    results = {}
    for name, B, step_kw, cfg_kw in variants:
        import gc
        gc.collect()
        cfg = dataclasses.replace(cfg0, **cfg_kw)
        opt = train_step.make_optimizer(5e-5, 10, 1000)
        step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                       donate=False, **step_kw)
        state = batch = metrics = None
        try:
            state = train_step.init_state(lora, opt)
            batch = make_batch(B)
            for _ in range(args.warmup):
                state, metrics = step(state, base, None, batch)
            float(metrics["loss"])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, metrics = step(state, base, None, batch)
            float(metrics["loss"])
            dt = time.perf_counter() - t0
        except Exception as e:
            results[name] = {"error": str(e)[:160]}
            print(json.dumps({"variant": name, "error": str(e)[:160]}),
                  flush=True)
            del state, batch, metrics
            continue
        del state, batch, metrics
        tps = args.steps / dt * B * T
        mfu = tps * flops_token / peak
        results[name] = {"ms_per_step": round(dt / args.steps * 1000, 1),
                         "tokens_per_sec": round(tps, 1),
                         "mfu": round(mfu, 4)}
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
