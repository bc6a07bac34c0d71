"""Model-only fwd+bwd time vs remat policy (bs8/seq512, unmerged LoRA).

Isolates the recompute cost of full rematerialisation: grad_nohead has no
[B,T,159k] logits so 'everything' (save all residuals) fits in HBM here.
Each variant runs in its own subprocess (an OOM poisons the process's TPU
claim on axon).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    ("full", "true"),
    ("everything", "true"),
    ("dots", "true"),
    ("half", "true"),
]


def run_one(policy: str):
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import (DistillConfig, LoraConfig,
                                                qwen3_student_0p6b)
    from speech_distill_tpu.distill.lora import init_lora, lora_scaling
    from speech_distill_tpu.models import qwen3

    dcfg = DistillConfig(top_k=128, lora=LoraConfig(init_weights="gaussian"))
    cfg = dataclasses.replace(qwen3_student_0p6b(), remat_policy=policy)
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    del params
    g = lora_scaling(dcfg.lora)

    rng = np.random.default_rng(0)
    B, T = 8, 512
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)

    def eff_of(lo, bp):
        eff = dict(bp)
        eff["embed"] = lo["embed"]
        if "lm_head" in lo:
            eff["lm_head"] = lo["lm_head"]
        return eff

    def sumsq(tree):
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                   for x in jax.tree.leaves(tree))

    grad_nohead = jax.jit(
        lambda lo, bp, i_, m_: sumsq(jax.grad(
            lambda l2: jnp.sum(qwen3.forward(
                eff_of(l2, bp), i_, cfg, attention_mask=m_,
                return_hidden=True, adapters=l2["layers"],
                adapter_scale=g).astype(jnp.float32)))(lo)))

    for _ in range(2):
        out = grad_nohead(lora, base, ids, mask)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(10):
        out = grad_nohead(lora, base, ids, mask)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / 10 * 1000.0
    print(json.dumps({"policy": policy, "grad_nohead_ms": round(dt, 1)}),
          flush=True)


def main():
    if len(sys.argv) > 1:
        return run_one(sys.argv[1])
    here = os.path.abspath(__file__)
    for policy, _ in VARIANTS:
        proc = subprocess.run([sys.executable, here, policy],
                              capture_output=True, text=True, timeout=1500,
                              cwd=os.path.dirname(os.path.dirname(here)))
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if line:
            print(line[-1], flush=True)
        else:
            err = (proc.stderr or "").strip().splitlines()
            print(json.dumps({"policy": policy,
                              "error": err[-1][-200:] if err else "?"}),
                  flush=True)


if __name__ == "__main__":
    main()
