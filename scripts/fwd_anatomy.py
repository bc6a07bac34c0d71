"""Price the model-forward VPU passes (VERDICT r2 #6: fwd 58ms vs ~39ms
matmul-ideal at bs8/seq512).

Times the hidden-state forward (no lm head) under trace-time ablations
(models/qwen3.ABLATE): baseline, no qk-norm, no rope, bf16 norm
accumulation, fused norm+rope, xla-vs-pallas attention. Ablated variants
are WRONG numerically — they only price the pass they remove.

Run on TPU: python scripts/fwd_anatomy.py
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--grad", action="store_true",
                   help="also time fwd+bwd (sum-of-squares loss)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import qwen3_student_0p6b
    from speech_distill_tpu.models import qwen3

    B, T = args.batch, args.seq
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 159488, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)

    variants = [
        ("baseline", set(), {}),
        ("no_qknorm", {"no_qknorm"}, {}),
        ("no_rope", {"no_rope"}, {}),
        ("no_qknorm+no_rope", {"no_qknorm", "no_rope"}, {}),
        ("bf16_norm", {"bf16_norm"}, {}),
        ("fused_qkrope", {"fused_qkrope"}, {}),
        ("fused_qkrope+bf16_norm", {"fused_qkrope", "bf16_norm"}, {}),
        ("xla_attn", set(), {"attn_impl": "xla"}),
        ("no_remat", set(), {"remat": False}),
    ]

    base_cfg = qwen3_student_0p6b()
    params = qwen3.init_params_on_device(0, base_cfg)

    for name, ablate, cfg_kw in variants:
        cfg = dataclasses.replace(base_cfg, **cfg_kw) if cfg_kw else base_cfg
        qwen3.ABLATE.clear()
        qwen3.ABLATE.update(ablate)
        try:
            if args.grad:
                def loss(p):
                    h = qwen3.forward(p, ids, cfg, attention_mask=mask,
                                      return_hidden=True)
                    return jnp.sum(jnp.square(h.astype(jnp.float32)))
                fn = jax.jit(jax.grad(loss))

                def run():
                    g = fn(params)
                    return float(jnp.sum(jnp.square(
                        g["final_ln"]["scale"].astype(jnp.float32))))
            else:
                fn = jax.jit(lambda p: jnp.sum(jnp.square(qwen3.forward(
                    p, ids, cfg, attention_mask=mask,
                    return_hidden=True).astype(jnp.float32))))

                def run():
                    return float(fn(params))

            run()
            run()
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = run()
            dt = (time.perf_counter() - t0) / args.steps * 1000
            print(json.dumps({"variant": name,
                              "ms": round(dt, 2), "check": out}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[-200:]}),
                  flush=True)
    qwen3.ABLATE.clear()


if __name__ == "__main__":
    main()
