"""One-process KD step anatomy: where do the ~230ms/step actually go?

Every timed program returns a SCALAR (tree sum-of-squares of its real
outputs) so nothing multi-GB is transferred through the relay and XLA
cannot DCE the work. bs8 x seq512, unmerged LoRA, precomputed KD.
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _block(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _block(out)
    return (time.perf_counter() - t0) / steps * 1000.0


def _block(out):
    import jax
    leaves = jax.tree.leaves(out)
    if leaves:
        float(np.asarray(leaves[0]).ravel()[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--top_k", type=int, default=128)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import (
        DistillConfig, LoraConfig, qwen3_student_0p6b)
    from speech_distill_tpu.distill import losses, train_step
    from speech_distill_tpu.distill.lora import init_lora, lora_scaling
    from speech_distill_tpu.models import qwen3

    dcfg = DistillConfig(top_k=args.top_k,
                         lora=LoraConfig(init_weights="gaussian"))
    cfg0 = qwen3_student_0p6b()
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg0)
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg0, dcfg.lora)
    del params
    g = lora_scaling(dcfg.lora)

    rng = np.random.default_rng(0)
    B, T, K = args.batch, args.seq, args.top_k
    ids = jnp.asarray(rng.integers(0, cfg0.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    labels = jnp.asarray(rng.integers(0, cfg0.vocab_size, (B, T)), jnp.int32)
    tv = jnp.asarray(rng.normal(size=(B, T, K)) - 3, jnp.float16)
    ti = jnp.asarray(rng.integers(0, cfg0.vocab_size, (B, T, K)), jnp.int32)
    batch1 = {"input_ids": ids[None], "attention_mask": mask[None],
              "labels": labels[None], "teacher_top_k_v": tv[None],
              "teacher_top_k_i": ti[None]}

    def sumsq(tree):
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                   for x in jax.tree.leaves(tree))

    def eff_of(lo, bp):
        eff = dict(bp)
        eff["embed"] = lo["embed"]
        if "lm_head" in lo:
            eff["lm_head"] = lo["lm_head"]
        return eff

    res = {}
    for attn in ("pallas", "xla"):
        cfg = dataclasses.replace(cfg0, attn_impl=attn)

        def _loss(lo, bp, ids, mask, tv, ti, labels):
            logits = qwen3.forward(eff_of(lo, bp), ids, cfg,
                                   attention_mask=mask,
                                   adapters=lo["layers"], adapter_scale=g)
            return losses.sparse_distill_loss(logits, tv, ti, labels, None,
                                              dcfg.temperature,
                                              dcfg.alpha).total

        fwd_loss = jax.jit(_loss)
        grad_full = jax.jit(
            lambda lo, bp, i_, m_, tv_, ti_, lb: sumsq(
                jax.grad(_loss)(lo, bp, i_, m_, tv_, ti_, lb)))
        grad_nohead = jax.jit(
            lambda lo, bp, i_, m_: sumsq(jax.grad(
                lambda l2: jnp.sum(qwen3.forward(
                    eff_of(l2, bp), i_, cfg, attention_mask=m_,
                    return_hidden=True, adapters=l2["layers"],
                    adapter_scale=g).astype(jnp.float32)))(lo)))

        tag = f"attn={attn}"
        res[f"fwd_loss/{tag}"] = timeit(fwd_loss, lora, base, ids, mask,
                                        tv, ti, labels, steps=args.steps)
        res[f"grad_nohead/{tag}"] = timeit(grad_nohead, lora, base, ids,
                                           mask, steps=args.steps)
        res[f"grad/{tag}"] = timeit(grad_full, lora, base, ids, mask,
                                    tv, ti, labels, steps=args.steps)
        for k, v in res.items():
            if tag in k:
                print(json.dumps({k: round(v, 1)}), flush=True)

    # head+loss grad from fixed hidden (lm_head + embed-tied grads only)
    cfg = cfg0
    hidden = jax.jit(
        lambda lo, bp, i_, m_: qwen3.forward(
            eff_of(lo, bp), i_, cfg, attention_mask=m_, return_hidden=True,
            adapters=lo["layers"], adapter_scale=g)
    )(lora, base, ids, mask)

    def make_head_loss_grad(head_bwd_dtype):
        hcfg = dataclasses.replace(cfg, head_bwd_dtype=head_bwd_dtype)

        @jax.jit
        def head_loss_grad(lo, h, tv, ti, labels):
            def f(args_):
                lo_, h_ = args_
                pp = ({"lm_head": lo_["lm_head"]} if "lm_head" in lo_
                      else {"embed": lo_["embed"]})
                lg = qwen3.unembed(pp, h_, hcfg)
                return losses.sparse_distill_loss(lg, tv, ti, labels, None,
                                                  dcfg.temperature,
                                                  dcfg.alpha).total
            return sumsq(jax.grad(f)((lo, h)))
        return head_loss_grad

    opt = train_step.make_optimizer(5e-5, 10, 1000)
    state = train_step.init_state(lora, opt)
    step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                   donate=False)

    for hb in ("bfloat16", "float32"):
        res[f"head_loss_grad/{hb}"] = timeit(
            make_head_loss_grad(hb), lora, hidden, tv, ti, labels,
            steps=args.steps)
        print(json.dumps({f"head_loss_grad/{hb}":
                          round(res[f"head_loss_grad/{hb}"], 1)}), flush=True)
    res["full_step"] = timeit(lambda: step(state, base, None, batch1)[1],
                              steps=args.steps)
    print(json.dumps({k: round(v, 1) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
