"""One-process KD step anatomy: where do the 230ms/step actually go?

Times isolated jitted subprograms at the bench config (bs8 x seq512,
unmerged LoRA, precomputed KD):
  fwd_hidden         student forward to final hidden (no lm head)
  fwd_logits         + lm-head matmul
  loss_from_logits   sparse KD loss given materialized logits
  fwd_loss           forward + loss (value only, no grad)
  grad               value_and_grad (no optimizer)
  step               full train step (grad + AdamW)
and repeats {fwd_hidden, grad} with attn_impl in {pallas, xla}.
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
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / steps * 1000.0


def jax_block(out):
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

    res = {}

    def eff_of(lo, bp):
        eff = dict(bp)
        eff["embed"] = lo["embed"]
        if "lm_head" in lo:
            eff["lm_head"] = lo["lm_head"]
        return eff

    for attn in ("pallas", "xla"):
        cfg = dataclasses.replace(cfg0, attn_impl=attn)

        # NB: base/ids/... passed as ARGUMENTS — large closed-over arrays
        # become constants shipped through the compile relay (HTTP 413)
        @jax.jit
        def fwd_hidden(lo, bp, ids, mask):
            return qwen3.forward(eff_of(lo, bp), ids, cfg,
                                 attention_mask=mask,
                                 return_hidden=True, adapters=lo["layers"],
                                 adapter_scale=g)

        @jax.jit
        def fwd_logits(lo, bp, ids, mask):
            return qwen3.forward(eff_of(lo, bp), ids, cfg,
                                 attention_mask=mask,
                                 adapters=lo["layers"], adapter_scale=g)

        def _loss(lo, bp, ids, mask, tv, ti, labels):
            logits = qwen3.forward(eff_of(lo, bp), ids, cfg,
                                   attention_mask=mask,
                                   adapters=lo["layers"], adapter_scale=g)
            return losses.sparse_distill_loss(logits, tv, ti, labels, None,
                                              dcfg.temperature,
                                              dcfg.alpha).total

        fwd_loss = jax.jit(_loss)
        grad_full = jax.jit(jax.grad(_loss))

        grad_nohead = jax.jit(jax.grad(
            lambda lo, bp, ids, mask: jnp.sum(
                qwen3.forward(eff_of(lo, bp), ids, cfg, attention_mask=mask,
                              return_hidden=True, adapters=lo["layers"],
                              adapter_scale=g).astype(jnp.float32))))

        tag = f"attn={attn}"
        res[f"fwd_hidden/{tag}"] = timeit(fwd_hidden, lora, base, ids, mask,
                                          steps=args.steps)
        res[f"fwd_logits/{tag}"] = timeit(fwd_logits, lora, base, ids, mask,
                                          steps=args.steps)
        res[f"fwd_loss/{tag}"] = timeit(fwd_loss, lora, base, ids, mask,
                                        tv, ti, labels, steps=args.steps)
        res[f"grad_nohead/{tag}"] = timeit(grad_nohead, lora, base, ids,
                                           mask, steps=args.steps)
        res[f"grad/{tag}"] = timeit(grad_full, lora, base, ids, mask,
                                    tv, ti, labels, steps=args.steps)
        for k, v in res.items():
            if tag in k:
                print(json.dumps({k: round(v, 1)}), flush=True)

    # loss-only from fixed logits, and full step, at the default attn
    cfg = cfg0
    hidden = fwd_hidden(lora, base, ids, mask)
    logits_v = fwd_logits(lora, base, ids, mask)

    @jax.jit
    def loss_only(lg, tv, ti, labels):
        return losses.sparse_distill_loss(lg, tv, ti, labels, None,
                                          dcfg.temperature, dcfg.alpha).total

    @jax.jit
    def head_loss_grad(lo, h, tv, ti, labels):
        def f(lo):
            w = qwen3.lm_head_weight(
                {"lm_head": lo["lm_head"]} if "lm_head" in lo
                else {"embed": lo["embed"]})
            lg = jax.lax.dot_general(h, w, (((2,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return losses.sparse_distill_loss(lg, tv, ti, labels, None,
                                              dcfg.temperature,
                                              dcfg.alpha).total
        return jax.grad(f)(lo)

    opt = train_step.make_optimizer(5e-5, 10, 1000)
    state = train_step.init_state(lora, opt)
    step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                   donate=False)

    res["loss_only"] = timeit(loss_only, logits_v, tv, ti, labels,
                              steps=args.steps)
    res["head_loss_grad"] = timeit(head_loss_grad, lora, hidden,
                                   tv, ti, labels, steps=args.steps)
    res["full_step"] = timeit(lambda: step(state, base, None, batch1)[1],
                              steps=args.steps)
    print(json.dumps({k: round(v, 1) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
