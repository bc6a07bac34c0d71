"""Real-scale KD loss-curve parity: 50+ steps on the ACTUAL Qwen3-0.6B.

Closes the BASELINE north star ("Stage-2 KD loss curve within 1% of
reference") at real scale instead of extrapolating it from 2-layer toys
(tests/test_loss_curve_parity.py): the same random-init 0.6B weights,
the same synthetic-but-fixed data, the same hyperparameters (AdamW
b1/b2/eps, linear warmup, global-norm clip 1.0), full-parameter sparse-KD
training — once through the torch reference loop (HF Qwen3 + reference
distillation_loss.py semantics, CPU fp32) and once through this repo's
jitted KD step (TPU, fp32 params, highest matmul precision).

Run each side in its own process (the torch side needs no TPU and can run
concurrently with TPU work):

    python scripts/loss_curve_parity_0p6b.py --side torch --out /tmp/t.json
    python scripts/loss_curve_parity_0p6b.py --side jax   --out /tmp/j.json
    python scripts/loss_curve_parity_0p6b.py --side compare \
        --torch_curve /tmp/t.json --jax_curve /tmp/j.json

Weights/data are derived from fixed seeds via a shared recipe, so the two
sides never need to exchange tensors (the 0.6B state_dict would be slow
through the relay): torch builds the model with manual_seed(0) and saves
nothing; jax rebuilds the same weights by converting a torch model built
the same way (torch CPU import is cheap in-process).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, K = 2, 128, 64
STEPS = 50
LR, WARMUP = 1e-4, 10
TEMPERATURE, ALPHA = 2.0, 0.5
SEED = 0


def make_data():
    rng = np.random.default_rng(SEED)
    data = []
    for _ in range(STEPS):
        ids = rng.integers(0, 159488, (B, T))
        labels = ids.copy().astype(np.int64)
        labels[:, :8] = -100
        v = (rng.normal(size=(B, T, K)) - 2).astype(np.float32)
        i = rng.integers(0, 159488, (B, T, K)).astype(np.int32)
        data.append((ids, labels, v, i))
    return data


def build_torch_model():
    import torch
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM

    from speech_distill_tpu.core.config import qwen3_student_0p6b
    cfg = qwen3_student_0p6b()
    hf_cfg = HFQwen3Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=True, attention_bias=False)
    torch.manual_seed(SEED)
    model = Qwen3ForCausalLM(hf_cfg).to(torch.float32)
    return cfg, model


def _torch_sparse_loss(student_logits, labels, v, i, temperature, alpha):
    """Reference distillation_loss.py:73-118 semantics (dynamic shapes);
    same oracle as tests/test_loss_curve_parity.py."""
    import torch.nn.functional as F
    s = student_logits[..., :-1, :].reshape(-1, student_logits.size(-1))
    l = labels[..., 1:].reshape(-1)
    valid = l != -100
    s_v, l_v = s[valid], l[valid]
    k = v.size(-1)
    v_v = v[..., :-1, :].reshape(-1, k)[valid].float()
    i_v = i[..., :-1, :].reshape(-1, k)[valid].long()
    T_ = temperature
    soft_t = F.softmax(v_v / T_, -1)
    log_t = F.log_softmax(v_v / T_, -1)
    log_s = F.log_softmax(s_v / T_, -1).gather(-1, i_v)
    distill = (soft_t * (log_t - log_s)).sum(-1).mean() * T_ * T_
    task = F.cross_entropy(s_v, l_v)
    return alpha * task + (1 - alpha) * distill


def run_torch(out: str):
    import time
    import torch

    _, model = build_torch_model()
    data = make_data()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda s: (s / WARMUP if s < WARMUP
                        else max(0.0, (STEPS - s) / (STEPS - WARMUP))))
    losses = []
    for n, (ids, labels, v, i) in enumerate(data):
        t0 = time.perf_counter()
        logits = model(input_ids=torch.tensor(ids)).logits
        loss = _torch_sparse_loss(logits, torch.tensor(labels),
                                  torch.tensor(v), torch.tensor(i),
                                  TEMPERATURE, ALPHA)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        sched.step()
        losses.append(float(loss))
        print(f"torch step {n}: {losses[-1]:.6f} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    json.dump({"losses": losses}, open(out, "w"))


def run_jax(out: str):
    import functools
    import time
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # exact-ish fp32 matmuls: parity is the point, not throughput
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import optax
    from speech_distill_tpu.distill import losses as loss_lib
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.models import qwen3
    from speech_distill_tpu.models.hf_loader import from_state_dict

    cfg, model = build_torch_model()
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32",
                       "logits_dtype": "float32"})
    params = from_state_dict(model.state_dict(), cfg, dtype="float32")
    del model
    data = make_data()

    opt = train_step.make_optimizer(LR, WARMUP, STEPS)
    opt_state = opt.init(params)
    mask = jnp.ones((B, T), jnp.int32)

    # split grad / donated-apply programs: full-param fp32 0.6B training
    # (params + grads + 2 moments + a non-donated update copy) does not
    # fit 16G HBM in one non-donating program; donating the APPLY program
    # alone keeps the peak ~10G. (This also retests donation on the axon
    # relay with a small elementwise program — VERDICT r2 #9.)
    @jax.jit
    def grad_fn(p, ids, labels, v, i):
        def f(p):
            logits = qwen3.forward(p, ids, cfg, attention_mask=mask)
            return loss_lib.sparse_distill_loss(
                logits, v, i, labels, None, TEMPERATURE, ALPHA).total
        return jax.value_and_grad(f)(p)

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def apply_fn(p, g, s):
        u, s2 = opt.update(g, s, p)
        return optax.apply_updates(p, u), s2

    losses = []
    for n, (ids, labels, v, i) in enumerate(data):
        t0 = time.perf_counter()
        loss, g = grad_fn(params, jnp.asarray(ids, jnp.int32),
                          jnp.asarray(labels), jnp.asarray(v),
                          jnp.asarray(i))
        params, opt_state = apply_fn(params, g, opt_state)
        del g
        losses.append(float(loss))
        print(f"jax step {n}: {losses[-1]:.6f} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    json.dump({"losses": losses}, open(out, "w"))


def compare(torch_curve: str, jax_curve: str):
    t = json.load(open(torch_curve))["losses"]
    j = json.load(open(jax_curve))["losses"]
    assert len(t) == len(j) >= 50
    rel = [abs(a - b) / abs(b) for a, b in zip(j, t)]
    print(json.dumps({
        "steps": len(t),
        "max_rel_divergence": max(rel),
        "final_rel_divergence": rel[-1],
        "torch_first_last": [t[0], t[-1]],
        "jax_first_last": [j[0], j[-1]],
        "within_1pct": max(rel) < 0.01,
    }, indent=2))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--side", choices=["torch", "jax", "compare"],
                   required=True)
    p.add_argument("--out", default="/tmp/curve.json")
    p.add_argument("--torch_curve", default="/tmp/curve_torch.json")
    p.add_argument("--jax_curve", default="/tmp/curve_jax.json")
    a = p.parse_args()
    if a.side == "torch":
        run_torch(a.out)
    elif a.side == "jax":
        run_jax(a.out)
    else:
        compare(a.torch_curve, a.jax_curve)
