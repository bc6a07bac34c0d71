"""LoRA for the functional Qwen3: rsLoRA scaling + PiSSA init.

Reference uses PEFT LoRA on q/k/v/o/gate/up/down with embed_tokens & lm_head
in ``modules_to_save`` (train.py:180-202; defaults r=32, alpha=64, rsLoRA on,
PiSSA init — train.py:474-487).

TPU-first design: instead of patching module forwards, adapters live in a
separate pytree and are *merged functionally* inside the jitted step:

    W_eff = stop_gradient(W_base) + scaling * A @ B

XLA fuses the add into the consuming matmul's producer chain; gradients flow
only into (A, B) and the full-rank saved modules (embed/lm_head). This keeps
the model code adapter-free and makes checkpointing/merging trivial.

Shapes follow the stacked-layer convention: A [L, in, r], B [L, r, out].
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_distill_tpu.core.config import LoraConfig, Qwen3Config

Params = Dict[str, Any]

# module name -> (group, key) in the layer pytree
_TARGETS = {
    "q_proj": ("attn", "q"),
    "k_proj": ("attn", "k"),
    "v_proj": ("attn", "v"),
    "o_proj": ("attn", "o"),
    "gate_proj": ("mlp", "gate"),
    "up_proj": ("mlp", "up"),
    "down_proj": ("mlp", "down"),
}


def lora_scaling(cfg: LoraConfig) -> float:
    """rsLoRA: alpha/sqrt(r) (Kalajdzievski 2023); classic: alpha/r."""
    return cfg.alpha / np.sqrt(cfg.r) if cfg.use_rslora else cfg.alpha / cfg.r


def _principal_svd(W: np.ndarray, r: int, seed: int = 0,
                   oversample: int = 16, iters: int = 4):
    """Top-r SVD via a randomized range finder with power iterations —
    ~30x faster than full SVD for the 196 (1024 x 2-3k) PiSSA inits and
    accurate to float precision for the dominant subspace."""
    din, dout = W.shape
    k = min(r + oversample, min(din, dout))
    rng = np.random.default_rng(seed)
    Y = W @ rng.normal(size=(dout, k)).astype(W.dtype)
    for _ in range(iters):
        Y = W @ (W.T @ Y)
        Y, _ = np.linalg.qr(Y)
    Q, _ = np.linalg.qr(Y)
    B = Q.T @ W
    Ub, S, Vh = np.linalg.svd(B, full_matrices=False)
    return (Q @ Ub)[:, :r], S[:r], Vh[:r]


def init_lora(rng: jax.Array, base_params: Params, model_cfg: Qwen3Config,
              cfg: LoraConfig) -> Tuple[Params, Params]:
    """Build (lora_params, possibly-modified base_params).

    PiSSA (train.py:199): per target W, take the rank-r principal SVD
    component as the adapter and subtract it from the base so training
    starts from the principal subspace:
        A = U_r diag(sqrt(S_r/g)),  B = diag(sqrt(S_r/g)) V_r^T,
        W_base <- W - g * A @ B     (g = scaling)
    'gaussian'/'default': A ~ N(0, 1/r) (resp. kaiming-ish), B = 0.
    """
    g = lora_scaling(cfg)
    r = cfg.r
    lora: Params = {"layers": {}}
    new_base = jax.tree.map(lambda x: x, base_params)  # shallow copy of leaves

    for mod in cfg.target_modules:
        group, key = _TARGETS[mod]
        W = base_params["layers"][group][key]           # [L, din, dout]
        L, din, dout = W.shape
        if cfg.init_weights == "pissa":
            Wf = np.asarray(W, np.float32)
            A = np.zeros((L, din, r), np.float32)
            B = np.zeros((L, r, dout), np.float32)
            Wres = Wf.copy()
            for i in range(L):
                if min(din, dout) <= 4 * r:
                    U, S, Vh = np.linalg.svd(Wf[i], full_matrices=False)
                    U, S, Vh = U[:, :r], S[:r], Vh[:r]
                else:
                    U, S, Vh = _principal_svd(Wf[i], r, seed=i)
                s = np.sqrt(S / g)
                A[i] = U * s[None, :]
                B[i] = s[:, None] * Vh
                Wres[i] = Wf[i] - g * (A[i] @ B[i])
            new_base["layers"] = _set(new_base["layers"], group, key,
                                      jnp.asarray(Wres, W.dtype))
            a_arr = jnp.asarray(A, jnp.float32)
            b_arr = jnp.asarray(B, jnp.float32)
        else:
            rng, k1 = jax.random.split(rng)
            std = 1.0 / r if cfg.init_weights == "gaussian" else 1.0 / np.sqrt(din)
            a_arr = jax.random.normal(k1, (L, din, r), jnp.float32) * std
            b_arr = jnp.zeros((L, r, dout), jnp.float32)
        lora["layers"].setdefault(group, {})[key] = {"a": a_arr, "b": b_arr}

    # full-rank trainable copies of embed / lm_head (modules_to_save).
    # Real copies, not aliases: donating the trainable (split-apply /
    # in-place optimizer buffers) must not invalidate the frozen base.
    if "embed_tokens" in cfg.modules_to_save:
        lora["embed"] = {"weight": jnp.array(base_params["embed"]["weight"],
                                             copy=True)}
    if "lm_head" in cfg.modules_to_save:
        if "lm_head" in base_params:
            lora["lm_head"] = {"weight": jnp.array(
                base_params["lm_head"]["weight"], copy=True)}
        # tied embeddings: the embed copy above already covers the head
    return lora, new_base


def _set(tree: Params, group: str, key: str, value) -> Params:
    tree = dict(tree)
    tree[group] = dict(tree[group])
    tree[group][key] = value
    return tree


def merge_lora(base_params: Params, lora_params: Params,
               cfg: LoraConfig) -> Params:
    """Effective params for the forward pass (differentiable in lora only)."""
    g = lora_scaling(cfg)
    base = jax.lax.stop_gradient(base_params)
    eff = jax.tree.map(lambda x: x, base)
    layers = dict(eff["layers"])
    for group, mods in lora_params.get("layers", {}).items():
        gdict = dict(layers[group])
        for key, ab in mods.items():
            W = gdict[key]
            delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"],
                               preferred_element_type=jnp.float32) * g
            # add in the weight dtype: avoids upcasting the full base weight
            # to fp32 (measured ~3x the merge cost); the bf16 add rounds the
            # delta once, indistinguishable from rounding after an fp32 add
            gdict[key] = W + delta.astype(W.dtype)
        layers[group] = gdict
    eff["layers"] = layers
    if "embed" in lora_params:
        eff["embed"] = {"weight": lora_params["embed"]["weight"]}
    if "lm_head" in lora_params:
        eff["lm_head"] = {"weight": lora_params["lm_head"]["weight"]}
    return eff


def merge_and_export(base_params: Params, lora_params: Params,
                     cfg: LoraConfig) -> Params:
    """Fold adapters into a plain parameter pytree (for HF export)."""
    return jax.tree.map(lambda x: x, merge_lora(base_params, lora_params, cfg))


def count_trainable(lora_params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(lora_params))
