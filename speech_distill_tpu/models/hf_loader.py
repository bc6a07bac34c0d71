"""HF checkpoint import/export for Qwen3 params.

The reference loads teacher/student via ``AutoModelForCausalLM.from_pretrained``
(train.py:155-178). Here the host converts HF safetensors / torch state dicts
into the stacked-layer pytree of :mod:`speech_distill_tpu.models.qwen3`, and
back out for HF-compatible artifact export (so reference users can consume
checkpoints produced on TPU).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp

from speech_distill_tpu.core.config import Qwen3Config


def _to_np(t) -> np.ndarray:
    """torch tensor / np array -> float32 numpy (bf16-safe).

    Always copies: .numpy() on an fp32 CPU tensor returns a VIEW of the
    torch buffer, and jax-CPU device_put can be zero-copy — without the
    copy, later in-place torch updates would silently mutate jax params.
    """
    if isinstance(t, np.ndarray):
        return t
    import torch
    with torch.no_grad():
        return t.detach().to(torch.float32).cpu().numpy().copy()


def config_from_hf(hf_cfg) -> Qwen3Config:
    """Build a Qwen3Config from a transformers config object or dict."""
    get = (hf_cfg.get if isinstance(hf_cfg, dict)
           else lambda k, d=None: getattr(hf_cfg, k, d))
    model_type = get("model_type", "qwen3")
    is_qwen2 = model_type == "qwen2"
    return Qwen3Config(
        attention_bias=get("attention_bias", is_qwen2),
        qk_norm=not is_qwen2,
        vocab_size=get("vocab_size"),
        hidden_size=get("hidden_size"),
        intermediate_size=get("intermediate_size"),
        num_hidden_layers=get("num_hidden_layers"),
        num_attention_heads=get("num_attention_heads"),
        num_key_value_heads=get("num_key_value_heads"),
        head_dim=get("head_dim", get("hidden_size") // get("num_attention_heads")),
        rms_norm_eps=get("rms_norm_eps", 1e-6),
        rope_theta=get("rope_theta", 1e6),
        max_position_embeddings=get("max_position_embeddings", 40960),
        tie_word_embeddings=get("tie_word_embeddings", True),
    )


def from_state_dict(state: Dict[str, Any], cfg: Qwen3Config,
                    dtype: Optional[str] = None) -> Dict[str, Any]:
    """Convert an HF Qwen3ForCausalLM state dict to the stacked pytree.

    torch Linear stores [out, in]; our matmuls are x @ W so weights are
    transposed on import. Per-layer tensors are stacked on a leading L axis
    for ``lax.scan``.
    """
    dt = jnp.dtype(dtype or cfg.dtype)
    L = cfg.num_hidden_layers

    def get(name):
        key = name if name in state else f"model.{name}"
        if key not in state:
            raise KeyError(f"missing weight: {name}")
        return _to_np(state[key])

    def stackT(fmt):
        return jnp.asarray(
            np.stack([get(fmt.format(i)).T for i in range(L)]), dt)

    def stack(fmt):
        return jnp.asarray(
            np.stack([get(fmt.format(i)) for i in range(L)]), dt)

    attn = {
        "q": stackT("layers.{}.self_attn.q_proj.weight"),
        "k": stackT("layers.{}.self_attn.k_proj.weight"),
        "v": stackT("layers.{}.self_attn.v_proj.weight"),
        "o": stackT("layers.{}.self_attn.o_proj.weight"),
    }
    if cfg.qk_norm:
        attn["q_norm"] = stack("layers.{}.self_attn.q_norm.weight")
        attn["k_norm"] = stack("layers.{}.self_attn.k_norm.weight")
    if cfg.attention_bias:
        attn["q_bias"] = stack("layers.{}.self_attn.q_proj.bias")
        attn["k_bias"] = stack("layers.{}.self_attn.k_proj.bias")
        attn["v_bias"] = stack("layers.{}.self_attn.v_proj.bias")
    params = {
        "embed": {"weight": jnp.asarray(get("embed_tokens.weight"), dt)},
        "layers": {
            "input_ln": {"scale": stack("layers.{}.input_layernorm.weight")},
            "attn": attn,
            "post_ln": {"scale": stack("layers.{}.post_attention_layernorm.weight")},
            "mlp": {
                "gate": stackT("layers.{}.mlp.gate_proj.weight"),
                "up": stackT("layers.{}.mlp.up_proj.weight"),
                "down": stackT("layers.{}.mlp.down_proj.weight"),
            },
        },
        "final_ln": {"scale": jnp.asarray(get("norm.weight"), dt)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": jnp.asarray(get("lm_head.weight"), dt)}
    return params


def to_state_dict(params: Dict[str, Any], cfg: Qwen3Config) -> Dict[str, np.ndarray]:
    """Export the pytree back to HF Qwen3 state-dict naming (numpy fp32)."""
    out: Dict[str, np.ndarray] = {}
    # C-contiguous is load-bearing: safetensors serializes the raw buffer,
    # so a transposed view would round-trip as transposed data
    npf = lambda a: np.ascontiguousarray(np.asarray(a, np.float32))
    out["model.embed_tokens.weight"] = npf(params["embed"]["weight"])
    lyr = params["layers"]
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        out[f"{p}.input_layernorm.weight"] = npf(lyr["input_ln"]["scale"][i])
        out[f"{p}.self_attn.q_proj.weight"] = npf(lyr["attn"]["q"][i]).T
        out[f"{p}.self_attn.k_proj.weight"] = npf(lyr["attn"]["k"][i]).T
        out[f"{p}.self_attn.v_proj.weight"] = npf(lyr["attn"]["v"][i]).T
        out[f"{p}.self_attn.o_proj.weight"] = npf(lyr["attn"]["o"][i]).T
        if "q_norm" in lyr["attn"]:
            out[f"{p}.self_attn.q_norm.weight"] = npf(lyr["attn"]["q_norm"][i])
            out[f"{p}.self_attn.k_norm.weight"] = npf(lyr["attn"]["k_norm"][i])
        if "q_bias" in lyr["attn"]:
            out[f"{p}.self_attn.q_proj.bias"] = npf(lyr["attn"]["q_bias"][i])
            out[f"{p}.self_attn.k_proj.bias"] = npf(lyr["attn"]["k_bias"][i])
            out[f"{p}.self_attn.v_proj.bias"] = npf(lyr["attn"]["v_bias"][i])
        out[f"{p}.post_attention_layernorm.weight"] = npf(lyr["post_ln"]["scale"][i])
        out[f"{p}.mlp.gate_proj.weight"] = npf(lyr["mlp"]["gate"][i]).T
        out[f"{p}.mlp.up_proj.weight"] = npf(lyr["mlp"]["up"][i]).T
        out[f"{p}.mlp.down_proj.weight"] = npf(lyr["mlp"]["down"][i]).T
    out["model.norm.weight"] = npf(params["final_ln"]["scale"])
    if "lm_head" in params:
        out["lm_head.weight"] = npf(params["lm_head"]["weight"])
    return out


def load_pretrained(path: str, dtype: Optional[str] = None):
    """Load (config, params) from an HF model directory (safetensors)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf(json.load(f))
    state: Dict[str, Any] = {}
    try:
        from safetensors import safe_open
        files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
        for fn in files:
            with safe_open(os.path.join(path, fn), framework="np") as sf:
                for k in sf.keys():
                    state[k] = sf.get_tensor(k)
    except ImportError:
        import torch
        files = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
        for fn in files:
            state.update(torch.load(os.path.join(path, fn),
                                    map_location="cpu", weights_only=True))
    if not state:
        raise FileNotFoundError(f"no weights found under {path}")
    return cfg, from_state_dict(state, cfg, dtype)
