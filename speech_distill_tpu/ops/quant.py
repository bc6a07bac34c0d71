"""Weight-only quantization for the frozen teacher.

TPU-native replacement for bitsandbytes int8/nf4 teacher loading
(reference train.py:139-153). Weights are stored in HBM as int8 (or packed
int4) with per-output-channel fp32 scales and dequantized *inside the
per-layer scan body* — so only one layer's bf16 weights are ever live,
halving (or quartering) teacher HBM footprint. The reference's rule that a
quantized teacher forces dense distillation is enforced in DistillConfig
(core/config.py).

A quantized leaf is the dict {"q8": int8[..., D], "scale": f32[..., 1]} or
{"q4": uint8[..., D/2] packed nibbles, "scale": f32[..., 1]}; the model's
weight accessor (models/qwen3.deq) transparently dequantizes.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _reduce_axes(ndim: int):
    """Reduce over contraction dims: keep the last (output-channel) axis and
    — for stacked [L, ...] weights — the leading layer-scan axis."""
    return tuple(range(ndim - 1)) if ndim == 2 else tuple(range(1, ndim - 1))


def quantize_array_int8(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8 (last dim = output channel)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=_reduce_axes(wf.ndim), keepdims=True)
    scale = absmax / 127.0
    q = jnp.round(wf / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
    return {"q8": q, "scale": scale.astype(jnp.float32)}


def quantize_array_int4(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int4, two codes packed per uint8 along
    the second-to-last axis (the contraction dim; must be even). The leading
    (layer-scan) axis is untouched so stacked weights still scan."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=_reduce_axes(wf.ndim), keepdims=True)
    scale = absmax / 7.0
    q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -7, 7)
    q = (q + 8).astype(jnp.uint8)            # [1, 15]
    assert q.shape[-2] % 2 == 0, "int4 packing needs even contraction dim"
    hi = q[..., 0::2, :]
    lo = q[..., 1::2, :]
    packed = (hi << 4) | lo
    return {"q4": packed, "scale": scale.astype(jnp.float32)}


def dequantize_array(p: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    if "q8" in p:
        return (p["q8"].astype(jnp.float32) * p["scale"]).astype(dtype)
    if "q4" in p:
        packed = p["q4"]
        hi = (packed >> 4).astype(jnp.int32) - 8
        lo = (packed & 0xF).astype(jnp.int32) - 8
        K = packed.shape[-2]
        q = jnp.stack([hi, lo], axis=-2)                 # [..., K, 2, D]
        q = q.reshape(packed.shape[:-2] + (2 * K, packed.shape[-1]))
        return (q.astype(jnp.float32) * p["scale"]).astype(dtype)
    raise ValueError("not a quantized leaf")


def is_quantized_leaf(x) -> bool:
    return isinstance(x, dict) and ("q8" in x or "q4" in x)


_QUANT_TARGETS = {("attn", "q"), ("attn", "k"), ("attn", "v"), ("attn", "o"),
                  ("mlp", "gate"), ("mlp", "up"), ("mlp", "down")}


def quantize_params(params: Params, bits: int = 8,
                    quantize_embed: bool = True) -> Params:
    """Quantize a Qwen3 param pytree's matmul weights (+embed/lm_head)."""
    fn = quantize_array_int8 if bits == 8 else quantize_array_int4
    out = {k: v for k, v in params.items()}
    layers = {g: dict(v) for g, v in params["layers"].items()}
    for group, key in _QUANT_TARGETS:
        if group in layers and key in layers[group]:
            layers[group][key] = fn(layers[group][key])
    out["layers"] = layers
    if quantize_embed and bits == 8:
        out["embed"] = {"weight": quantize_array_int8(
            params["embed"]["weight"])}
        if "lm_head" in params:
            out["lm_head"] = {"weight": quantize_array_int8(
                params["lm_head"]["weight"])}
    return out


def param_bytes(params: Params) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
