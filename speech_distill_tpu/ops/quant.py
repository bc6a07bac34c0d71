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
    (layer-scan) axis is untouched so stacked weights still scan.

    Split-halves layout: packed row r holds contraction row r in the HIGH
    nibble and row K/2 + r in the LOW nibble — so unpacking is two
    contiguous half-matrices (two dots over split x), with NO row
    interleave. This is what lets the fused dequant-matmul kernel
    (ops/quant_matmul.py) unpack in-register."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=_reduce_axes(wf.ndim), keepdims=True)
    scale = absmax / 7.0
    q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -7, 7)
    q = (q + 8).astype(jnp.uint8)            # [1, 15]
    assert q.shape[-2] % 2 == 0, "int4 packing needs even contraction dim"
    half = q.shape[-2] // 2
    hi = q[..., :half, :]
    lo = q[..., half:, :]
    packed = (hi << 4) | lo
    return {"q4": packed, "scale": scale.astype(jnp.float32)}


# QLoRA nf4 codebook: the 16 published normal-float constants (quantiles of
# N(0,1) normalized to [-1, 1]; Dettmers et al. 2023, bitsandbytes
# functional.py). Reference uses bnb_4bit_quant_type="nf4" with
# double_quant=True (train.py:144-153).
NF4_CODE = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0)

_NF4_BLOCK = 64          # bnb default 4-bit blocksize
_ABSMAX_BLOCK = 256      # bnb default double-quant blocksize


def quantize_array_nf4(w: jax.Array, double_quant: bool = True
                       ) -> Dict[str, jax.Array]:
    """Blockwise nf4: 64-element blocks over the row-major-flattened matrix
    (bnb's layout), per-block absmax, nearest normal-float codebook entry. With
    ``double_quant`` the fp32 absmax array is itself quantized to int8 in
    256-element blocks around its mean (bnb's nested quantization) — absmax
    overhead drops from 0.5 to ~0.127 bits/param.

    Leading axes (e.g. the [L, ...] layer-scan axis) are preserved on every
    leaf so stacked weights still slice correctly inside ``lax.scan``.
    """
    wf = w.astype(jnp.float32)
    K, D = wf.shape[-2], wf.shape[-1]
    lead = wf.shape[:-2]
    # blocks run over the row-major-flattened matrix, exactly like bnb's
    # flatten-then-block layout (a block may span rows when D < 64)
    assert (K * D) % _NF4_BLOCK == 0 and D % 2 == 0, (K, D)
    nb = K * D // _NF4_BLOCK
    blocks = wf.reshape(lead + (nb, _NF4_BLOCK))
    absmax = jnp.max(jnp.abs(blocks), axis=-1)                 # [..., nb]
    normed = blocks / jnp.maximum(absmax[..., None], 1e-12)
    code = jnp.asarray(NF4_CODE, jnp.float32)
    mid = (code[1:] + code[:-1]) / 2.0
    q = jnp.searchsorted(mid, normed).astype(jnp.uint8)
    q = q.reshape(lead + (K, D))
    packed = (q[..., 0::2] << 4) | q[..., 1::2]                # [..., K, D/2]
    out = {"nf4": packed}
    if not double_quant:
        out["absmax"] = absmax
        return out
    # nested quantization of absmax: int8 blocks of 256 around the mean
    n = absmax.shape[-1]
    nb2 = -(-n // _ABSMAX_BLOCK)
    pad = nb2 * _ABSMAX_BLOCK - n
    offset = jnp.mean(absmax, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    padded = jnp.pad(absmax, [(0, 0)] * len(lead) + [(0, pad)])
    r = padded.reshape(lead + (nb2, _ABSMAX_BLOCK)) - offset
    s2 = jnp.max(jnp.abs(r), axis=-1, keepdims=True) / 127.0   # [..., nb2, 1]
    q2 = jnp.round(r / jnp.maximum(s2, 1e-12)).astype(jnp.int8)
    out.update(absmax_q=q2, absmax_scale=s2.astype(jnp.float32),
               absmax_offset=offset.astype(jnp.float32))
    return out


def _dequantize_nf4(p: Dict[str, jax.Array], dtype) -> jax.Array:
    packed = p["nf4"]
    K, D = packed.shape[-2], 2 * packed.shape[-1]
    lead = packed.shape[:-2]
    nb = K * D // _NF4_BLOCK
    if "absmax" in p:
        absmax = p["absmax"]                                   # [..., nb]
    else:
        r = (p["absmax_q"].astype(jnp.float32) * p["absmax_scale"]
             + p["absmax_offset"])                             # [..., nb2, 256]
        absmax = r.reshape(lead + (-1,))[..., :nb]
    hi = (packed >> 4).astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.int32)
    q = jnp.stack([hi, lo], axis=-1).reshape(lead + (K, D))
    vals = jnp.take(jnp.asarray(NF4_CODE, jnp.float32), q)
    vals = vals.reshape(lead + (nb, _NF4_BLOCK)) * absmax[..., None]
    return vals.reshape(lead + (K, D)).astype(dtype)


def dequantize_array(p: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    if "q8" in p:
        return (p["q8"].astype(jnp.float32) * p["scale"]).astype(dtype)
    if "q4" in p:
        packed = p["q4"]
        hi = (packed >> 4).astype(jnp.int32) - 8
        lo = (packed & 0xF).astype(jnp.int32) - 8
        # split-halves layout: hi nibbles are rows [0, K/2), lo are the rest
        q = jnp.concatenate([hi, lo], axis=-2)
        return (q.astype(jnp.float32) * p["scale"]).astype(dtype)
    if "nf4" in p:
        return _dequantize_nf4(p, dtype)
    raise ValueError("not a quantized leaf")


def is_quantized_leaf(x) -> bool:
    return isinstance(x, dict) and ("q8" in x or "q4" in x or "nf4" in x)


_QUANT_TARGETS = {("attn", "q"), ("attn", "k"), ("attn", "v"), ("attn", "o"),
                  ("mlp", "gate"), ("mlp", "up"), ("mlp", "down")}


def quantize_params(params: Params, bits: int = 8,
                    quantize_embed: bool = True,
                    method: str = "auto") -> Params:
    """Quantize a Qwen3 param pytree's matmul weights (+embed/lm_head).

    method: 'int8' | 'int4' (packed symmetric grid) | 'nf4' (normal-float
    codebook + double-quant, the reference's bnb_4bit config) | 'auto'
    (int8 for bits=8, nf4 for bits=4 — matching train.py:139-153).
    """
    if method == "auto":
        method = "int8" if bits == 8 else "nf4"
    fn = {"int8": quantize_array_int8, "int4": quantize_array_int4,
          "nf4": quantize_array_nf4}[method]
    out = {k: v for k, v in params.items()}
    layers = {g: dict(v) for g, v in params["layers"].items()}
    for group, key in _QUANT_TARGETS:
        if group in layers and key in layers[group]:
            layers[group][key] = fn(layers[group][key])
    out["layers"] = layers
    if quantize_embed:
        # embed/lm_head always int8 (per-row gather + the unembed matmul
        # both want row-addressable codes; int8 convert fuses into the
        # XLA dot) — combine with int4/nf4 layer weights for the lowest
        # total decode traffic
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
