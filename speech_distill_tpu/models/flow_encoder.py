"""Upsampling conformer encoder for the flow-matching mel decoder.

JAX port of reference ``UpsampleConformerEncoder``
(soulxpodcast/models/modules/flow_components/upsample_encoder.py:840-997):

  Linear embed + Espnet rel-pos encoding -> PreLookahead (3-frame) ->
  6 rel-pos transformer layers @512/8h -> nearest x2 upsample + causal conv
  -> fresh embed/pos -> 4 more layers -> final LayerNorm.

Layers are stacked and scanned; rel-shift attention follows Transformer-XL
(upsample_encoder.py:566-588). Non-streaming path is the default (the
reference invokes streaming=False, soulxpodcast.py:419-420); chunk masks
(upsample_encoder.py:9-40) are supported for streaming parity.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass
class FlowEncoderConfig:
    input_size: int = 512
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    static_chunk_size: int = 25
    pre_lookahead_len: int = 3
    up_stride: int = 2


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def rel_pos_encoding(size: int, d_model: int) -> np.ndarray:
    """Espnet rel-pos table [2*size-1, d] (positive reversed ++ negative[1:]),
    upsample_encoder.py:170-200."""
    position = np.arange(size, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, np.float32)
                 * -(np.log(10000.0) / d_model))
    pe_pos = np.zeros((size, d_model), np.float32)
    pe_neg = np.zeros((size, d_model), np.float32)
    pe_pos[:, 0::2] = np.sin(position * div)
    pe_pos[:, 1::2] = np.cos(position * div)
    pe_neg[:, 0::2] = np.sin(-position * div)
    pe_neg[:, 1::2] = np.cos(-position * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)


def _rel_shift(x: jax.Array) -> jax.Array:
    """[B, H, T, 2T-1] -> [B, H, T, T] (Transformer-XL shift,
    upsample_encoder.py:566-588)."""
    B, H, T, P = x.shape
    zero = jnp.zeros((B, H, T, 1), x.dtype)
    xp = jnp.concatenate([zero, x], axis=-1).reshape(B, H, P + 1, T)
    x = xp[:, :, 1:].reshape(B, H, T, P)
    return x[..., :P // 2 + 1]


def _rel_attention(lp: Params, x: jax.Array, pos_emb: jax.Array,
                   mask_bias: Optional[jax.Array], heads: int) -> jax.Array:
    """Rel-pos MHA (upsample_encoder.py:590-671). x [B,T,D], pos [2T-1,D]."""
    B, T, D = x.shape
    Dh = D // heads
    q = (x @ lp["q"]["w"] + lp["q"]["b"]).reshape(B, T, heads, Dh)
    k = (x @ lp["k"]["w"] + lp["k"].get("b", 0)).reshape(B, T, heads, Dh)
    v = (x @ lp["v"]["w"] + lp["v"]["b"]).reshape(B, T, heads, Dh)
    p = (pos_emb @ lp["pos"]["w"]).reshape(-1, heads, Dh)        # [2T-1,H,Dh]

    q_u = (q + lp["pos_bias_u"]).transpose(0, 2, 1, 3)           # [B,H,T,Dh]
    q_v = (q + lp["pos_bias_v"]).transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 3, 1)                                 # [B,H,Dh,T]
    matrix_ac = jnp.einsum("bhtd,bhds->bhts", q_u, kt,
                           preferred_element_type=jnp.float32)
    matrix_bd = jnp.einsum("bhtd,phd->bhtp", q_v, p,
                           preferred_element_type=jnp.float32)
    matrix_bd = _rel_shift(matrix_bd)                            # [B,H,T,T]
    scores = (matrix_ac + matrix_bd) / np.sqrt(Dh)
    if mask_bias is not None:
        scores = scores + mask_bias
    attn = jax.nn.softmax(scores, axis=-1)
    if mask_bias is not None:
        attn = jnp.where(mask_bias < -1e20, 0.0, attn)
    out = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
    return out.reshape(B, T, D) @ lp["out"]["w"] + lp["out"]["b"]


def _conformer_layer(lp: Params, x, pos_emb, mask_bias, heads):
    """Pre-norm MHA + pre-norm FF(SiLU), eps 1e-12 norms
    (upsample_encoder.py:711-837, no macaron/conv modules)."""
    h = _ln(x, lp["norm_mha"], eps=1e-12)
    x = x + _rel_attention(lp["attn"], h, pos_emb, mask_bias, heads)
    h = _ln(x, lp["norm_ff"], eps=1e-12)
    h = jax.nn.silu(h @ lp["ff"]["w1"] + lp["ff"]["b1"])
    return x + (h @ lp["ff"]["w2"] + lp["ff"]["b2"])


def _causal_conv1d(x, w, b, left_pad: int, right_pad: int = 0):
    """x [B, T, C]; w [K, Cin, Cout]."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((left_pad, right_pad),),
        dimension_numbers=("NTC", "TIO", "NTC"))
    return out + b


def pre_lookahead(lp: Params, x: jax.Array, la: int,
                  context: Optional[jax.Array] = None) -> jax.Array:
    """PreLookaheadLayer (upsample_encoder.py:329-365): pad `la` future
    frames (or use provided context), conv k=la+1, leaky_relu, causal conv
    k=3, residual."""
    if context is not None:
        inp = jnp.concatenate([x, context], axis=1)
        out = _causal_conv1d(inp, lp["conv1"]["w"], lp["conv1"]["b"], 0, 0)
    else:
        out = _causal_conv1d(x, lp["conv1"]["w"], lp["conv1"]["b"], 0, la)
    out = jax.nn.leaky_relu(out, negative_slope=0.01)
    out = _causal_conv1d(out, lp["conv2"]["w"], lp["conv2"]["b"], 2, 0)
    return out + x


def upsample1d(lp: Params, x: jax.Array, stride: int) -> jax.Array:
    """Nearest x2 repeat + left-pad 2*stride + conv k=2*stride+1
    (upsample_encoder.py:300-326). x [B, T, C] -> [B, T*stride, C]."""
    x = jnp.repeat(x, stride, axis=1)
    return _causal_conv1d(x, lp["conv"]["w"], lp["conv"]["b"], 2 * stride, 0)


def chunk_mask_bias(T: int, lengths: jax.Array, B: int,
                    chunk_size: int = 0) -> jax.Array:
    """[B, 1, T, T] additive bias from padding + optional chunk mask
    (upsample_encoder.py:9-118)."""
    valid = jnp.arange(T)[None, :] < lengths[:, None]           # [B, T]
    keep = valid[:, None, None, :]
    if chunk_size > 0:
        pos = jnp.arange(T)
        block = (pos // chunk_size + 1) * chunk_size
        chunk = pos[None, :] < block[:, None]                   # [T, T]
        keep = jnp.logical_and(keep, chunk[None, None])
    return jnp.where(keep, 0.0, -1e30).astype(jnp.float32)


def forward(params: Params, xs: jax.Array, xs_lens: jax.Array,
            cfg: FlowEncoderConfig, context: Optional[jax.Array] = None,
            streaming: bool = False) -> Tuple[jax.Array, jax.Array]:
    """xs [B, T, input_size] -> (encoded [B, T*2, output_size], out_lens)."""
    B, T, _ = xs.shape
    D = cfg.output_size
    scale = np.sqrt(D)

    x = _ln(xs @ params["embed"]["w"] + params["embed"]["b"],
            params["embed"]["ln"]) * scale
    pos = jnp.asarray(rel_pos_encoding(T, D))
    if context is not None:
        c = _ln(context @ params["embed"]["w"] + params["embed"]["b"],
                params["embed"]["ln"]) * scale
    else:
        c = None
    bias = chunk_mask_bias(T, xs_lens, B,
                           cfg.static_chunk_size if streaming else 0)

    x = pre_lookahead(params["pre_lookahead"], x, cfg.pre_lookahead_len, c)

    def layer(h, lp):
        return _conformer_layer(lp, h, pos, bias, cfg.attention_heads), None

    x, _ = jax.lax.scan(layer, x, params["encoders"])

    x = upsample1d(params["up_layer"], x, cfg.up_stride)
    up_lens = xs_lens * cfg.up_stride
    T2 = x.shape[1]
    x = _ln(x @ params["up_embed"]["w"] + params["up_embed"]["b"],
            params["up_embed"]["ln"]) * scale
    pos2 = jnp.asarray(rel_pos_encoding(T2, D))
    bias2 = chunk_mask_bias(
        T2, up_lens, B,
        cfg.static_chunk_size * cfg.up_stride if streaming else 0)

    def up_layer_fn(h, lp):
        return _conformer_layer(lp, h, pos2, bias2, cfg.attention_heads), None

    x, _ = jax.lax.scan(up_layer_fn, x, params["up_encoders"])
    x = _ln(x, params["after_norm"])
    return x, up_lens


# ---------------------------------------------------------------------------
# init / conversion
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: FlowEncoderConfig) -> Params:
    host = np.random.default_rng(0)
    D, F = cfg.output_size, cfg.linear_units

    def nrm(*shape):
        return jnp.asarray(host.normal(0, 0.02, shape), jnp.float32)

    def ln():
        return {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}

    def layers(n):
        def stack(f):
            return jnp.stack([f() for _ in range(n)])
        return {
            "norm_mha": {"scale": jnp.ones((n, D)), "bias": jnp.zeros((n, D))},
            "norm_ff": {"scale": jnp.ones((n, D)), "bias": jnp.zeros((n, D))},
            "attn": {
                "q": {"w": nrm(n, D, D), "b": jnp.zeros((n, D))},
                "k": {"w": nrm(n, D, D), "b": jnp.zeros((n, D))},
                "v": {"w": nrm(n, D, D), "b": jnp.zeros((n, D))},
                "out": {"w": nrm(n, D, D), "b": jnp.zeros((n, D))},
                "pos": {"w": nrm(n, D, D)},
                "pos_bias_u": nrm(n, cfg.attention_heads,
                                  D // cfg.attention_heads),
                "pos_bias_v": nrm(n, cfg.attention_heads,
                                  D // cfg.attention_heads),
            },
            "ff": {"w1": nrm(n, D, F), "b1": jnp.zeros((n, F)),
                   "w2": nrm(n, F, D), "b2": jnp.zeros((n, D))},
        }

    la = cfg.pre_lookahead_len
    return {
        "embed": {"w": nrm(cfg.input_size, D), "b": jnp.zeros((D,)), "ln": ln()},
        "pre_lookahead": {
            "conv1": {"w": nrm(la + 1, D, D), "b": jnp.zeros((D,))},
            "conv2": {"w": nrm(3, D, D), "b": jnp.zeros((D,))},
        },
        "encoders": layers(cfg.num_blocks),
        "up_layer": {"conv": {"w": nrm(2 * cfg.up_stride + 1, D, D),
                              "b": jnp.zeros((D,))}},
        "up_embed": {"w": nrm(cfg.input_size, D), "b": jnp.zeros((D,)),
                     "ln": ln()},
        "up_encoders": layers(cfg.num_up_blocks),
        "after_norm": ln(),
    }


def convert_torch_state(state: Dict[str, Any], cfg: FlowEncoderConfig,
                        prefix: str = "encoder.") -> Params:
    """Map reference flow.pt encoder weights into this pytree."""
    def np_(t):
        if isinstance(t, np.ndarray):
            return t.astype(np.float32)
        import torch
        return t.detach().to(torch.float32).cpu().numpy()

    def g(name):
        return np_(state[prefix + name])

    H = cfg.attention_heads
    Dh = cfg.output_size // H

    def layers(fmt, n):
        def stk(sub, transpose=True):
            return jnp.asarray(np.stack(
                [g(fmt.format(i) + sub).T if transpose
                 else g(fmt.format(i) + sub) for i in range(n)]))
        return {
            "norm_mha": {"scale": stk(".norm_mha.weight", False),
                         "bias": stk(".norm_mha.bias", False)},
            "norm_ff": {"scale": stk(".norm_ff.weight", False),
                        "bias": stk(".norm_ff.bias", False)},
            "attn": {
                "q": {"w": stk(".self_attn.linear_q.weight"),
                      "b": stk(".self_attn.linear_q.bias", False)},
                "k": {"w": stk(".self_attn.linear_k.weight"),
                      "b": stk(".self_attn.linear_k.bias", False)},
                "v": {"w": stk(".self_attn.linear_v.weight"),
                      "b": stk(".self_attn.linear_v.bias", False)},
                "out": {"w": stk(".self_attn.linear_out.weight"),
                        "b": stk(".self_attn.linear_out.bias", False)},
                "pos": {"w": stk(".self_attn.linear_pos.weight")},
                "pos_bias_u": stk(".self_attn.pos_bias_u", False),
                "pos_bias_v": stk(".self_attn.pos_bias_v", False),
            },
            "ff": {"w1": stk(".feed_forward.w_1.weight"),
                   "b1": stk(".feed_forward.w_1.bias", False),
                   "w2": stk(".feed_forward.w_2.weight"),
                   "b2": stk(".feed_forward.w_2.bias", False)},
        }

    def conv_tio(name):
        # torch conv1d [out, in, k] -> [k, in, out]
        return jnp.asarray(g(name).transpose(2, 1, 0))

    return {
        "embed": {"w": jnp.asarray(g("embed.out.0.weight").T),
                  "b": jnp.asarray(g("embed.out.0.bias")),
                  "ln": {"scale": jnp.asarray(g("embed.out.1.weight")),
                         "bias": jnp.asarray(g("embed.out.1.bias"))}},
        "pre_lookahead": {
            "conv1": {"w": conv_tio("pre_lookahead_layer.conv1.weight"),
                      "b": jnp.asarray(g("pre_lookahead_layer.conv1.bias"))},
            "conv2": {"w": conv_tio("pre_lookahead_layer.conv2.weight"),
                      "b": jnp.asarray(g("pre_lookahead_layer.conv2.bias"))},
        },
        "encoders": layers("encoders.{}", cfg.num_blocks),
        "up_layer": {"conv": {"w": conv_tio("up_layer.conv.weight"),
                              "b": jnp.asarray(g("up_layer.conv.bias"))}},
        "up_embed": {"w": jnp.asarray(g("up_embed.out.0.weight").T),
                     "b": jnp.asarray(g("up_embed.out.0.bias")),
                     "ln": {"scale": jnp.asarray(g("up_embed.out.1.weight")),
                            "bias": jnp.asarray(g("up_embed.out.1.bias"))}},
        "up_encoders": layers("up_encoders.{}", cfg.num_up_blocks),
        "after_norm": {"scale": jnp.asarray(g("after_norm.weight")),
                       "bias": jnp.asarray(g("after_norm.bias"))},
    }
