"""Qwen3 decoder, TPU-first functional JAX.

One parameterized implementation covers both the SoulX-Podcast-1.7B teacher
and the Qwen3-0.6B student (reference loads them via HF AutoModelForCausalLM,
train.py:155-178). Architecture parity targets HF ``Qwen3ForCausalLM``:
GQA + per-head q/k RMSNorm + NeoX RoPE + SwiGLU, RMS norms in fp32.

TPU-first choices (not in the reference):
  * layers stacked on a leading axis and driven by ``lax.scan`` — one compile
    of one layer instead of 28 unrolled bodies
  * ``jax.checkpoint`` per layer for rematerialisation
  * params kept in bf16, norms/softmax accumulate in fp32
  * static-shape KV cache pytree for decode (``lax.dynamic_update_slice``)
  * sharding specs as data (see :func:`param_pspecs`): dp over batch,
    tp over heads / mlp hidden / vocab
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from speech_distill_tpu.core.config import Qwen3Config
from speech_distill_tpu.ops.attention import sdpa

Params = Dict[str, Any]


def _dtype(cfg: Qwen3Config):
    return jnp.dtype(cfg.dtype)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def param_shapes(cfg: Qwen3Config) -> Params:
    """Pytree of (shape, is_norm) descriptors for the parameter structure."""
    L, D, F = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    QD, KVD, Dh = cfg.q_dim, cfg.kv_dim, cfg.head_dim
    V = cfg.vocab_size
    attn = {
        "q": ((L, D, QD), "w"),
        "k": ((L, D, KVD), "w"),
        "v": ((L, D, KVD), "w"),
        "o": ((L, QD, D), "w"),
    }
    if cfg.qk_norm:
        attn["q_norm"] = ((L, Dh), "one")
        attn["k_norm"] = ((L, Dh), "one")
    if cfg.attention_bias:
        attn["q_bias"] = ((L, QD), "zero")
        attn["k_bias"] = ((L, KVD), "zero")
        attn["v_bias"] = ((L, KVD), "zero")
    shapes: Params = {
        "embed": {"weight": ((V, D), "w")},
        "layers": {
            "input_ln": {"scale": ((L, D), "one")},
            "attn": attn,
            "post_ln": {"scale": ((L, D), "one")},
            "mlp": {
                "gate": ((L, D, F), "w"),
                "up": ((L, D, F), "w"),
                "down": ((L, F, D), "w"),
            },
        },
        "final_ln": {"scale": ((D,), "one")},
    }
    if not cfg.tie_word_embeddings:
        shapes["lm_head"] = {"weight": ((V, D), "w")}
    return shapes


def _is_shape_leaf(x):
    return (isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], tuple)
            and isinstance(x[1], str))


def init_params(rng: jax.Array, cfg: Qwen3Config) -> Params:
    """Random init (normal, std=0.02 like HF initializer_range).

    Host-side numpy (seeded from the key) + one device transfer per leaf —
    avoids compiling a PRNG program per weight shape, which matters on
    high-compile-latency targets."""
    dt = _dtype(cfg)
    import numpy as np
    seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) & 0x7FFFFFFF
    host_rng = np.random.default_rng(seed)

    def make(leaf):
        shape, kind = leaf
        if kind == "one":
            return jnp.ones(shape, dt)
        if kind == "zero":
            return jnp.zeros(shape, dt)
        return jnp.asarray(
            host_rng.normal(0.0, 0.02, shape).astype(np.float32), dt)

    return jax.tree.map(make, param_shapes(cfg), is_leaf=_is_shape_leaf)


def init_params_on_device(seed: int, cfg: Qwen3Config) -> Params:
    """Random init computed on-device in ONE jitted program.

    For benchmarks/smoke tests on high-latency transports (the axon relay
    moves host arrays at a few MB/s): a 1.7B bf16 teacher takes minutes to
    device_put but seconds to synthesize on-chip.
    """
    dt = _dtype(cfg)
    shapes = param_shapes(cfg)
    leaves, treedef = jax.tree.flatten(shapes, is_leaf=_is_shape_leaf)

    @jax.jit
    def make(seed):
        key = jax.random.PRNGKey(seed)
        out = []
        for i, (shape, kind) in enumerate(leaves):
            if kind == "one":
                out.append(jnp.ones(shape, dt))
            elif kind == "zero":
                out.append(jnp.zeros(shape, dt))
            else:
                k = jax.random.fold_in(key, i)
                out.append((jax.random.normal(k, shape, jnp.float32) * 0.02
                            ).astype(dt))
        return jax.tree.unflatten(treedef, out)

    return make(seed)


def param_pspecs(cfg: Qwen3Config, pp: bool = False) -> Params:
    """PartitionSpecs matching :func:`init_params` structure.

    tp shards: vocab dim of embed/lm_head, head dim of q/k/v, mlp hidden.
    Layer-stacked leaves get a leading None for the scan axis — or 'pp'
    when the mesh pipelines the layer stack (parallel/pipeline.py).
    """
    lead = "pp" if pp else None
    attn: Params = {
        "q": P(lead, None, "tp"),
        "k": P(lead, None, "tp"),
        "v": P(lead, None, "tp"),
        "o": P(lead, "tp", None),
    }
    if cfg.qk_norm:
        attn["q_norm"] = P(lead, None)
        attn["k_norm"] = P(lead, None)
    if cfg.attention_bias:
        attn["q_bias"] = P(lead, "tp")
        attn["k_bias"] = P(lead, "tp")
        attn["v_bias"] = P(lead, "tp")
    specs: Params = {
        "embed": {"weight": P("tp", None)},
        "layers": {
            "input_ln": {"scale": P(lead, None)},
            "attn": attn,
            "post_ln": {"scale": P(lead, None)},
            "mlp": {
                "gate": P(lead, None, "tp"),
                "up": P(lead, None, "tp"),
                "down": P(lead, "tp", None),
            },
        },
        "final_ln": {"scale": P(None)},
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = {"weight": P("tp", None)}
    return specs


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def deq(w, dtype=jnp.bfloat16):
    """Weight accessor: pass through arrays, dequantize int8/int4 leaves
    (ops/quant.py) — called inside the layer scan body so only one layer's
    bf16 weights are live at a time."""
    if isinstance(w, dict):
        from speech_distill_tpu.ops.quant import dequantize_array
        return dequantize_array(w, dtype)
    return w


def _proj(x: jax.Array, w, la: Optional[Params], key: str,
          scale: float) -> jax.Array:
    """Projection with optional LoRA (training-time equivalent of PEFT's
    adapter forward, reference train.py:180-202), via the fused
    merged-forward / skinny-backward custom VJP (ops/lora_linear.py):
    one big matmul forward, no dense [din, dout] weight gradient backward.
    """
    if la is not None and key in la:
        from speech_distill_tpu.ops.lora_linear import lora_linear
        ab = la[key]
        return lora_linear(x, deq(w, x.dtype), ab["a"], ab["b"],
                           float(scale))
    if isinstance(w, dict) and "q4" in w and w["q4"].ndim == 2 \
            and jax.default_backend() == "tpu":
        # fused in-register nibble unpack: streams the packed weight at
        # 0.5 byte/param instead of materializing bf16 (ops/quant_matmul)
        from speech_distill_tpu.ops.quant_matmul import quantized_matmul
        return quantized_matmul(x, w)
    return x @ deq(w, x.dtype)


# Trace-time perf-ablation switches (scripts/fwd_anatomy.py only): lets a
# measurement script price individual VPU passes without forking the model.
ABLATE: set = set()


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    if "bf16_norm" in ABLATE:
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + eps) * scale.astype(x.dtype)
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def rope_angles(positions: jax.Array, head_dim: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables [..., T, head_dim] in NeoX half-rotation layout."""
    half = head_dim // 2
    freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    ang = positions.astype(jnp.float32)[..., None] * freq  # [..., T, half]
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def _norm_rope(x: jax.Array, scale: jax.Array, cos: jax.Array,
               sin: jax.Array, eps: float) -> jax.Array:
    """rms_norm + rope in ONE fp32 region (one upcast, one downcast)
    instead of two round trips — measurement candidate for the per-layer
    VPU passes (ABLATE='fused_qkrope'); numerics identical to
    rms_norm-then-apply_rope (same fp32 math, associativity aside)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rf = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * c + rf * s).astype(x.dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, T, N, Dh]; cos/sin: [B, T, Dh] or [T, Dh]."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    xf = x.astype(jnp.float32)
    rf = rotated.astype(jnp.float32)
    return (xf * cos + rf * sin).astype(x.dtype)


class KVCache(NamedTuple):
    """Static-shape decode cache: [L, B, S_max, KV, Dh] + current length."""

    k: jax.Array
    v: jax.Array
    length: jax.Array  # scalar int32: tokens already written

    @classmethod
    def create(cls, cfg: Qwen3Config, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, max_len,
                 cfg.num_key_value_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((), jnp.int32))


def qkv_proj(lp: Params, x: jax.Array, cos, sin, cfg: Qwen3Config,
             la: Optional[Params] = None, lora_scale: float = 1.0):
    """Project + qk-norm + rope: x [B, T, D] -> q [B, T, H, Dh],
    k/v [B, T, KV, Dh]. Shared by the contiguous-cache path and the paged
    decode path (infer/paged.py)."""
    B, T, _ = x.shape
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = _proj(x, lp["q"], la, "q", lora_scale)
    k = _proj(x, lp["k"], la, "k", lora_scale)
    v = _proj(x, lp["v"], la, "v", lora_scale)
    if cfg.attention_bias:
        q = q + lp["q_bias"]
        k = k + lp["k_bias"]
        v = v + lp["v_bias"]
    q = q.reshape(B, T, H, Dh)
    k = k.reshape(B, T, KV, Dh)
    v = v.reshape(B, T, KV, Dh)

    if "fused_qkrope" in ABLATE and cfg.qk_norm:
        q = _norm_rope(q, lp["q_norm"], cos, sin, cfg.rms_norm_eps)
        k = _norm_rope(k, lp["k_norm"], cos, sin, cfg.rms_norm_eps)
    else:
        if cfg.qk_norm and "no_qknorm" not in ABLATE:
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        if "no_rope" not in ABLATE:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
    return q, k, v


def mlp_block(lp: Params, y: jax.Array, la: Optional[Params] = None,
              lora_scale: float = 1.0) -> jax.Array:
    """Gated MLP on the already-normed input (shared with infer/paged.py)."""
    g = jax.nn.silu(_proj(y, lp["gate"], la, "gate", lora_scale)
                    .astype(jnp.float32)).astype(y.dtype)
    return _proj(g * _proj(y, lp["up"], la, "up", lora_scale),
                 lp["down"], la, "down", lora_scale)


def _attention_block(lp: Params, x: jax.Array, cos, sin, mask_bias,
                     cfg: Qwen3Config,
                     la: Optional[Params] = None, lora_scale: float = 1.0):
    """One attention sub-block (training/prefill; decode lives in
    :func:`_decode_layers`, which threads the KV cache as a scan carry).
    Returns (out, (k, v))."""
    B, T, _ = x.shape
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    q, k, v = qkv_proj(lp, x, cos, sin, cfg, la, lora_scale)
    out = sdpa(q, k, v, mask_bias, impl=cfg.attn_impl)  # [B, T, H, Dh]
    out = _proj(out.reshape(B, T, H * Dh), lp["o"], la, "o", lora_scale)
    return out, (k, v)


def _layer(lp: Params, x: jax.Array, cos, sin, mask_bias, cfg: Qwen3Config,
           la: Optional[Params] = None, lora_scale: float = 1.0):
    la_attn = la.get("attn") if la is not None else None
    la_mlp = la.get("mlp") if la is not None else None
    h, new_kv = _attention_block(
        lp["attn"], rms_norm(x, lp["input_ln"]["scale"], cfg.rms_norm_eps),
        cos, sin, mask_bias, cfg, la_attn, lora_scale)
    x = x + h
    y = rms_norm(x, lp["post_ln"]["scale"], cfg.rms_norm_eps)
    y = mlp_block(lp["mlp"], y, la_mlp, lora_scale)
    return x + y, new_kv


def _decode_layers(params: Params, x: jax.Array, cos, sin, mask_bias,
                   cfg: Qwen3Config, cache: "KVCache", write,
                   num_layers: Optional[int] = None):
    """Decode layer stack with the KV cache as a scan CARRY.

    The cache must never flow through scan xs/ys: that dynamic-slices and
    restacks the full [L, B, S, KV, Dh] buffers every layer — a read+write
    of the whole cache per decode step (multi-GB at serving batch sizes).
    As a carry, ``write`` scatters only the fresh columns in place and the
    per-layer window read fuses into the attention dots.

    ``write(ck, li, k)`` installs fresh k [B, T, KV, Dh] for layer ``li``.
    Returns (hidden, new_k, new_v).

    ``num_layers`` (static): run only the FIRST K layers — the layer-skip
    self-speculation draft (infer/speculative.py). Layers < K compute
    exactly what the full model computes (same weights, same inputs), so
    the fresh KV written for them is bit-identical to a full forward's;
    the cache stays shared between draft and verify passes. Layers >= K
    keep their previous cache contents.
    """
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    B, T, _ = x.shape

    def body(carry, xs):
        h, ck, cv = carry
        lp, li = xs
        y = rms_norm(h, lp["input_ln"]["scale"], cfg.rms_norm_eps)
        q, k, v = qkv_proj(lp["attn"], y, cos, sin, cfg)
        ck = write(ck, li, k)
        cv = write(cv, li, v)
        # read back in the compute dtype so cache_dtype (fp32/bf16) never
        # promotes the hidden-state scan carry
        ckl = jax.lax.dynamic_index_in_dim(
            ck, li, 0, keepdims=False).astype(q.dtype)
        cvl = jax.lax.dynamic_index_in_dim(
            cv, li, 0, keepdims=False).astype(q.dtype)
        o = sdpa(q, ckl, cvl, mask_bias, impl=cfg.attn_impl)
        h = h + _proj(o.reshape(B, T, H * Dh), lp["attn"]["o"],
                      None, "o", 1.0)
        y2 = rms_norm(h, lp["post_ln"]["scale"], cfg.rms_norm_eps)
        return (h + mlp_block(lp["mlp"], y2), ck, cv), None

    n_layers = cache.k.shape[0]
    if num_layers is not None and num_layers < n_layers:
        K = num_layers
        layers = jax.tree.map(lambda a: a[:K], params["layers"])
        (x, nk_s, nv_s), _ = jax.lax.scan(
            body, (x, cache.k[:K], cache.v[:K]),
            (layers, jnp.arange(K, dtype=jnp.int32)))
        # static-prefix update: XLA aliases this in place inside decode
        # loops (the sliced read above is consumed before the write)
        return x, cache.k.at[:K].set(nk_s), cache.v.at[:K].set(nv_s)
    (x, nk, nv), _ = jax.lax.scan(
        body, (x, cache.k, cache.v),
        (params["layers"], jnp.arange(n_layers, dtype=jnp.int32)))
    return x, nk, nv


def _restructure_layer(stacked: Params, i: Optional[int] = None) -> Params:
    """Select layer i (or identity when already sliced by scan)."""
    if i is None:
        return stacked
    return jax.tree.map(lambda a: a[i], stacked)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def embed_tokens(params: Params, input_ids: jax.Array,
                 cfg: Qwen3Config) -> jax.Array:
    """Token embedding lookup (int8-quantized table aware)."""
    table = params["embed"]["weight"]
    if isinstance(table, dict):
        # gather int8 rows first, dequantize only the gathered rows
        # (scale is per-column [1, D] and broadcasts)
        rows = jnp.take(table["q8"], input_ids, axis=0)
        return rows.astype(jnp.dtype(cfg.dtype)) \
            * table["scale"][0].astype(jnp.dtype(cfg.dtype))
    return jnp.take(table, input_ids, axis=0)


def _causal_bias(attention_mask: Optional[jax.Array], B: int, T: int) -> jax.Array:
    """[B, 1, T, T] additive fp32 bias: 0 keep, -inf drop."""
    q_pos = jnp.arange(T)[:, None]
    k_pos = jnp.arange(T)[None, :]
    causal = k_pos <= q_pos                          # [T, T]
    keep = jnp.broadcast_to(causal, (B, 1, T, T))
    if attention_mask is not None:
        pad = attention_mask.astype(bool)[:, None, None, :]  # [B,1,1,T]
        keep = jnp.logical_and(keep, pad)
    return jnp.where(keep, 0.0, -jnp.inf).astype(jnp.float32)


def forward(params: Params, input_ids: jax.Array, cfg: Qwen3Config, *,
            attention_mask: Optional[jax.Array] = None,
            positions: Optional[jax.Array] = None,
            cache: Optional[KVCache] = None,
            cache_positions: Optional[jax.Array] = None,
            inputs_embeds: Optional[jax.Array] = None,
            return_hidden: bool = False,
            adapters: Optional[Params] = None,
            adapter_scale: float = 1.0,
            num_layers: Optional[int] = None):
    """Run the decoder.

    Training/prefill: ``cache=None`` — full causal attention over [B, T].
    Decode: pass a :class:`KVCache`; ``input_ids`` is the fresh chunk
    (usually T=1) appended at ``cache.length`` — or, with
    ``cache_positions`` [B] (int32), at a per-row cache column (the
    continuous-batching slot engine: streams join/leave mid-flight with
    different lengths, so cache write offsets differ per row; requires
    T == 1).

    ``adapters``: optional unmerged-LoRA pytree shaped like
    ``lora_params["layers"]`` ({group: {key: {"a": [L,din,r],
    "b": [L,r,out]}}}); applied as ``x@W + adapter_scale*(x@A)@B`` per
    target (see :func:`_proj`). Training-only (``cache=None``).

    ``num_layers`` (static, decode-only): early-exit after the first K
    layers + final norm + lm head — the LayerSkip-style self-speculation
    draft (infer/speculative.py). Cache layers < K receive the exact
    values a full forward would write; layers >= K are untouched.

    Returns logits [B, T, V] (in cfg.logits_dtype), or hidden states if
    ``return_hidden`` (for fused lm-head losses), plus the new cache when one
    was given.
    """
    if inputs_embeds is not None:
        x = inputs_embeds
        B, T = x.shape[:2]
    else:
        B, T = input_ids.shape
        x = embed_tokens(params, input_ids, cfg)

    if cache is None:
        if num_layers is not None:
            raise NotImplementedError(
                "num_layers (layer-skip draft) is a decode-path feature")
        if positions is None:
            positions = jnp.arange(T)[None, :].repeat(B, axis=0)
        use_ring = False
        zz_inv = None
        if cfg.attn_impl == "ring":
            # ring attention computes causality from global positions
            # inside its shard_map; skip materializing the [B,1,T,T] bias
            # (exact for right-padded batches, like the flash kernel).
            from speech_distill_tpu.ops.ring_attention import ring_available
            from speech_distill_tpu.parallel.mesh import get_active_mesh
            use_ring = ring_available(get_active_mesh(), T)
        elif cfg.attn_impl == "ring_zigzag":
            # zig-zag ring: permute embeddings + rope positions into the
            # chunk-pair layout once here (every other transformer op is
            # position-local), run the stack in permuted order, invert
            # after the layer stack. Balances causal work across sp ranks
            # and halves attention FLOPs (ops/ring_attention.py).
            # When T divides by sp but not 2*sp, degrade to the contiguous
            # ring (ops/attention.sdpa mirrors this predicate) rather than
            # silently materializing the full [B,1,T,T] bias.
            from speech_distill_tpu.ops.ring_attention import (
                ring_available, zigzag_available, zigzag_order)
            from speech_distill_tpu.parallel.mesh import get_active_mesh
            m = get_active_mesh()
            if zigzag_available(m, T):
                import numpy as np
                use_ring = True
                sp_n = int(dict(m.shape)["sp"])
                order = zigzag_order(T, sp_n)
                inv = np.empty_like(order)
                inv[order] = np.arange(T, dtype=order.dtype)
                order = jnp.asarray(order)
                x = x[:, order]
                positions = positions[:, order]
                zz_inv = jnp.asarray(inv)
            elif ring_available(m, T):
                use_ring = True
        cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_theta)
        mask_bias = None if use_ring else _causal_bias(attention_mask, B, T)

        pp_mesh = None
        if cfg.pp_microbatches > 0:
            from speech_distill_tpu.parallel.mesh import get_active_mesh
            from speech_distill_tpu.parallel.pipeline import mesh_pp
            m = get_active_mesh()
            if mesh_pp(m) > 1:
                if not cfg.scan_layers:
                    raise ValueError(
                        "pp_microbatches requires scan_layers=True")
                if use_ring:
                    raise ValueError(
                        "ring attention (sp) and pipeline (pp) cannot nest;"
                        " use one of them")
                pp_mesh = m

        def plain_layer_fn(lp, h, la):
            return _layer(lp, h, cos, sin, mask_bias, cfg,
                          la=la, lora_scale=adapter_scale)
        layer_fn = plain_layer_fn
        if cfg.remat:
            # 'dots' keeps every MXU (dot_general) output resident and only
            # recomputes elementwise ops in the backward; 'everything' saves
            # all residuals (no recompute at all — a no-remat equivalent
            # that keeps the checkpoint HLO structure, which the axon
            # remote compiler accepts where plain remat=False crashes it);
            # 'half' full-remats the first half of the layer stack and saves
            # everything for the second — half the recompute at half the
            # residual memory of 'everything'
            policy = {"dots": jax.checkpoint_policies.checkpoint_dots,
                      "everything": jax.checkpoint_policies.everything_saveable
                      }.get(cfg.remat_policy)
            layer_fn = jax.checkpoint(plain_layer_fn, policy=policy)

        if pp_mesh is not None:
            # GPipe microbatch pipeline over the pp mesh axis; the layer
            # body takes per-microbatch rope/mask slices as arguments
            from speech_distill_tpu.parallel.pipeline import pipelined_layers

            def pl_fn(lp, h, la, c, s_, m_):
                return _layer(lp, h, c, s_, m_, cfg,
                              la=la, lora_scale=adapter_scale)[0]
            if cfg.remat:
                policy = {"dots": jax.checkpoint_policies.checkpoint_dots,
                          "everything":
                              jax.checkpoint_policies.everything_saveable
                          }.get(cfg.remat_policy)
                pl_fn = jax.checkpoint(pl_fn, policy=policy)
            x = pipelined_layers(pl_fn, params["layers"], adapters, x,
                                 cos, sin, mask_bias, pp_mesh,
                                 cfg.pp_microbatches)
        elif cfg.scan_layers:
            def body_of(fn):
                def body(carry, xs):
                    lp, la = xs
                    h, _ = fn(lp, carry, la)
                    return h, None
                return body
            if cfg.remat and cfg.remat_policy == "half":
                Lh = cfg.num_hidden_layers // 2
                save_fn = jax.checkpoint(
                    plain_layer_fn,
                    policy=jax.checkpoint_policies.everything_saveable)
                lo_xs = jax.tree.map(lambda a: a[:Lh],
                                     (params["layers"], adapters))
                hi_xs = jax.tree.map(lambda a: a[Lh:],
                                     (params["layers"], adapters))
                x, _ = jax.lax.scan(body_of(layer_fn), x, lo_xs)
                x, _ = jax.lax.scan(body_of(save_fn), x, hi_xs)
            else:
                x, _ = jax.lax.scan(body_of(layer_fn), x,
                                    (params["layers"], adapters))
        else:
            layer_fns = [layer_fn] * cfg.num_hidden_layers
            if cfg.remat and cfg.remat_policy == "half":
                # full-remat the first half, save everything for the second —
                # mirror of the scan_layers branch above
                save_fn = jax.checkpoint(
                    plain_layer_fn,
                    policy=jax.checkpoint_policies.everything_saveable)
                Lh = cfg.num_hidden_layers // 2
                layer_fns = [layer_fn] * Lh \
                    + [save_fn] * (cfg.num_hidden_layers - Lh)
            for i in range(cfg.num_hidden_layers):
                la_i = None if adapters is None else \
                    jax.tree.map(lambda a: a[i], adapters)
                x, _ = layer_fns[i](_restructure_layer(params["layers"], i),
                                    x, la_i)
        if zz_inv is not None:
            x = x[:, zz_inv]              # back to global token order
        new_cache = None
    else:
        if adapters is not None:
            raise NotImplementedError(
                "unmerged adapters are a training-path feature; "
                "merge_and_export the LoRA for decode")
        S = cache.k.shape[2]
        start = cache.length
        if cache_positions is not None:
            # per-row write columns (continuous batching); T must be 1
            assert T == 1, "cache_positions requires single-token decode"
            if positions is None:
                positions = cache_positions[:, None]
            cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_theta)
            k_pos = jnp.arange(S)[None, None, :]            # [1, 1, S]
            q_pos = cache_positions[:, None, None]          # [B, 1, 1]
            keep = jnp.broadcast_to((k_pos <= q_pos)[:, None], (B, 1, T, S))
            if attention_mask is not None:
                keep = jnp.logical_and(
                    keep, attention_mask.astype(bool)[:, None, None, :])
            mask_bias = jnp.where(keep, 0.0, -jnp.inf).astype(jnp.float32)

            rows = jnp.arange(B)

            def write(ck, li, k):
                # scatter the single fresh column per row at
                # (layer, row, col) — in place on the scan carry
                return ck.at[li, rows, cache_positions].set(
                    k[:, 0].astype(ck.dtype))

            x, nk, nv = _decode_layers(params, x, cos, sin, mask_bias,
                                       cfg, cache, write,
                                       num_layers=num_layers)
            new_cache = KVCache(nk, nv, cache.length + T)
            x = rms_norm(x, params["final_ln"]["scale"], cfg.rms_norm_eps)
            if return_hidden:
                return x, new_cache
            return unembed(params, x, cfg), new_cache
        if positions is None:
            positions = start + jnp.arange(T)[None, :].repeat(B, axis=0)
        cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_theta)
        # keys live at absolute positions [0, S); queries at start+t
        k_pos = jnp.arange(S)[None, :]                      # [1, S]
        q_pos = (start + jnp.arange(T))[:, None]            # [T, 1]
        keep = jnp.broadcast_to((k_pos <= q_pos)[None, None], (B, 1, T, S))
        if attention_mask is not None:
            # attention_mask covers the full cache window [B, S]
            keep = jnp.logical_and(keep, attention_mask.astype(bool)[:, None, None, :])
        mask_bias = jnp.where(keep, 0.0, -jnp.inf).astype(jnp.float32)

        def write(ck, li, k):
            return jax.lax.dynamic_update_slice(
                ck, k[None].astype(ck.dtype), (li, 0, start, 0, 0))

        x, nk, nv = _decode_layers(params, x, cos, sin, mask_bias, cfg,
                                   cache, write, num_layers=num_layers)
        new_cache = KVCache(nk, nv, cache.length + T)

    x = rms_norm(x, params["final_ln"]["scale"], cfg.rms_norm_eps)
    if return_hidden:
        return (x, new_cache) if cache is not None else x

    logits = unembed(params, x, cfg)
    return (logits, new_cache) if cache is not None else logits


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _unembed_mm(hidden, w, out_dt, bwd_dt):
    return jax.lax.dot_general(
        hidden, w, (((hidden.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=out_dt).astype(out_dt)


def _unembed_fwd(hidden, w, out_dt, bwd_dt):
    return _unembed_mm(hidden, w, out_dt, bwd_dt), (hidden, w)


def _unembed_bwd(out_dt, bwd_dt, res, g):
    # The loss math runs in fp32, so the incoming cotangent d_logits is a
    # [B, T, 159k] fp32 tensor; fed to autodiff's dot_general transpose it
    # forces both head backward matmuls to multi-pass fp32 MXU rate (~40ms
    # each at bs8/seq512 on v5e). Casting it to the weight dtype first is
    # the standard mixed-precision recipe (every bf16 torch/XLA trainer
    # backpropagates bf16 cotangents); accumulation stays fp32 via
    # preferred_element_type.
    hidden, w = res
    gb = g.astype(bwd_dt)
    dh = jax.lax.dot_general(
        gb, w.astype(bwd_dt), (((g.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(hidden.dtype)
    g2 = gb.reshape(-1, g.shape[-1])
    h2 = hidden.reshape(-1, hidden.shape[-1]).astype(bwd_dt)
    dw = jax.lax.dot_general(
        g2, h2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)
    return dh, dw


_unembed_mm.defvjp(_unembed_fwd, _unembed_bwd)


def unembed(params: Params, hidden: jax.Array, cfg: Qwen3Config) -> jax.Array:
    """lm-head matmul: operands stay in model dtype (bf16 MXU rate), output
    accumulated/returned in logits_dtype (fp32 for stable softmax). The
    backward casts the fp32 d_logits cotangent to ``cfg.head_bwd_dtype``
    before the two transpose matmuls (see ``_unembed_bwd``)."""
    w = lm_head_weight(params)
    out_dt = jnp.dtype(cfg.logits_dtype)
    bwd_dt = jnp.dtype(cfg.head_bwd_dtype)
    if bwd_dt == jnp.float32:
        return jax.lax.dot_general(
            hidden, w, (((hidden.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=out_dt).astype(out_dt)
    return _unembed_mm(hidden, w, out_dt, bwd_dt)


def lm_head_weight(params: Params) -> jax.Array:
    """[V, D] unembedding matrix (tied or separate; dequantized if int8)."""
    w = params["lm_head"]["weight"] if "lm_head" in params \
        else params["embed"]["weight"]
    return deq(w)


def num_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def flops_per_token(cfg: Qwen3Config, seq_len: int) -> float:
    """Approximate fwd FLOPs/token (2*N matmul + attention term)."""
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    QD, KVD = cfg.q_dim, cfg.kv_dim
    per_layer = 2 * (D * QD + 2 * D * KVD + QD * D + 3 * D * F)
    attn = 2 * 2 * QD * seq_len  # qk + av, causal ~ seq/2 * 2
    lm = 2 * D * cfg.vocab_size
    return L * (per_layer + attn) + lm
