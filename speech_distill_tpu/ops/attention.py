"""Attention kernels.

The reference gets fused attention from flash-attention-2 CUDA kernels
(reference train.py:160,177; stage1.py:113). TPU equivalents here:

  * ``sdpa_xla`` — einsum SDPA with fp32 softmax; XLA fuses this well and it
    is the correctness reference, used on CPU meshes and for decode.
  * ``flash_attention`` — blockwise Pallas causal flash attention (fwd +
    custom VJP), used for long-sequence training on real TPU.

``sdpa`` dispatches: explicit impl, else pallas on TPU when shapes allow.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_PALLAS_MIN_SEQ = 512          # below this XLA SDPA is as fast and simpler
_PALLAS_BLOCK = 256


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def sdpa_xla(q: jax.Array, k: jax.Array, v: jax.Array,
             mask_bias: Optional[jax.Array]) -> jax.Array:
    """Grouped-query SDPA.

    q: [B, T, H, Dh], k/v: [B, S, KV, Dh], mask_bias: [B, 1, T, S] fp32
    additive (0 keep / -inf drop). Returns [B, T, H, Dh] in q.dtype.
    """
    B, T, H, Dh = q.shape
    S, KV = k.shape[1], k.shape[2]
    G = H // KV
    qf = q.reshape(B, T, KV, G, Dh)
    scale = Dh ** -0.5
    # [B, KV, G, T, S]
    logits = jnp.einsum("btkgd,bskd->bkgts", qf, k,
                        preferred_element_type=jnp.float32) * scale
    if mask_bias is not None:
        logits = logits + mask_bias[:, :, None, :, :]
    # rows that are fully masked (e.g. padding queries) produce uniform
    # attention after the max-subtraction; that is fine — their outputs are
    # masked out downstream.
    logits = jnp.where(jnp.isneginf(logits), jnp.float32(-1e30), logits)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgts,bskd->btkgd", probs.astype(v.dtype), v)
    return out.reshape(B, T, H, Dh)


def sdpa(q, k, v, mask_bias, impl: str = "auto"):
    """impl='pallas' uses the causal flash kernel — exact for causal
    self-attention over right-padded batches (padded keys are beyond every
    valid query's causal window; padded query rows are masked downstream).

    impl='ring' routes training-shape causal attention (T == S, no
    materialized bias — the caller signals ring eligibility by passing
    mask_bias=None, see models/qwen3.forward) through the sequence-parallel
    ring kernel over the active mesh's sp axis; decode shapes and
    ring-ineligible calls fall back to XLA SDPA."""
    if impl == "ring":
        if mask_bias is None and q.shape[1] == k.shape[1]:
            from speech_distill_tpu.ops.ring_attention import ring_attention
            from speech_distill_tpu.parallel.mesh import get_active_mesh
            return ring_attention(q, k, v, get_active_mesh())
        return sdpa_xla(q, k, v, mask_bias)
    if impl == "ring_zigzag":
        # sequences arrive zig-zag-permuted (models/qwen3.forward permutes
        # embeds + rope positions when zigzag is eligible and signals by
        # passing mask_bias=None); when only the contiguous ring is
        # eligible (T divides by sp but not 2*sp) the data is un-permuted
        # and routes to ring_attention — the same predicate forward used.
        # Ineligible calls carry a bias: plain SDPA.
        if mask_bias is None and q.shape[1] == k.shape[1]:
            from speech_distill_tpu.ops.ring_attention import (
                ring_attention, zigzag_available, zigzag_ring_attention)
            from speech_distill_tpu.parallel.mesh import get_active_mesh
            mesh = get_active_mesh()
            if zigzag_available(mesh, q.shape[1]):
                return zigzag_ring_attention(q, k, v, mesh)
            return ring_attention(q, k, v, mesh)
        return sdpa_xla(q, k, v, mask_bias)
    if impl == "xla":
        return sdpa_xla(q, k, v, mask_bias)
    if impl == "pallas" or (impl == "auto" and _on_tpu()
                            and q.shape[1] >= _PALLAS_MIN_SEQ
                            and q.shape[1] == k.shape[1]
                            and q.shape[1] % _PALLAS_BLOCK == 0):
        try:
            from speech_distill_tpu.ops.flash_attention import flash_attention
            return flash_attention(q, k, v, _PALLAS_BLOCK,
                                   not _on_tpu())
        except Exception:
            if impl == "pallas":
                raise
    return sdpa_xla(q, k, v, mask_bias)
