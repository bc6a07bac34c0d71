"""Fused LoRA projection: merged forward, skinny backward (custom VJP).

The two obvious formulations each waste time on TPU (measured, bs8/seq512
0.6B student):

  * merged   ``x @ (W + g*A@B)``    — 1 big matmul fwd, but autodiff
    materializes/computes a dense [din, dout] weight cotangent chain in bwd
  * unmerged ``x@W + g*(x@A)@B``    — cheap bwd, but 2 extra small matmuls
    per projection slow the fwd (and its remat recompute) by ~35%

This op takes the best of both: the forward merges the delta (the
[din, r] @ [r, dout] einsum is <1% of the main matmul's FLOPs) and runs ONE
big matmul; the hand-written backward never forms a dense weight gradient —
it reassociates

    dA = g * x^T (dy B^T)        ([N, r] temp, then [din, r])
    dB = g * (x A)^T dy          ([N, r] temp, then [r, dout])
    dx = dy W_eff^T

The base weight W is frozen (reference train.py:167-169); its cotangent is
returned as zeros and DCE'd by XLA since nothing differentiates it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _merge(w, a, b, scale, out_dtype):
    delta = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return w + (delta * scale).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lora_linear(x, w, a, b, scale: float):
    """x [..., din] @ (w [din, dout] + scale * a [din, r] @ b [r, dout])."""
    return x @ _merge(w, a, b, scale, x.dtype)


def _fwd(x, w, a, b, scale):
    return lora_linear(x, w, a, b, scale), (x, w, a, b)


def _bwd(scale, res, dy):
    x, w, a, b = res
    w_eff = _merge(w, a, b, scale, x.dtype)
    dx = jax.lax.dot_general(
        dy, w_eff, (((dy.ndim - 1,), (1,)), ((), ())))
    x2 = x.reshape(-1, x.shape[-1])
    dy2 = dy.reshape(-1, dy.shape[-1])
    # [N, r] temps; accumulate the small grads in fp32
    dyb = jax.lax.dot_general(
        dy2, b.astype(dy2.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da = jax.lax.dot_general(
        x2.astype(jnp.float32), dyb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    xa = jax.lax.dot_general(
        x2, a.astype(x2.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db = jax.lax.dot_general(
        xa, dy2.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    return (dx, jnp.zeros_like(w), da.astype(a.dtype), db.astype(b.dtype))


lora_linear.defvjp(_fwd, _bwd)
