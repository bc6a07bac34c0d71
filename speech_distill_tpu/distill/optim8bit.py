"""8-bit AdamW: blockwise-quantized optimizer moments in optax.

TPU-native replacement for bitsandbytes ``adamw_8bit``
(reference stage1.py:316) — optax has no 8-bit-state optimizer, so this
implements one: first/second moments are stored as int8 (uint8 for the
nonnegative second moment) with per-256-block fp32 scales, cutting
optimizer HBM by ~4x vs fp32 moments. Moments are dequantized, updated in
fp32, and requantized inside the (jitted) update — the extra elementwise
work is negligible next to the matmuls.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

BLOCK = 256


def _pad_len(n: int) -> int:
    return (n + BLOCK - 1) // BLOCK * BLOCK


def _quantize_signed(x: jax.Array):
    """fp32 [N] -> (int8 [N], scales [N/BLOCK]) blockwise symmetric."""
    n = x.size
    xp = jnp.pad(x.reshape(-1), (0, _pad_len(n) - n)).reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(xp), axis=1, keepdims=True) / 127.0
    q = jnp.round(xp / jnp.maximum(scale, 1e-20)).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequantize_signed(q: jax.Array, scale: jax.Array, shape, dtype=jnp.float32):
    x = q.astype(jnp.float32) * scale
    return x.reshape(-1)[: int(np.prod(shape))].reshape(shape).astype(dtype)


def _quantize_unsigned(x: jax.Array):
    """nonnegative fp32 [N] -> (uint8, scales) blockwise."""
    n = x.size
    xp = jnp.pad(x.reshape(-1), (0, _pad_len(n) - n)).reshape(-1, BLOCK)
    scale = jnp.max(xp, axis=1, keepdims=True) / 255.0
    q = jnp.round(xp / jnp.maximum(scale, 1e-20)).astype(jnp.uint8)
    return q, scale.astype(jnp.float32)


def _dequantize_unsigned(q, scale, shape):
    x = q.astype(jnp.float32) * scale
    return x.reshape(-1)[: int(np.prod(shape))].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jax.Array
    mu_q: any
    mu_scale: any
    nu_q: any
    nu_scale: any


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    def init_fn(params):
        def q0_signed(p):
            q, s = _quantize_signed(jnp.zeros(p.size, jnp.float32))
            return q, s
        mu_q, mu_s, nu_q, nu_s = [], [], [], []
        flat, treedef = jax.tree.flatten(params)
        for p in flat:
            qm, sm = _quantize_signed(jnp.zeros(p.size, jnp.float32))
            qv, sv = _quantize_unsigned(jnp.zeros(p.size, jnp.float32))
            mu_q.append(qm)
            mu_s.append(sm)
            nu_q.append(qv)
            nu_s.append(sv)
        unf = lambda leaves: jax.tree.unflatten(treedef, leaves)
        return Adam8bitState(jnp.zeros((), jnp.int32), unf(mu_q), unf(mu_s),
                             unf(nu_q), unf(nu_s))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        g_flat, treedef = jax.tree.flatten(updates)
        mu_q = jax.tree.leaves(state.mu_q)
        mu_s = jax.tree.leaves(state.mu_scale)
        nu_q = jax.tree.leaves(state.nu_q)
        nu_s = jax.tree.leaves(state.nu_scale)

        outs, nmq, nms, nnq, nns = [], [], [], [], []
        for g, qm, sm, qv, sv in zip(g_flat, mu_q, mu_s, nu_q, nu_s):
            gf = g.astype(jnp.float32)
            m = _dequantize_signed(qm, sm, g.shape)
            v = _dequantize_unsigned(qv, sv, g.shape)
            m = b1 * m + (1 - b1) * gf
            v = b2 * v + (1 - b2) * jnp.square(gf)
            upd = (m / c1) / (jnp.sqrt(v / c2) + eps)
            outs.append(upd.astype(g.dtype))
            qm2, sm2 = _quantize_signed(m)
            qv2, sv2 = _quantize_unsigned(v)
            nmq.append(qm2)
            nms.append(sm2)
            nnq.append(qv2)
            nns.append(sv2)

        unf = lambda leaves: jax.tree.unflatten(treedef, leaves)
        new_state = Adam8bitState(count, unf(nmq), unf(nms), unf(nnq),
                                  unf(nns))
        return unf(outs), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_8bit(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
               weight_decay=0.0, max_grad_norm: float = 1.0):
    """Drop-in for train_step.make_optimizer with 8-bit moment state."""
    txs = [optax.clip_by_global_norm(max_grad_norm),
           scale_by_adam_8bit(b1, b2, eps)]
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)
