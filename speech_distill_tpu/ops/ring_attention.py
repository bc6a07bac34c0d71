"""Ring attention: exact causal attention with the sequence dim sharded
over the mesh's ``sp`` axis.

The reference has no context-parallel story at all (single GPU,
flash-attention over the full sequence — reference train.py:160,177); this
is the TPU-native way to scale *sequence length* past one chip's HBM:

  * activations ride GSPMD with seq sharded over ``sp`` — every elementwise
    op, norm and matmul in the transformer is position-local, so XLA needs
    no collectives for them;
  * attention is the one op that mixes positions.  Here it runs inside a
    partial-manual ``jax.shard_map`` (only ``sp`` is manual; ``dp``/``tp``
    stay on GSPMD auto), rotating K/V shards around the sp ring with
    ``lax.ppermute`` and merging per-block partial softmaxes with the
    streaming (flash) recurrence.  Collectives ride ICI neighbor links —
    the canonical ring-attention schedule.

Exactness: bit-for-bit the same math as full causal softmax attention up to
fp reassociation of the streaming merge (same property as flash attention).
Causality is computed from *global* positions (device index × chunk); fully
masked blocks contribute exp(-BIG − m) = 0.  Right-padded batches are exact
for the same reason as the Pallas flash kernel: padded keys sit beyond every
valid query's causal window and padded query rows are masked downstream.

Autodiff: the ring is a ``lax.scan`` of einsums + ``ppermute`` — JAX
transposes it to a reverse ring for the backward automatically.  The
per-block attend is wrapped in ``jax.checkpoint`` so the backward
recomputes block logits from the (already-saved) K/V carries instead of
storing [Tc, T] probability matrices per layer — the flash memory property,
O(T/sp) residuals per device.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_BIG_NEG = -1e30


@partial(jax.checkpoint, static_argnums=())
def _attend_block(qf, kc, vc, q_pos, k_pos):
    """One (q-chunk × kv-chunk) block: returns per-row (m, l, o) partials.

    qf [B, Tc, KV, G, Dh]; kc/vc [B, Tc, KV, Dh]; q_pos [Tc, 1] and
    k_pos [1, Tc] are *global* token positions for causal masking.
    Logits accumulate fp32 on the MXU (operand dtype preserved).
    """
    scale = qf.shape[-1] ** -0.5
    logits = jnp.einsum("btkgd,bskd->bkgts", qf, kc,
                        preferred_element_type=jnp.float32) * scale
    keep = k_pos <= q_pos                                    # [Tc, Tc]
    logits = jnp.where(keep[None, None, None], logits, _BIG_NEG)
    m = logits.max(axis=-1, keepdims=True)                   # [B,KV,G,Tc,1]
    p = jnp.exp(logits - m)
    l = p.sum(axis=-1, keepdims=True)
    o = jnp.einsum("bkgts,bskd->btkgd", p.astype(vc.dtype), vc,
                   preferred_element_type=jnp.float32)       # [B,Tc,KV,G,Dh]
    return m, l, o


def _ring_body(q, k, v, axis_name: str):
    """shard_map body: local shards q [B, Tc, H, Dh], k/v [B, Tc, KV, Dh]
    where Tc = T / sp. Head dims may remain auto-sharded over tp."""
    sp = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    B, Tc, H, Dh = q.shape
    KV = k.shape[2]
    G = H // KV
    qf = q.reshape(B, Tc, KV, G, Dh)
    loc = jnp.arange(Tc)
    q_pos = (i * Tc + loc)[:, None]                          # [Tc, 1]
    perm = [(j, (j + 1) % sp) for j in range(sp)]

    def to_tq(x):
        # [B, KV, G, Tc, 1] -> [B, Tc, KV, G, 1] to scale the accumulator
        return jnp.moveaxis(x, (1, 2, 3), (2, 3, 1))

    def step(carry, s):
        m, l, acc, kc, vc = carry
        src = (i - s) % sp                                   # kv chunk owner
        k_pos = (src * Tc + loc)[None, :]                    # [1, Tc]
        m_b, l_b, o_b = _attend_block(qf, kc, vc, q_pos, k_pos)
        new_m = jnp.maximum(m, m_b)
        c_old = jnp.exp(m - new_m)
        c_new = jnp.exp(m_b - new_m)
        l = l * c_old + l_b * c_new
        acc = acc * to_tq(c_old) + o_b * to_tq(c_new)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (new_m, l, acc, kc, vc), None

    vary = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    m0 = vary(jnp.full((B, KV, G, Tc, 1), _BIG_NEG, jnp.float32))
    l0 = vary(jnp.zeros((B, KV, G, Tc, 1), jnp.float32))
    a0 = vary(jnp.zeros((B, Tc, KV, G, Dh), jnp.float32))
    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m0, l0, a0, k, v), jnp.arange(sp))
    out = acc / to_tq(l)
    return out.reshape(B, Tc, H, Dh).astype(q.dtype)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh,
                   axis_name: str = "sp") -> jax.Array:
    """Causal GQA attention with seq sharded over ``axis_name``.

    q [B, T, H, Dh], k/v [B, T, KV, Dh] — *global* shapes; T must divide by
    the sp mesh size. Returns [B, T, H, Dh] in q.dtype. Only ``sp`` is
    manual inside; dp (batch) and tp (heads) stay on GSPMD auto, so this
    drops into a jitted GSPMD program unchanged.
    """
    sp = mesh.shape[axis_name]
    T = q.shape[1]
    if T % sp != 0:
        raise ValueError(f"seq len {T} not divisible by sp={sp}")
    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(partial(_ring_body, axis_name=axis_name),
                       mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, axis_names={axis_name})
    return fn(q, k, v)


def ring_available(mesh: Optional[Mesh], seq_len: int,
                   axis_name: str = "sp") -> bool:
    """True when a mesh with a multi-device sp axis is active and the
    sequence divides over it — the condition under which the model's
    training forward routes attention through the ring instead of building
    a [B, 1, T, T] bias (models/qwen3.py forward)."""
    return (mesh is not None and axis_name in mesh.shape
            and mesh.shape[axis_name] > 1 and seq_len % mesh.shape[axis_name] == 0)
