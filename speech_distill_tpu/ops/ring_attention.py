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
        m, l, acc = _merge(m, l, acc,
                           *_attend_block(qf, kc, vc, q_pos, k_pos),
                           to_tq=to_tq)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (m, l, acc, kc, vc), None

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


# ---------------------------------------------------------------------------
# Zig-zag ring attention: balanced causal work + ~2x attention-FLOP saving
# ---------------------------------------------------------------------------


def zigzag_order(T: int, sp: int):
    """Permutation (length T) mapping zig-zag slot -> global position.

    The sequence splits into 2*sp chunks of C = T/(2*sp); rank r owns the
    chunk PAIR (r, 2*sp-1-r). Contiguous sharding gives the last rank sp
    times the causally-live key blocks of the first (the ring's per-step
    ppermute barrier makes everyone wait for it); pairing an early chunk
    with its mirror-image late chunk gives every rank the same live-block
    count per ring step, AND lets each step compute only its live
    (C x C) blocks — ~(2*sp+1)/(4*sp) of the contiguous ring's FLOPs."""
    import numpy as np
    C = T // (2 * sp)
    idx = np.arange(T, dtype=np.int32).reshape(2 * sp, C)
    return np.concatenate(
        [np.concatenate([idx[r], idx[2 * sp - 1 - r]]) for r in range(sp)])


def zigzag_inverse(T: int, sp: int):
    """Inverse permutation: global position -> zig-zag slot."""
    import numpy as np
    inv = np.empty(T, np.int32)
    inv[zigzag_order(T, sp)] = np.arange(T, dtype=np.int32)
    return inv


def _merge(m, l, acc, m_b, l_b, o_b, to_tq):
    new_m = jnp.maximum(m, m_b)
    c_old = jnp.exp(m - new_m)
    c_new = jnp.exp(m_b - new_m)
    return (new_m, l * c_old + l_b * c_new,
            acc * to_tq(c_old) + o_b * to_tq(c_new))


def _zigzag_body(q, k, v, axis_name: str):
    """shard_map body over zig-zag-permuted shards: rank r's local
    [B, 2C, ...] holds global chunks (r, 2*sp-1-r).

    Per ring step s >= 1 only TWO (C x C) blocks are live per rank —
    (q_late x k_early) always, plus (q_early x k_early) when the received
    chunks are causally earlier (src < r) or (q_late x k_late) when later
    (src > r) — vs the contiguous ring's one (2C x 2C) block: half the
    attention FLOPs, identically on every rank (balanced). Step 0 (own
    KV) computes the two in-chunk diagonals + the always-live cross
    block. Dead work never exists, so no masking beyond the in-chunk
    causal diagonal."""
    sp = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    B, T2, H, Dh = q.shape
    C = T2 // 2
    KV = k.shape[2]
    G = H // KV
    qf = q.reshape(B, T2, KV, G, Dh)
    qa, qb = qf[:, :C], qf[:, C:]
    loc = jnp.arange(C)
    pos_a = (i * C + loc)[:, None]                  # early chunk (i)
    pos_b = ((2 * sp - 1 - i) * C + loc)[:, None]   # late chunk
    perm = [(j, (j + 1) % sp) for j in range(sp)]

    def to_tq(x):
        return jnp.moveaxis(x, (1, 2, 3), (2, 3, 1))

    mrg = partial(_merge, to_tq=to_tq)
    vary = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    m0 = vary(jnp.full((B, KV, G, C, 1), _BIG_NEG, jnp.float32))
    l0 = vary(jnp.zeros((B, KV, G, C, 1), jnp.float32))
    a0 = vary(jnp.zeros((B, C, KV, G, Dh), jnp.float32))

    # step 0: own KV — two causal diagonals + the always-live cross block
    ka, va_, kb, vb_ = k[:, :C], v[:, :C], k[:, C:], v[:, C:]
    kpa, kpb = pos_a[:, 0][None, :], pos_b[:, 0][None, :]
    A = mrg(m0, l0, a0, *_attend_block(qa, ka, va_, pos_a, kpa))
    Bh = mrg(m0, l0, a0, *_attend_block(qb, kb, vb_, pos_b, kpb))
    Bh = mrg(*Bh, *_attend_block(qb, ka, va_, pos_b, kpa))

    kc = jax.lax.ppermute(k, axis_name, perm)
    vc = jax.lax.ppermute(v, axis_name, perm)

    def step(carry, s):
        (ma, la, aa), (mb, lb, ab), kc, vc = carry
        src = (i - s) % sp
        ka, va_ = kc[:, :C], vc[:, :C]
        kb, vb_ = kc[:, C:], vc[:, C:]
        kpa = (src * C + loc)[None, :]
        kpb = ((2 * sp - 1 - src) * C + loc)[None, :]
        # q_late x k_early: live at every step (late chunks follow all
        # early chunks)
        mb, lb, ab = mrg(mb, lb, ab,
                         *_attend_block(qb, ka, va_, pos_b, kpa))
        # the selected second block (both are FULL — no diagonal off-ring)
        pred = src < i
        m2, l2, o2 = _attend_block(
            jnp.where(pred, qa, qb), jnp.where(pred, ka, kb),
            jnp.where(pred, va_, vb_), jnp.where(pred, pos_a, pos_b),
            jnp.where(pred, kpa, kpb))
        # route into the matching half; the other half merges a neutral
        # block (m=-inf, l=0, o=0 — an exact no-op in the flash merge)
        neu = jnp.full_like(m2, _BIG_NEG)
        zl, zo = jnp.zeros_like(l2), jnp.zeros_like(o2)
        ma, la, aa = mrg(ma, la, aa, jnp.where(pred, m2, neu),
                         jnp.where(pred, l2, zl), jnp.where(pred, o2, zo))
        mb, lb, ab = mrg(mb, lb, ab, jnp.where(pred, neu, m2),
                         jnp.where(pred, zl, l2), jnp.where(pred, zo, o2))
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return ((ma, la, aa), (mb, lb, ab), kc, vc), None

    (A, Bh, _, _), _ = jax.lax.scan(step, (A, Bh, kc, vc),
                                    jnp.arange(1, sp))
    out_a = A[2] / to_tq(A[1])
    out_b = Bh[2] / to_tq(Bh[1])
    out = jnp.concatenate([out_a, out_b], axis=1)
    return out.reshape(B, T2, H, Dh).astype(q.dtype)


def zigzag_ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          mesh: Mesh, axis_name: str = "sp") -> jax.Array:
    """Causal GQA attention over ZIG-ZAG-PERMUTED sequences sharded on
    ``axis_name``: token at array slot j is global position
    ``zigzag_order(T, sp)[j]``. Same contract as :func:`ring_attention`
    otherwise. The caller (models/qwen3.forward) permutes embeddings and
    rope positions once at the bottom of the stack and inverts once at the
    top — every other transformer op is position-local."""
    sp = mesh.shape[axis_name]
    T = q.shape[1]
    if T % (2 * sp) != 0:
        raise ValueError(f"seq len {T} not divisible by 2*sp={2 * sp}")
    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(partial(_zigzag_body, axis_name=axis_name),
                       mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, axis_names={axis_name})
    return fn(q, k, v)


def zigzag_available(mesh: Optional[Mesh], seq_len: int,
                     axis_name: str = "sp") -> bool:
    """True when the active mesh has a multi-device sp axis and the
    sequence splits into 2*sp chunks."""
    return (mesh is not None and axis_name in mesh.shape
            and mesh.shape[axis_name] > 1
            and seq_len % (2 * mesh.shape[axis_name]) == 0)
