"""Pipeline parallelism: GPipe-style microbatch pipelining of the layer
stack over the mesh's ``pp`` axis.

The reference has no pipeline story (``device_map="auto"`` is sequential
offload, SURVEY §2.5). This is the TPU-native version: the layer-stacked
parameter pytree ([L, ...] leaves, models/qwen3.param_shapes) shards its
leading axis over ``pp`` — each stage holds L/pp layers — and a
``shard_map`` (manual only over ``pp``; dp/sp/tp stay GSPMD-auto) runs the
classic collective pipeline schedule: the batch splits into M microbatches,
and for ``M + S - 1`` ticks every stage applies its local layers to the
microbatch flowing through it, then shifts activations to the next stage
with ``lax.ppermute`` over the pp ring (neighbor ICI hops).

Warm-up/drain ticks compute on zero-filled activations whose results are
never written to the output (the usual (S-1)/(M+S-1) GPipe bubble);
``jnp.where`` masking keeps autodiff exact — gradients only flow through
ticks that produced real outputs, and the backward pipeline (transposed
ppermute ring) is derived automatically by JAX.

Exactness: bit-for-bit the layer stack applied microbatch-by-microbatch;
equals the unpipelined forward up to the usual batched-vs-split matmul
reassociation (tests/test_pipeline_parallel.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def mesh_pp(mesh: Optional[Mesh], axis_name: str = "pp") -> int:
    return int(mesh.shape.get(axis_name, 1)) if mesh is not None else 1


def _pipeline_body(layers, adapters, x, cos, sin, mask_bias, *,
                   layer_fn: Callable, n_micro: int, axis_name: str):
    """shard_map body. ``layers``/``adapters`` hold the local [L/S, ...]
    stage slice; everything else is replicated over pp (dp/sp/tp sharding
    of those arrays stays on GSPMD auto)."""
    S = jax.lax.axis_size(axis_name)
    stage = jax.lax.axis_index(axis_name)
    B, T, D = x.shape
    M = n_micro
    mb = B // M

    def split(a):
        # [B, ...] -> [M, mb, ...]; None (no adapters / no mask) passes through
        return None if a is None else a.reshape((M, mb) + a.shape[1:])

    vary = lambda a: jax.lax.pcast(a, (axis_name,), to="varying")

    def vary_diff(a):
        """Raise a differentiated replicated input to varying. The reverse
        pass sums its cotangent over pp with ``psum_invariant``, whose
        copy-rooted reducer region crashes XLA CPU's AllReducePromotion on
        sub-f32 dtypes ("Invalid binary instruction opcode copy") — route
        the conversion through f32 there; TPU keeps the native dtype."""
        if jax.default_backend() == "cpu" and \
                a.dtype in (jnp.bfloat16, jnp.float16):
            return vary(a.astype(jnp.float32)).astype(a.dtype)
        return vary(a)

    xm = vary_diff(split(x))
    # rope tables may be positionless [T, Dh] (shared by every row)
    cos_m = split(cos) if cos.ndim == 3 else None
    sin_m = split(sin) if sin.ndim == 3 else None
    mask_m = jax.tree.map(split, mask_bias)

    def pick(stack, idx):
        return None if stack is None else \
            jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(
                a, idx, 0, keepdims=False), stack)

    def stage_apply(h, idx):
        c = cos if cos_m is None else pick(cos_m, idx)
        s_ = sin if sin_m is None else pick(sin_m, idx)
        m_ = pick(mask_m, idx)

        def body(carry, xs):
            lp, la = xs
            return layer_fn(lp, carry, la, c, s_, m_), None

        h, _ = jax.lax.scan(body, h, (layers, adapters))
        return h

    perm = [(j, (j + 1) % S) for j in range(S)]

    def tick(carry, t):
        state, outputs = carry
        m_in = jnp.clip(t, 0, M - 1)
        state = jnp.where(stage == 0, pick(xm, m_in), state)
        # the microbatch currently at this stage (clipped during bubble)
        m_here = jnp.clip(t - stage, 0, M - 1)
        h = stage_apply(state, m_here)
        m_out = t - (S - 1)
        idx = jnp.clip(m_out, 0, M - 1)
        write = jnp.logical_and(stage == S - 1, m_out >= 0)
        cur = jax.lax.dynamic_index_in_dim(outputs, idx, 0, keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(write, h, cur), idx, 0)
        state = jax.lax.ppermute(h, axis_name, perm)
        return (state, outputs), None

    state0 = vary(jnp.zeros((mb, T, D), x.dtype))
    out0 = vary(jnp.zeros((M, mb, T, D), x.dtype))
    (_, outputs), _ = jax.lax.scan(
        tick, (state0, out0), jnp.arange(M + S - 1))
    # outputs are only real on the last stage; broadcast over the pp ring.
    # Like vary_diff above: shard_map psums lower to ``psum_invariant``
    # whose copy-rooted reducer crashes XLA CPU's AllReducePromotion on
    # sub-f32 dtypes — psum in f32 there; TPU keeps the native dtype.
    masked = jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs))
    if jax.default_backend() == "cpu" and \
            masked.dtype in (jnp.bfloat16, jnp.float16):
        outputs = jax.lax.psum(masked.astype(jnp.float32),
                               axis_name).astype(masked.dtype)
    else:
        outputs = jax.lax.psum(masked, axis_name)
    return outputs.reshape(B, T, D)


def pipelined_layers(layer_fn: Callable, layers: Any, adapters: Any,
                     x: jax.Array, cos, sin, mask_bias, mesh: Mesh,
                     n_micro: int, axis_name: str = "pp") -> jax.Array:
    """Apply the layer stack pipelined over ``axis_name``.

    ``layer_fn(lp, h, la, cos, sin, mask_bias) -> h`` is one (possibly
    rematerialized) decoder layer; ``layers``/``adapters`` are [L, ...]
    stacked pytrees (adapters may be None). ``x`` [B, T, D]; B must divide
    by ``n_micro``, L by the pp mesh size.
    """
    S = mesh.shape[axis_name]
    L = jax.tree.leaves(layers)[0].shape[0]
    B = x.shape[0]
    if L % S != 0:
        raise ValueError(f"layers {L} not divisible by pp={S}")
    if B % n_micro != 0 or n_micro < 1:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")

    fn = jax.shard_map(
        partial(_pipeline_body, layer_fn=layer_fn, n_micro=n_micro,
                axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P(), P()),
        out_specs=P(),
        axis_names={axis_name})
    return fn(layers, adapters, x, cos, sin, mask_bias)
