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


def _f32_psum(v, axis_name):
    """psum that routes sub-f32 dtypes through f32 on the CPU backend —
    shard_map psums lower to ``psum_invariant`` whose copy-rooted reducer
    region crashes XLA CPU's AllReducePromotion on bf16/f16 (see
    _pipeline_body). TPU keeps the native dtype."""
    if jax.default_backend() == "cpu" and \
            v.dtype in (jnp.bfloat16, jnp.float16):
        return jax.lax.psum(v.astype(jnp.float32),
                            axis_name).astype(v.dtype)
    return jax.lax.psum(v, axis_name)


def _1f1b_body(layers, adapters, x, cos, sin, mask_bias, head_params,
               head_aux, *, layer_fn: Callable, head_fn: Callable,
               n_micro: int, axis_name: str, grad_layers: bool = True,
               grad_head: bool = True, grad_x: bool = True,
               head_has_aux: bool = False):
    """shard_map body for the hand-scheduled 1F1B pipeline (see
    ``pipelined_grads_1f1b``). One ``lax.scan`` over global ticks; each
    tick holds one forward slot and one backward slot per stage:

      fwd  of microbatch m at stage s on tick  t = m + s        (as GPipe)
      head loss + its vjp for m at the LAST stage on the same tick its
        forward completes (t = m + S - 1), seeding the backward
      bwd  of microbatch m at stage s on tick  t = m + 2(S-1) - s

    Total ticks M + 2S - 2. Stage inputs are stashed in a ring of
    K = min(M, 2S-1) slots — a microbatch's stash lives 2(S-1-s) ticks
    (stashed at m+s, consumed at m+2(S-1)-s), so slot ``m % K`` is always
    free again before microbatch m+K re-uses it. That K is the whole
    cross-tick activation footprint: the backward slot recomputes the
    stage forward from the stashed input under ``jax.vjp`` (full remat,
    matching this codebase's measured-optimal policy), and gradients are
    accumulated by hand, so nothing else survives a tick. GPipe-by-autodiff
    instead linearizes the tick scan and stashes every tick's carry —
    M + S - 1 microbatch activations per stage (scripts/
    pp_memory_accounting.py measures both).
    """
    S = jax.lax.axis_size(axis_name)
    stage = jax.lax.axis_index(axis_name)
    B, T, D = x.shape
    M = n_micro
    mb = B // M
    K = min(M, 2 * S - 1)
    has_ad = adapters is not None

    def split(a):
        return None if a is None else a.reshape((M, mb) + a.shape[1:])

    vary = lambda t: jax.tree.map(
        lambda a: jax.lax.pcast(a, (axis_name,), to="varying"), t)

    xm = split(x)
    cos_m = split(cos) if cos.ndim == 3 else None
    sin_m = split(sin) if sin.ndim == 3 else None
    mask_m = jax.tree.map(split, mask_bias)
    aux_m = jax.tree.map(split, head_aux)

    def pick(stack, idx):
        return None if stack is None else \
            jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(
                a, idx, 0, keepdims=False), stack)

    def stage_fwd(lp, la, h, idx):
        c = cos if cos_m is None else pick(cos_m, idx)
        s_ = sin if sin_m is None else pick(sin_m, idx)
        m_ = pick(mask_m, idx)

        def body(carry, xs):
            lp1, la1 = xs
            return layer_fn(lp1, carry, la1, c, s_, m_), None

        h, _ = jax.lax.scan(body, h, (lp, la))
        return h

    perm_f = [(j, (j + 1) % S) for j in range(S)]
    perm_b = [(j, (j - 1) % S) for j in range(S)]
    zeros_f32 = lambda t: jax.tree.map(
        lambda a: jnp.zeros(a.shape, jnp.float32), t)

    # head_params arrives replicated (unvarying) over the pp axis; vjp'ing
    # w.r.t. an unvarying primal inserts an implicit psum over the axis on
    # the cotangent — which would fold every stage's lockstep-garbage head
    # gradient into the last stage's BEFORE the valid_h mask. pcast to
    # varying OUTSIDE the vjp so the cotangent stays per-shard.
    head_params_v = vary(head_params) if grad_head else None

    if head_has_aux:
        # structure of head_fn's metrics pytree (scalars, accumulated like
        # the loss)
        aux_struct = jax.eval_shape(
            lambda: head_fn(jnp.zeros((mb, T, D), x.dtype), head_params,
                            pick(aux_m, jnp.zeros((), jnp.int32)))[1])

    def tick(carry, t):
        (fwd_msg, bwd_msg, stash, g_layers, g_adapters, g_head, g_x,
         loss, aux_acc) = carry

        # ---- forward slot -------------------------------------------
        m_f = t - stage
        valid_f = jnp.logical_and(m_f >= 0, m_f < M)
        i_f = jnp.clip(m_f, 0, M - 1)
        h_in = jnp.where(stage == 0, pick(xm, i_f), fwd_msg)
        slot = i_f % K
        old = jax.lax.dynamic_index_in_dim(stash, slot, 0, keepdims=False)
        stash = jax.lax.dynamic_update_index_in_dim(
            stash, jnp.where(valid_f, h_in, old), slot, 0)
        h_out = stage_fwd(layers, adapters, h_in, i_f)

        # ---- head slot (real only on the last stage) ----------------
        # SPMD lockstep: every stage evaluates the head on its own h_out
        # and masks the result; only stage S-1's is real.
        m_h = t - (S - 1)
        valid_h = jnp.logical_and(stage == S - 1,
                                  jnp.logical_and(m_h >= 0, m_h < M))
        i_h = jnp.clip(m_h, 0, M - 1)
        aux_h = pick(aux_m, i_h)
        if grad_head:
            vjp_out = jax.vjp(lambda h, hp: head_fn(h, hp, aux_h),
                              h_out, head_params_v, has_aux=head_has_aux)
        else:
            # head params stay closed over: no cotangent is requested for
            # them, so the unvarying-primal psum trap does not apply
            vjp_out = jax.vjp(lambda h: head_fn(h, head_params, aux_h),
                              h_out, has_aux=head_has_aux)
        loss_mb, head_vjp = vjp_out[0], vjp_out[1]
        aux_mb = vjp_out[2] if head_has_aux else None
        cots = head_vjp(vary(jnp.ones((), loss_mb.dtype)))
        g_seed = cots[0]
        mask_h = lambda acc, g: acc + jnp.where(valid_h,
                                                g.astype(jnp.float32), 0.0)
        if grad_head:
            g_head = jax.tree.map(mask_h, g_head, cots[1])
        loss = loss + jnp.where(valid_h, loss_mb.astype(jnp.float32), 0.0)
        if head_has_aux:
            aux_acc = jax.tree.map(mask_h, aux_acc, aux_mb)

        # ---- backward slot ------------------------------------------
        m_b = t - 2 * (S - 1) + stage
        valid_b = jnp.logical_and(m_b >= 0, m_b < M)
        i_b = jnp.clip(m_b, 0, M - 1)
        g_in = jnp.where(stage == S - 1, g_seed.astype(bwd_msg.dtype),
                         bwd_msg)
        h_saved = jax.lax.dynamic_index_in_dim(
            stash, i_b % K, 0, keepdims=False)
        # differentiate only w.r.t. what the caller wants gradients for —
        # frozen layer stacks (unmerged LoRA) skip the full-stack f32
        # accumulator entirely. layers/adapters are pp-sharded (varying),
        # so closing over them when un-differentiated is psum-safe.
        gl = ga = None
        if grad_layers and has_ad:
            _, vjp_fn = jax.vjp(
                lambda lp, la, h: stage_fwd(lp, la, h, i_b),
                layers, adapters, h_saved)
            gl, ga, gh = vjp_fn(g_in)
        elif grad_layers:
            _, vjp_fn = jax.vjp(
                lambda lp, h: stage_fwd(lp, None, h, i_b),
                layers, h_saved)
            gl, gh = vjp_fn(g_in)
        elif has_ad:
            _, vjp_fn = jax.vjp(
                lambda la, h: stage_fwd(layers, la, h, i_b),
                adapters, h_saved)
            ga, gh = vjp_fn(g_in)
        else:
            _, vjp_fn = jax.vjp(lambda h: stage_fwd(layers, None, h, i_b),
                                h_saved)
            (gh,) = vjp_fn(g_in)
        acc = lambda a, g: a + jnp.where(valid_b, g.astype(jnp.float32), 0.0)
        if grad_layers:
            g_layers = jax.tree.map(acc, g_layers, gl)
        if has_ad:
            g_adapters = jax.tree.map(acc, g_adapters, ga)
        if grad_x:
            write_x = jnp.logical_and(stage == 0, valid_b)
            cur = jax.lax.dynamic_index_in_dim(g_x, i_b, 0, keepdims=False)
            g_x = jax.lax.dynamic_update_index_in_dim(
                g_x, jnp.where(write_x, gh.astype(g_x.dtype), cur), i_b, 0)

        fwd_msg = jax.lax.ppermute(h_out, axis_name, perm_f)
        bwd_msg = jax.lax.ppermute(gh.astype(bwd_msg.dtype), axis_name,
                                   perm_b)
        return (fwd_msg, bwd_msg, stash, g_layers, g_adapters, g_head,
                g_x, loss, aux_acc), None

    carry0 = vary((
        jnp.zeros((mb, T, D), x.dtype),              # fwd_msg
        jnp.zeros((mb, T, D), x.dtype),              # bwd_msg
        jnp.zeros((K, mb, T, D), x.dtype),           # stash ring
        zeros_f32(layers) if grad_layers else None,  # g_layers (local slice)
        zeros_f32(adapters) if has_ad else None,     # g_adapters
        zeros_f32(head_params) if grad_head else None,   # g_head
        jnp.zeros((M, mb, T, D), jnp.float32) if grad_x else None,  # g_x
        jnp.zeros((), jnp.float32),                  # loss
        zeros_f32(aux_struct) if head_has_aux else None,  # metrics aux
    ))
    carry, _ = jax.lax.scan(tick, carry0, jnp.arange(M + 2 * S - 2))
    (_, _, _, g_layers, g_adapters, g_head, g_x, loss, aux_acc) = carry

    # loss / aux / g_head are real only on the last stage, g_x only on
    # stage 0; broadcast over the pp ring. g_layers/g_adapters stay local
    # slices (out_specs reassemble the [L, ...] leading axis).
    last = stage == S - 1
    psum_last = lambda g: _f32_psum(jnp.where(last, g, jnp.zeros_like(g)),
                                    axis_name)
    loss = psum_last(loss)
    aux_acc = jax.tree.map(psum_last, aux_acc) if head_has_aux else None
    if grad_head:
        g_head = jax.tree.map(psum_last, g_head)
    if grad_x:
        g_x = _f32_psum(jnp.where(stage == 0, g_x, jnp.zeros_like(g_x)),
                        axis_name).reshape(B, T, D)
    return loss, aux_acc, g_layers, g_adapters, g_x, g_head


def pipelined_grads_1f1b(layer_fn: Callable, layers: Any, adapters: Any,
                         x: jax.Array, cos, sin, mask_bias,
                         head_fn: Callable, head_params: Any, head_aux: Any,
                         mesh: Mesh, n_micro: int, axis_name: str = "pp",
                         *, grad_layers: bool = True, grad_head: bool = True,
                         grad_x: bool = True, head_has_aux: bool = False):
    """1F1B pipeline schedule: loss + gradients of the pipelined layer
    stack with activation memory bounded by the pipeline depth instead of
    the microbatch count (VERDICT-r3 #8; the reference has no pipeline
    story at all — its ``device_map="auto"`` is sequential offload).

    ``layer_fn(lp, h, la, cos, sin, mask_bias) -> h`` as in
    ``pipelined_layers``; ``head_fn(h_mb, head_params, aux_mb) -> scalar``
    (or ``-> (scalar, metrics_pytree)`` with ``head_has_aux=True``; metric
    leaves must be scalars and are summed across microbatches like the
    loss) is the per-microbatch loss at the top of the stack (lm head +
    CE/KD; fold any 1/M normalization in — microbatch losses are summed).
    ``head_aux`` is a pytree of [B, ...] arrays (labels, masks) split into
    microbatches alongside ``x``.

    ``grad_layers`` / ``grad_head`` / ``grad_x`` turn off the cotangent
    (and its f32 accumulator) for frozen inputs — the unmerged-LoRA KD
    step wants only ``g_adapters``, not a full f32 copy of the frozen
    base stack.

    Returns ``(loss, metrics, g_layers, g_adapters, g_x, g_head)`` —
    ``metrics`` is the summed head aux (None unless ``head_has_aux``);
    gradients are f32 (the accumulation dtype, None when switched off),
    ``g_x`` [B, T, D] ready to continue backprop into the embedding
    outside the pipeline. Exactness vs GPipe-by-autodiff and vs the
    unpipelined stack: tests/test_pipeline_parallel.py.

    Schedule + memory bound: see ``_1f1b_body``. Peak cross-tick stash is
    min(M, 2S-1) microbatch activations per stage vs GPipe-by-autodiff's
    M + S - 1 — O(depth) vs O(microbatches); measured by
    scripts/pp_memory_accounting.py --schedule both.
    """
    S = mesh.shape[axis_name]
    L = jax.tree.leaves(layers)[0].shape[0]
    B = x.shape[0]
    if L % S != 0:
        raise ValueError(f"layers {L} not divisible by pp={S}")
    if B % n_micro != 0 or n_micro < 1:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")

    fn = jax.shard_map(
        partial(_1f1b_body, layer_fn=layer_fn, head_fn=head_fn,
                n_micro=n_micro, axis_name=axis_name,
                grad_layers=grad_layers, grad_head=grad_head, grad_x=grad_x,
                head_has_aux=head_has_aux),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(axis_name), P(axis_name), P(), P()),
        axis_names={axis_name})
    return fn(layers, adapters, x, cos, sin, mask_bias, head_params,
              head_aux)


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
