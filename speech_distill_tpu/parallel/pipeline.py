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
import numpy as np
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


def _interleaved_schedule(S: int, V: int, M: int):
    """Static schedule tables for the (optionally interleaved) 1F1B
    pipeline on a lockstep pp ring of S devices with V virtual stages
    ("model chunks") per device — Megatron-style interleaving, re-derived
    for the SPMD tick-scan formulation.

    Logical stage q = v*S + s (chunk v living on device s) holds
    L/(S*V) consecutive layers. With microbatches processed in groups of
    S (Megatron's ordering; arbitrary M is handled, partial groups just
    leave masked holes):

      fwd  of (m, v) on device s at tick  F = s + sig(m, v)
      bwd  of (m, v) on device s at tick  B = (Q-1) + (S-1-s) + sigb(m, v)
      sig(m, v)  = (m % S) + v*S         + (m // S) * S * V
      sigb(m, v) = (m % S) + (V-1-v)*S   + (m // S) * S * V

    Every producer->consumer dependency lands exactly one tick apart
    (asserted below), so a single ``ppermute`` per direction per tick
    carries all activations and cotangents:

      fwd ring  s -> s+1: (m,v,s) feeds (m,v,s+1); the wrap S-1 -> 0
                 feeds (m, v+1, 0) — the chunk hop.
      bwd ring  s -> s-1: (m,v,s) feeds (m,v,s-1); the wrap 0 -> S-1
                 feeds (m, v-1, S-1).

    The first backward of a microbatch (v=V-1 on the last device) lands
    on the SAME tick as its last forward (B == F when q == Q-1) — seeded
    in-tick by the head vjp, exactly like the V=1 schedule.

    A stash slot holds a chunk input from F to B — lifetime
    2*(Q-1-q) ticks; slots are assigned by linear-scan (first-fit over
    sorted starts — optimal for interval coloring), giving the exact
    peak cross-tick activation footprint K (== min(M, 2S-1) at V=1).

    Bubble accounting (lockstep SPMD: a masked slot still costs its
    compute): ticks split into three phases — warmup [0, Q-1) has no
    valid backward anywhere and pays only the fwd slot; steady
    [Q-1, maxF+1) pays fwd+bwd; drain pays only bwd. For M % S == 0 the
    total is (MV + S - 1) fwd-slot costs + (MV + S - 1) bwd-slot costs —
    a bubble of (S-1) chunk-ticks each way, V times smaller than the
    uniform-tick V=1 schedule's (S-1) full-stage-ticks. This is optimal
    for the one-fwd+one-bwd-slot lockstep class: no backward exists
    before tick Q-1 and the last backward cannot land before
    maxF + Q - 1.

    Returns (tables, tB0, tC0, T, K): ``tables`` is a dict of numpy
    arrays indexed [tick, device] (head entries [tick]), phase bounds
    [0,tB0) / [tB0,tC0) / [tC0,T).
    """
    Q = S * V

    def sig(m, v):
        return (m % S) + v * S + (m // S) * S * V

    def sigb(m, v):
        return (m % S) + (V - 1 - v) * S + (m // S) * S * V

    off = Q - 1
    T = off + (S - 1) + sigb(M - 1, 0) + 1      # last bwd: (M-1, v=0, s=0)
    zi = lambda: np.zeros((T, S), np.int32)
    zb = lambda: np.zeros((T, S), bool)
    tb = {"fm": zi(), "fv": zi(), "fvalid": zb(), "fslot": zi(),
          "bm": zi(), "bv": zi(), "bvalid": zb(), "bslot": zi(),
          "bseed": zb(), "hm": np.zeros(T, np.int32),
          "hvalid": np.zeros(T, bool)}
    K = 0
    for s in range(S):
        events = []
        for m in range(M):
            for v in range(V):
                F = s + sig(m, v)
                B = off + (S - 1 - s) + sigb(m, v)
                assert F <= B < T and not tb["fvalid"][F, s] \
                    and not tb["bvalid"][B, s]
                tb["fm"][F, s], tb["fv"][F, s] = m, v
                tb["fvalid"][F, s] = True
                tb["bm"][B, s], tb["bv"][B, s] = m, v
                tb["bvalid"][B, s] = True
                if s == S - 1 and v == V - 1:
                    assert F == B and not tb["hvalid"][F]
                    tb["hm"][F], tb["hvalid"][F] = m, True
                    tb["bseed"][B, s] = True
                events.append((F, B))
        # linear-scan stash allocation; a slot frees the tick AFTER its
        # last read (the in-tick write precedes the read)
        events.sort()
        free_at: list = []
        for F, B in events:
            for k, fa in enumerate(free_at):
                if fa <= F:
                    break
            else:
                k = len(free_at)
                free_at.append(0)
            free_at[k] = B + 1
            tb["fslot"][F, s] = k
            tb["bslot"][B, s] = k
        K = max(K, len(free_at))

    # ring-tightness self-check: every valid message is consumed by the
    # neighbor exactly one tick later (or provably ignored at the wrap)
    for t in range(T):
        for s in range(S):
            if tb["fvalid"][t, s] and t + 1 < T:
                m, v = tb["fm"][t, s], tb["fv"][t, s]
                nxt = (s + 1) % S
                if s < S - 1:
                    assert tb["fvalid"][t + 1, nxt] and \
                        (tb["fm"][t + 1, nxt], tb["fv"][t + 1, nxt]) == (m, v)
                elif v < V - 1:
                    assert tb["fvalid"][t + 1, 0] and \
                        (tb["fm"][t + 1, 0], tb["fv"][t + 1, 0]) == (m, v + 1)
                else:       # consumed in-tick by the head; the ppermuted
                    # copy must not be read as an activation downstream
                    assert not tb["fvalid"][t + 1, 0] or tb["fv"][t + 1, 0] == 0
            if tb["bvalid"][t, s] and t + 1 < T:
                m, v = tb["bm"][t, s], tb["bv"][t, s]
                prv = (s - 1) % S
                if s > 0:
                    assert tb["bvalid"][t + 1, prv] and \
                        (tb["bm"][t + 1, prv], tb["bv"][t + 1, prv]) == (m, v)
                elif v > 0:
                    assert tb["bvalid"][t + 1, S - 1] and \
                        (tb["bm"][t + 1, S - 1],
                         tb["bv"][t + 1, S - 1]) == (m, v - 1)
                else:       # grad w.r.t. the pipeline input: leaves the ring
                    assert not tb["bvalid"][t + 1, S - 1] \
                        or tb["bseed"][t + 1, S - 1]

    tB0 = off                                       # first head/backward
    tC0 = int(np.max(np.nonzero(tb["fvalid"].any(axis=1))[0])) + 1
    assert not tb["bvalid"][:tB0].any() and not tb["hvalid"][:tB0].any()
    assert not tb["fvalid"][tC0:].any() and not tb["hvalid"][tC0:].any()
    return tb, tB0, tC0, T, K


def _1f1b_body(layers, adapters, x, cos, sin, mask_bias, head_params,
               head_aux, *, layer_fn: Callable, head_fn: Callable,
               n_micro: int, n_virtual: int, axis_name: str,
               grad_layers: bool = True, grad_head: bool = True,
               grad_x: bool = True, head_has_aux: bool = False):
    """shard_map body for the hand-scheduled (interleaved) 1F1B pipeline
    (see ``pipelined_grads_1f1b`` / ``pipelined_grads_interleaved``).
    Three ``lax.scan``s over the phases of the static schedule
    (``_interleaved_schedule``); each steady-state tick holds one chunk
    forward, one head slot, and one chunk backward per device, with slot
    assignments gathered from the schedule tables.

    The cross-tick activation footprint is the stash of K chunk inputs
    (exact interval-colored peak): the backward slot recomputes the chunk
    forward from the stashed input under ``jax.vjp`` (full remat,
    matching this codebase's measured-optimal policy), and gradients are
    accumulated by hand, so nothing else survives a tick.
    GPipe-by-autodiff instead linearizes the tick scan and stashes every
    tick's carry — M + S - 1 microbatch activations per stage
    (scripts/pp_memory_accounting.py measures both).

    ``layers``/``adapters`` arrive interleave-permuted (device s's local
    [V*Lc, ...] slice is its V chunks in v order — see
    ``_interleave_layer_perm``); gradients return in the same layout.
    """
    S = jax.lax.axis_size(axis_name)
    stage = jax.lax.axis_index(axis_name)
    B, T, D = x.shape
    M = n_micro
    V = n_virtual
    mb = B // M
    has_ad = adapters is not None
    tabs, tB0, tC0, n_ticks, K = _interleaved_schedule(S, V, M)
    tabs = {k: jnp.asarray(v) for k, v in tabs.items()}

    # local [V*Lc, ...] slice -> [V, Lc, ...] chunk stacks
    chunked = lambda t: jax.tree.map(
        lambda a: a.reshape((V, a.shape[0] // V) + a.shape[1:]), t)
    layers_c = chunked(layers)
    adapters_c = chunked(adapters) if has_ad else None

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

    def chunk_fwd(lp, la, h, idx):
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

    def make_tick(do_fwd: bool, do_head: bool, do_bwd: bool):
        def tick(carry, row):
            (fwd_msg, bwd_msg, stash, g_layers, g_adapters, g_head, g_x,
             loss, aux_acc) = carry

            # ---- forward slot ---------------------------------------
            if do_fwd:
                valid_f = row["fvalid"][stage]
                i_f = row["fm"][stage]
                v_f = row["fv"][stage]
                sl_f = row["fslot"][stage]
                # chunk v=0 on device 0 reads the pipeline input; every
                # other (v, s) reads the fwd ring (the S-1 -> 0 wrap is
                # the chunk hop v -> v+1)
                h_in = jnp.where(
                    jnp.logical_and(stage == 0, v_f == 0),
                    pick(xm, i_f), fwd_msg)
                old = jax.lax.dynamic_index_in_dim(
                    stash, sl_f, 0, keepdims=False)
                stash = jax.lax.dynamic_update_index_in_dim(
                    stash, jnp.where(valid_f, h_in, old), sl_f, 0)
                h_out = chunk_fwd(pick(layers_c, v_f),
                                  pick(adapters_c, v_f), h_in, i_f)

            # ---- head slot (real only on the last stage) ------------
            # SPMD lockstep: every stage evaluates the head on its own
            # h_out and masks the result; only stage S-1's is real, on
            # the tick its (m, V-1) forward completes.
            if do_head:
                valid_h = jnp.logical_and(stage == S - 1, row["hvalid"])
                aux_h = pick(aux_m, row["hm"])
                if grad_head:
                    vjp_out = jax.vjp(lambda h, hp: head_fn(h, hp, aux_h),
                                      h_out, head_params_v,
                                      has_aux=head_has_aux)
                else:
                    # head params stay closed over: no cotangent is
                    # requested for them, so the unvarying-primal psum
                    # trap does not apply
                    vjp_out = jax.vjp(lambda h: head_fn(h, head_params,
                                                        aux_h),
                                      h_out, has_aux=head_has_aux)
                loss_mb, head_vjp = vjp_out[0], vjp_out[1]
                aux_mb = vjp_out[2] if head_has_aux else None
                cots = head_vjp(vary(jnp.ones((), loss_mb.dtype)))
                g_seed = cots[0]
                mask_h = lambda acc, g: acc + jnp.where(
                    valid_h, g.astype(jnp.float32), 0.0)
                if grad_head:
                    g_head = jax.tree.map(mask_h, g_head, cots[1])
                loss = loss + jnp.where(valid_h,
                                        loss_mb.astype(jnp.float32), 0.0)
                if head_has_aux:
                    aux_acc = jax.tree.map(mask_h, aux_acc, aux_mb)

            # ---- backward slot --------------------------------------
            if do_bwd:
                valid_b = row["bvalid"][stage]
                i_b = row["bm"][stage]
                v_b = row["bv"][stage]
                g_in = bwd_msg
                if do_head:
                    # first backward of m ((v=V-1, s=S-1)) seeds from the
                    # head vjp of the same tick; all seed ticks carry a
                    # head slot by construction
                    g_in = jnp.where(row["bseed"][stage],
                                     g_seed.astype(bwd_msg.dtype), g_in)
                h_saved = jax.lax.dynamic_index_in_dim(
                    stash, row["bslot"][stage], 0, keepdims=False)
                cp = pick(layers_c, v_b)
                ca = pick(adapters_c, v_b)
                # differentiate only w.r.t. what the caller wants
                # gradients for — frozen layer stacks (unmerged LoRA)
                # skip the full-stack f32 accumulator entirely.
                # layers/adapters are pp-sharded (varying), so closing
                # over them when un-differentiated is psum-safe.
                gl = ga = None
                if grad_layers and has_ad:
                    _, vjp_fn = jax.vjp(
                        lambda lp, la, h: chunk_fwd(lp, la, h, i_b),
                        cp, ca, h_saved)
                    gl, ga, gh = vjp_fn(g_in)
                elif grad_layers:
                    _, vjp_fn = jax.vjp(
                        lambda lp, h: chunk_fwd(lp, None, h, i_b),
                        cp, h_saved)
                    gl, gh = vjp_fn(g_in)
                elif has_ad:
                    _, vjp_fn = jax.vjp(
                        lambda la, h: chunk_fwd(cp, la, h, i_b),
                        ca, h_saved)
                    ga, gh = vjp_fn(g_in)
                else:
                    _, vjp_fn = jax.vjp(
                        lambda h: chunk_fwd(cp, None, h, i_b), h_saved)
                    (gh,) = vjp_fn(g_in)

                def acc_chunk(gacc, g):
                    cur = jax.lax.dynamic_index_in_dim(
                        gacc, v_b, 0, keepdims=False)
                    upd = cur + jnp.where(valid_b,
                                          g.astype(jnp.float32), 0.0)
                    return jax.lax.dynamic_update_index_in_dim(
                        gacc, upd, v_b, 0)

                if grad_layers:
                    g_layers = jax.tree.map(acc_chunk, g_layers, gl)
                if has_ad:
                    g_adapters = jax.tree.map(acc_chunk, g_adapters, ga)
                if grad_x:
                    write_x = jnp.logical_and(
                        jnp.logical_and(stage == 0, v_b == 0), valid_b)
                    cur = jax.lax.dynamic_index_in_dim(
                        g_x, i_b, 0, keepdims=False)
                    g_x = jax.lax.dynamic_update_index_in_dim(
                        g_x, jnp.where(write_x, gh.astype(g_x.dtype), cur),
                        i_b, 0)

            if do_fwd:
                fwd_msg = jax.lax.ppermute(h_out, axis_name, perm_f)
            if do_bwd:
                bwd_msg = jax.lax.ppermute(gh.astype(bwd_msg.dtype),
                                           axis_name, perm_b)
            return (fwd_msg, bwd_msg, stash, g_layers, g_adapters, g_head,
                    g_x, loss, aux_acc), None

        return tick

    carry = vary((
        jnp.zeros((mb, T, D), x.dtype),              # fwd_msg
        jnp.zeros((mb, T, D), x.dtype),              # bwd_msg
        jnp.zeros((K, mb, T, D), x.dtype),           # stash (chunk inputs)
        zeros_f32(layers_c) if grad_layers else None,    # g_layers
        zeros_f32(adapters_c) if has_ad else None,   # g_adapters
        zeros_f32(head_params) if grad_head else None,   # g_head
        jnp.zeros((M, mb, T, D), jnp.float32) if grad_x else None,  # g_x
        jnp.zeros((), jnp.float32),                  # loss
        zeros_f32(aux_struct) if head_has_aux else None,  # metrics aux
    ))
    # three phases: warmup pays only the fwd slot and drain only the bwd
    # slot — in lockstep SPMD a masked slot still costs its compute, so
    # splitting the scan (phase bounds are static) is what realizes the
    # interleaved schedule's V-times-smaller bubble.
    for lo, hi, slots in ((0, tB0, (True, False, False)),
                          (tB0, tC0, (True, True, True)),
                          (tC0, n_ticks, (False, False, True))):
        if hi > lo:
            xs = {k: v[lo:hi] for k, v in tabs.items()}
            carry, _ = jax.lax.scan(make_tick(*slots), carry, xs)
    (_, _, _, g_layers, g_adapters, g_head, g_x, loss, aux_acc) = carry
    flat = lambda t: jax.tree.map(
        lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]), t)
    g_layers = flat(g_layers) if grad_layers else None
    g_adapters = flat(g_adapters) if has_ad else None

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


def _interleave_layer_perm(L: int, S: int, V: int) -> np.ndarray:
    """Permutation laying the [L]-stacked layer axis out so that pp-shard
    s's contiguous L/S slice is its V interleaved chunks in v order
    (chunk q = v*S + s holds global layers [q*Lc, (q+1)*Lc))."""
    Lc = L // (S * V)
    return np.concatenate([
        np.arange((v * S + s) * Lc, (v * S + s + 1) * Lc)
        for s in range(S) for v in range(V)])


def pipelined_grads_interleaved(layer_fn: Callable, layers: Any,
                                adapters: Any, x: jax.Array, cos, sin,
                                mask_bias, head_fn: Callable,
                                head_params: Any, head_aux: Any,
                                mesh: Mesh, n_micro: int, n_virtual: int,
                                axis_name: str = "pp", *,
                                grad_layers: bool = True,
                                grad_head: bool = True,
                                grad_x: bool = True,
                                head_has_aux: bool = False):
    """Interleaved (virtual-stage) 1F1B: ``pipelined_grads_1f1b`` with
    each device hosting ``n_virtual`` model chunks of L/(S*V) layers
    (Megatron-LM's interleaved schedule, re-derived for the lockstep
    SPMD tick scan — ``_interleaved_schedule`` documents the schedule,
    its tightness proof, and the bubble accounting: warmup + drain
    shrink from (S-1) full-stage ticks to (S-1) chunk ticks each way,
    i.e. the pipeline bubble is V times smaller at the cost of V times
    more (equal-sized [mb, T, D]) stash entries and V-1 extra ring hops
    per microbatch. ``n_virtual=1`` IS the plain 1F1B schedule.

    Same contract as ``pipelined_grads_1f1b``; additionally requires
    L % (S * n_virtual) == 0. The reference has no pipeline story at
    all (SURVEY §2.5 — its ``device_map="auto"`` is sequential offload).
    """
    S = mesh.shape[axis_name]
    L = jax.tree.leaves(layers)[0].shape[0]
    B = x.shape[0]
    if L % (S * n_virtual) != 0:
        raise ValueError(f"layers {L} not divisible by "
                         f"pp*interleave={S}*{n_virtual}")
    if B % n_micro != 0 or n_micro < 1:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")

    perm = _interleave_layer_perm(L, S, n_virtual)
    identity = n_virtual == 1
    if not identity:
        take = lambda t: jax.tree.map(lambda a: jnp.take(a, perm, 0), t)
        layers = take(layers)
        adapters = take(adapters) if adapters is not None else None

    fn = jax.shard_map(
        partial(_1f1b_body, layer_fn=layer_fn, head_fn=head_fn,
                n_micro=n_micro, n_virtual=n_virtual, axis_name=axis_name,
                grad_layers=grad_layers, grad_head=grad_head, grad_x=grad_x,
                head_has_aux=head_has_aux),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(axis_name), P(axis_name), P(), P()),
        axis_names={axis_name})
    loss, aux_acc, g_layers, g_adapters, g_x, g_head = fn(
        layers, adapters, x, cos, sin, mask_bias, head_params, head_aux)
    if not identity:
        inv = jnp.asarray(np.argsort(perm))
        untake = lambda t: None if t is None else \
            jax.tree.map(lambda a: jnp.take(a, inv, 0), t)
        g_layers = untake(g_layers)
        g_adapters = untake(g_adapters)
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

    This is ``pipelined_grads_interleaved`` at ``n_virtual=1`` (the
    schedule tables reduce exactly to fwd t = m + s / bwd
    t = m + 2(S-1) - s).
    """
    return pipelined_grads_interleaved(
        layer_fn, layers, adapters, x, cos, sin, mask_bias, head_fn,
        head_params, head_aux, mesh, n_micro, 1, axis_name,
        grad_layers=grad_layers, grad_head=grad_head, grad_x=grad_x,
        head_has_aux=head_has_aux)


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
