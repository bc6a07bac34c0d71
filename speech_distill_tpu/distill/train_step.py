"""Jitted training steps: stage-2 KD and stage-1 warm-up.

Replaces the reference's HF-Trainer callback plumbing
(DistillationTrainer.compute_loss, train.py:24-116; SFT + backward hooks,
stage1.py:29-93) with pure functions over pytree state, compiled once per
bucket shape.

TPU-first properties:
  * teacher forward runs inside the same jit program under stop_gradient —
    XLA overlaps it with the student step (no host round-trip per batch)
  * gradient accumulation is a ``lax.scan`` over a leading microbatch axis
  * stage-1's "train only new embedding rows" is a ``jnp.where`` on the
    gradient rows — same effect as the reference's backward hooks
    (stage1.py:52-73) without mutable-module machinery
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from speech_distill_tpu.core.config import DistillConfig, LoraConfig, Qwen3Config
from speech_distill_tpu.distill import losses
from speech_distill_tpu.distill.lora import lora_scaling, merge_lora
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.parallel import mesh as meshlib

Params = Dict[str, Any]


def _effective_student(trainable: Params, base_params: Params,
                       lcfg: LoraConfig, use_lora: bool,
                       merge_weights: bool):
    """Resolve (params, adapters, adapter_scale) for the student forward.

    Default is the *unmerged* adapter path (PEFT-equivalent, reference
    train.py:180-202): base weights stay out of the differentiated graph,
    so the backward never computes a full [din, dout] weight gradient per
    target — only the skinny dA/dB ones. ``merge_weights=True`` keeps the
    old fold-delta-into-W behavior (1 matmul/projection forward, full
    weight-grad backward) for A/B comparison.
    """
    if not use_lora:
        return trainable, None, 1.0
    if merge_weights:
        return merge_lora(base_params, trainable, lcfg), None, 1.0
    eff = dict(jax.lax.stop_gradient(base_params))
    if "embed" in trainable:
        eff["embed"] = trainable["embed"]
    if "lm_head" in trainable:
        eff["lm_head"] = trainable["lm_head"]
    return eff, trainable.get("layers"), lora_scaling(lcfg)


class TrainState(NamedTuple):
    trainable: Params          # lora pytree (KD) or embed/lm_head (stage-1)
    opt_state: Any
    step: jax.Array


def fused_clip_adamw(schedule, b1: float = 0.9, b2: float = 0.999,
                     eps: float = 1e-8, weight_decay: float = 0.0,
                     max_grad_norm: float = 1.0):
    """clip_by_global_norm + AdamW as ONE traversal.

    Numerically identical to ``optax.chain(clip_by_global_norm, adamw)``
    (verified leaf-exact in tests), emitting each leaf's clip-scale,
    moment updates, bias correction and decayed update as a single
    elementwise chain.

    Measured (round 3, isolated update on the real LoRA+embed tree,
    v5e-1): fused 7.3 ms vs optax chain 6.2 ms — XLA already fuses the
    chain's passes, so this is NOT the default (round-2's "optimizer
    ~12 ms vs ~4 ms floor" anatomy estimate was a full-step subtraction
    artifact). Kept as a tested alternative and as the measurement record
    for VERDICT r2 #9.

    State is a plain ``(count, mu, nu)`` tuple so
    ``parallel.sharding.shard_opt_state`` shards the moment trees like
    params.
    """

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return (jnp.zeros((), jnp.int32), z,
                jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        count, mu, nu = state
        gsq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                  for g in jax.tree.leaves(grads))
        gnorm = jnp.sqrt(gsq)
        # optax.clip_by_global_norm semantics: scale only when over
        scale = jnp.where(gnorm < max_grad_norm, 1.0,
                          max_grad_norm / jnp.maximum(gnorm, 1e-30))
        t = count + 1
        bc1 = 1.0 - b1 ** t.astype(jnp.float32)
        bc2 = 1.0 - b2 ** t.astype(jnp.float32)
        lr = schedule(count)

        flat_g, treedef = jax.tree.flatten(grads)
        flat_m = jax.tree.leaves(mu)
        flat_v = jax.tree.leaves(nu)
        flat_p = jax.tree.leaves(params) if params is not None \
            else [None] * len(flat_g)

        ups, ms, vs = [], [], []
        for g, m, v, p in zip(flat_g, flat_m, flat_v, flat_p):
            gc = g * scale
            m2 = b1 * m + (1.0 - b1) * gc
            v2 = b2 * v + (1.0 - b2) * jnp.square(gc)
            upd = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            if weight_decay and p is not None:
                upd = upd + weight_decay * p
            ups.append((-lr * upd).astype(g.dtype))
            ms.append(m2)
            vs.append(v2)
        return (treedef.unflatten(ups),
                (t, treedef.unflatten(ms), treedef.unflatten(vs)))

    return optax.GradientTransformation(init, update)


def make_optimizer(learning_rate: float, warmup_steps: int, total_steps: int,
                   weight_decay: float = 0.0, max_grad_norm: float = 1.0,
                   eight_bit: bool = False, fused: bool = False):
    """AdamW + linear warmup/decay + global-norm clip (HF Trainer defaults
    the reference inherits: train.py:331-354). ``eight_bit`` switches to
    int8-quantized moments (stage1.py:316 adamw_8bit equivalent);
    ``fused`` uses the single-traversal clip+AdamW (measured neutral on
    v5e — see :func:`fused_clip_adamw`)."""
    warmup_steps = max(1, warmup_steps)
    total_steps = max(total_steps, warmup_steps + 1)
    schedule = optax.schedules.join_schedules([
        optax.schedules.linear_schedule(0.0, learning_rate, warmup_steps),
        optax.schedules.linear_schedule(
            learning_rate, 0.0, total_steps - warmup_steps),
    ], [warmup_steps])
    if eight_bit:
        from speech_distill_tpu.distill.optim8bit import adamw_8bit
        return adamw_8bit(schedule, weight_decay=weight_decay,
                          max_grad_norm=max_grad_norm)
    if fused:
        return fused_clip_adamw(schedule, weight_decay=weight_decay,
                                max_grad_norm=max_grad_norm)
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    )


def init_state(trainable: Params, optimizer) -> TrainState:
    return TrainState(trainable, optimizer.init(trainable),
                      jnp.zeros((), jnp.int32))


def _accumulate(loss_and_grad_fn, trainable, batch, accum_args):
    """Scan microbatches (leading axis A) and average grads/metrics.

    A == 1 skips the scan and the fp32 zero-init/add round-trip: grads come
    back in param dtype — for the full-rank embed/lm_head copies that is one
    less fp32 materialization of two [159k, D] tensors per step.
    """
    A = jax.tree.leaves(batch)[0].shape[0]
    if A == 1:
        mb = jax.tree.map(lambda x: x[0], batch)
        (_, metrics), grads = loss_and_grad_fn(trainable, mb, *accum_args)
        return grads, metrics

    def micro(g_acc, mb):
        (_, metrics), grads = loss_and_grad_fn(trainable, mb, *accum_args)
        return jax.tree.map(jnp.add, g_acc, grads), metrics

    zero_g = jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), trainable)
    g, metrics = jax.lax.scan(micro, zero_g, batch)
    inv = 1.0 / A
    return jax.tree.map(lambda x: x * inv, g), \
        jax.tree.map(lambda x: jnp.mean(x), metrics)


# ---------------------------------------------------------------------------
# Stage-2 KD
# ---------------------------------------------------------------------------


def _make_1f1b_grad_fn(student_cfg: Qwen3Config, distill_cfg: DistillConfig,
                       lcfg: LoraConfig, use_lora: bool,
                       merge_weights: bool):
    """Value-and-grad of the precomputed sparse-KD loss under the 1F1B
    pipeline schedule (parallel/pipeline.pipelined_grads_interleaved;
    ``student_cfg.pp_interleave > 1`` adds Megatron-style virtual stages).

    Unlike the GPipe path (qwen3.forward pipelines the stack, autodiff
    linearizes the whole tick scan and stashes every microbatch's carry),
    the backward here is hand-scheduled: peak activation memory is bounded
    by the pipeline depth, and per-microbatch [mb, T, V] logits replace
    the full-batch [B, T, V] materialization. Loss/metrics/grads match the
    unpipelined step exactly: the per-microbatch head uses sum-form losses
    over GLOBAL denominators (losses.sparse_distill_sums), so the summed
    microbatch contributions reproduce the full-batch masked means.

    Embedding and lm-head/final-norm gradients (full finetune or
    modules_to_save) chain through ``g_x`` / ``g_head``; the frozen base
    stack never gets an f32 gradient accumulator (grad_layers off).
    """
    from speech_distill_tpu.parallel.pipeline import (
        mesh_pp, pipelined_grads_interleaved)
    mesh = meshlib.get_active_mesh()
    if mesh is None or mesh_pp(mesh) <= 1:
        raise ValueError("pp_schedule='1f1b' needs an active mesh with "
                         "pp > 1 (meshlib.set_active_mesh)")
    n_virtual = max(getattr(student_cfg, "pp_interleave", 1), 1)
    if merge_weights:
        raise ValueError("pp_schedule='1f1b' differentiates the adapter "
                         "stack directly; merge_weights is unsupported")
    n_micro = student_cfg.pp_microbatches
    if n_micro <= 0:
        raise ValueError("pp_schedule='1f1b' requires pp_microbatches > 0")
    cfg = student_cfg

    def grad_fn(trainable, mb, base_params, teacher_params):
        del teacher_params      # precomputed: top-K artifacts ride the batch
        eff, adapters, ascale = _effective_student(
            trainable, base_params, lcfg, use_lora, False)
        ids = mb["input_ids"]
        labels = mb["labels"]
        smask = mb.get("speech_token_mask")
        B, T = ids.shape
        tied = "lm_head" not in eff
        full_ft = not use_lora
        embed_grad = full_ft or "embed" in trainable
        head_grad = full_ft or "lm_head" in trainable \
            or (tied and embed_grad)

        if embed_grad:
            x, embed_vjp = jax.vjp(
                lambda et: qwen3.embed_tokens({"embed": et}, ids, cfg),
                eff["embed"])
        else:
            x = qwen3.embed_tokens(eff, ids, cfg)
        positions = jnp.arange(T)[None, :].repeat(B, axis=0)
        cos, sin = qwen3.rope_angles(positions, cfg.head_dim, cfg.rope_theta)
        bias = qwen3._causal_bias(mb["attention_mask"], B, T)

        def pl_fn(lp, h, la, c, s_, m_):
            return qwen3._layer(lp, h, c, s_, m_, cfg,
                                la=la, lora_scale=ascale)[0]
        if cfg.remat:
            policy = {
                "dots": jax.checkpoint_policies.checkpoint_dots,
                "everything": jax.checkpoint_policies.everything_saveable,
            }.get(cfg.remat_policy)
            pl_fn = jax.checkpoint(pl_fn, policy=policy)

        # global denominators for the sum-form per-microbatch head
        # (data-only — no gradients flow through them)
        shift_labels = labels[:, 1:]
        valid = shift_labels != losses.IGNORE_INDEX
        if smask is not None:
            valid = jnp.logical_and(valid, smask[:, 1:] != 0)
        valid = valid.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        idx_s = mb["teacher_top_k_i"][:, :-1].astype(jnp.int32)
        hit = (idx_s == shift_labels[..., None]).astype(jnp.float32)
        n_hits = jnp.maximum(jnp.sum(hit * valid[..., None]), 1.0)

        head_params = {"w": qwen3.lm_head_weight(eff),
                       "ln": eff["final_ln"]["scale"]}
        head_aux = {"sl": shift_labels, "valid": valid,
                    "v": mb["teacher_top_k_v"][:, :-1], "i": idx_s}

        def head_fn(h, hp, aux):
            hn = qwen3.rms_norm(h, hp["ln"], cfg.rms_norm_eps)
            s = jax.lax.dot_general(
                hn[:, :-1], hp["w"], (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = losses.sparse_distill_sums(
                s, aux["sl"], aux["valid"], aux["v"], aux["i"],
                denom, n_hits, distill_cfg.temperature, distill_cfg.alpha)
            return out.total, {"student_loss": out.task,
                               "distill_loss": out.distill,
                               "teacher_loss": out.teacher}

        loss, metrics, g_layers, g_adapters, g_x, g_head = \
            pipelined_grads_interleaved(
                pl_fn, eff["layers"], adapters, x, cos, sin, bias,
                head_fn, head_params, head_aux, mesh, n_micro, n_virtual,
                grad_layers=full_ft, grad_head=head_grad,
                grad_x=embed_grad, head_has_aux=True)

        def with_head_in_embed(g_emb):
            if tied and head_grad:
                return jax.tree.map(jnp.add, g_emb,
                                    {"weight": g_head["w"]})
            return g_emb

        if full_ft:
            grads = {"layers": g_layers,
                     "embed": with_head_in_embed(
                         embed_vjp(g_x.astype(x.dtype))[0]),
                     "final_ln": {"scale": g_head["ln"]}}
            if not tied:
                grads["lm_head"] = {"weight": g_head["w"]}
        else:
            grads = {"layers": g_adapters}
            if "embed" in trainable:
                grads["embed"] = with_head_in_embed(
                    embed_vjp(g_x.astype(x.dtype))[0])
            if "lm_head" in trainable:
                grads["lm_head"] = {"weight": g_head["w"]}

        metrics = dict(metrics, loss=loss)
        return (loss, metrics), grads

    return grad_fn


def make_kd_step(student_cfg: Qwen3Config, distill_cfg: DistillConfig,
                 optimizer, *, mode: str,
                 teacher_cfg: Optional[Qwen3Config] = None,
                 teacher_forward: Optional[Callable] = None,
                 teacher_extract: Optional[Callable] = None,
                 use_lora: bool = True,
                 merge_weights: bool = False,
                 donate: bool = True,
                 fused_loss: bool = False,
                 fused_backend: str = "xla",
                 loss_chunk_size: int = 16384,
                 head_loss: str = "fused",
                 split_apply: bool = False,
                 pp_schedule: str = "gpipe"):
    """Build the jitted KD step.

    mode:
      'precomputed'   — batch carries teacher_top_k_v/i (offline pipeline)
      'online_sparse' — teacher fwd in-loop, top-K extracted on device
                        (train.py:60-94)
      'online_dense'  — teacher fwd in-loop, full-vocab KL (quantized teacher
                        or top_k<=0; train.py:74-79)

    ``fused_loss`` routes the precomputed path through the chunked fused
    lm-head loss (ops/fused_lm_loss.py): ~O(N*chunk) memory instead of the
    [B, T, 159k] fp32 logits, at the cost of recomputing head matmuls in the
    backward. Measured on v5e: slower at bs4/seq512 (logits fit easily),
    the right trade at seq>=2048 / large batch where logits+softmax
    residuals dominate HBM.

    ``head_loss='fused'`` (default) computes the sparse-KD head loss via
    ``ops.fused_lm_loss.head_sparse_kd_loss`` — materialized logits but an
    analytic one-pass backward with bf16 d_logits and bf16 logits residual.
    'unfused' keeps plain autodiff through unembed + sparse_distill_loss.

    ``teacher_forward(teacher_params, ids, mask) -> logits`` defaults to the
    Qwen3 forward; inject the CosyVoice2 split-embedding policy here.

    ``pp_schedule`` (with an active pp>1 mesh and
    ``student_cfg.pp_microbatches > 0``): 'gpipe' (default) pipelines the
    stack inside qwen3.forward and lets autodiff linearize the schedule;
    '1f1b' uses the hand-scheduled backward (_make_1f1b_grad_fn) whose
    activation stash is bounded by the pipeline depth — precomputed mode
    only.

    Batch arrays carry a leading microbatch axis [A, B, T].
    Returns ``step(state, base_params, teacher_params, batch) -> (state, metrics)``.
    """
    lcfg = distill_cfg.lora

    if teacher_forward is None and mode != "precomputed":
        t_cfg = teacher_cfg or student_cfg

        def teacher_forward(tp, ids, mask):
            return qwen3.forward(tp, ids, t_cfg, attention_mask=mask)

        if teacher_extract is None and \
                getattr(distill_cfg, "online_extract", "materialized") \
                == "fused":
            def _fused_extract(tp, ids, mask):
                # fused lm-head + chunked exact top-K: never materializes
                # the [B, T, 159k] fp32 teacher logits (reference
                # train.py:74-94 extracts from dense logits). Measured ~4x
                # slower than materialized+approx on v5e (lax.top_k sorts
                # per vocab chunk) — use when HBM headroom matters, not
                # throughput (config.online_extract).
                hidden = qwen3.forward(tp, ids, t_cfg, attention_mask=mask,
                                       return_hidden=True)
                from speech_distill_tpu.ops.fused_lm_loss import \
                    fused_extract_top_k
                return fused_extract_top_k(hidden, qwen3.lm_head_weight(tp),
                                           distill_cfg.top_k,
                                           student_cfg.vocab_size)
            teacher_extract = _fused_extract

    def loss_fn(trainable, mb, base_params, teacher_params):
        eff, adapters, ascale = _effective_student(
            trainable, base_params, lcfg, use_lora, merge_weights)
        labels = mb["labels"]
        smask = mb.get("speech_token_mask")

        if mode == "precomputed" and fused_loss:
            # fused lm-head path: never materializes [B, T, V] logits
            hidden = qwen3.forward(eff, mb["input_ids"], student_cfg,
                                   attention_mask=mb["attention_mask"],
                                   return_hidden=True,
                                   adapters=adapters, adapter_scale=ascale)
            lm_w = qwen3.lm_head_weight(eff)
            from speech_distill_tpu.ops.fused_lm_loss import fused_sparse_kd_loss
            out = fused_sparse_kd_loss(
                hidden, lm_w, labels, mb["teacher_top_k_v"],
                mb["teacher_top_k_i"], smask, distill_cfg.temperature,
                distill_cfg.alpha, chunk_size=loss_chunk_size,
                backend=fused_backend)
            metrics = {"loss": out.total, "student_loss": out.task,
                       "distill_loss": out.distill,
                       "teacher_loss": out.teacher}
            return out.total, metrics

        fused_head = head_loss == "fused"
        acts = qwen3.forward(eff, mb["input_ids"], student_cfg,
                             attention_mask=mb["attention_mask"],
                             return_hidden=fused_head,
                             adapters=adapters, adapter_scale=ascale)

        def sparse_out(v, i):
            if fused_head:
                from speech_distill_tpu.ops.fused_lm_loss import \
                    head_sparse_kd_loss
                return head_sparse_kd_loss(
                    acts, qwen3.lm_head_weight(eff), labels, v, i, smask,
                    distill_cfg.temperature, distill_cfg.alpha)
            return losses.sparse_distill_loss(
                acts, v, i, labels, smask,
                distill_cfg.temperature, distill_cfg.alpha)

        if mode == "precomputed":
            out = sparse_out(mb["teacher_top_k_v"], mb["teacher_top_k_i"])
        else:
            t_ids = mb.get("teacher_input_ids", mb["input_ids"])
            t_mask = mb.get("teacher_attention_mask", mb["attention_mask"])
            # CPU test meshes: run the teacher chain strictly after the
            # student forward (independent collective chains can deadlock
            # the XLA:CPU executor — parallel/mesh.py). No-op on TPU.
            t_ids = meshlib.serialize_collective_chains(acts, t_ids)
            if mode == "online_sparse":
                if teacher_extract is not None:
                    v, i = jax.lax.stop_gradient(
                        teacher_extract(teacher_params, t_ids, t_mask))
                else:
                    t_logits = jax.lax.stop_gradient(
                        teacher_forward(teacher_params, t_ids, t_mask))
                    v, i = losses.extract_top_k(
                        t_logits, distill_cfg.top_k,
                        student_vocab_size=student_cfg.vocab_size,
                        method=distill_cfg.online_topk_method,
                        recall=distill_cfg.online_topk_recall)
                out = sparse_out(v, i)
            else:
                t_logits = jax.lax.stop_gradient(
                    teacher_forward(teacher_params, t_ids, t_mask))
                t_logits = t_logits[..., :student_cfg.vocab_size]
                if fused_head:
                    from speech_distill_tpu.ops.fused_lm_loss import \
                        head_dense_kd_loss
                    out = head_dense_kd_loss(
                        acts, qwen3.lm_head_weight(eff), t_logits, labels,
                        smask, distill_cfg.temperature, distill_cfg.alpha)
                else:
                    out = losses.dense_distill_loss(
                        acts, t_logits, labels, smask,
                        distill_cfg.temperature, distill_cfg.alpha)

        metrics = {"loss": out.total, "student_loss": out.task,
                   "distill_loss": out.distill, "teacher_loss": out.teacher}
        return out.total, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    if pp_schedule == "1f1b":
        # hand-scheduled 1F1B over the pp mesh axis: O(depth) activation
        # stash + per-microbatch logits instead of GPipe-by-autodiff's
        # O(microbatches) stash and [B, T, V] head materialization
        if mode != "precomputed":
            raise ValueError(
                "pp_schedule='1f1b' supports mode='precomputed'; for "
                "online KD disaggregate the teacher (--teacher_devices), "
                "which streams precomputed-style artifacts")
        grad_fn = _make_1f1b_grad_fn(student_cfg, distill_cfg, lcfg,
                                     use_lora, merge_weights)
    elif pp_schedule != "gpipe":
        raise ValueError(f"unknown pp_schedule {pp_schedule!r}")

    if split_apply:
        # Two programs instead of one: donate_argnums on the FULL KD step
        # never returns from the axon remote compiler (CLAUDE.md), but a
        # standalone elementwise apply donates fine (the loss-curve runner
        # uses exactly this). Splitting trades one extra dispatch + a
        # materialized grads pytree for in-place (aliased) state buffers —
        # no fresh multi-GB trainable/opt-state allocation per step.
        @jax.jit
        def grad_prog(trainable, base_params, teacher_params, batch):
            return _accumulate(grad_fn, trainable, batch,
                               (base_params, teacher_params))

        # Donate trainable + opt_state only: grads have no output to alias
        # (the state trees already claim the matching outputs), so donating
        # them is a no-op that only triggers the unusable-donation warning.
        @functools.partial(jax.jit,
                           donate_argnums=(0, 1) if donate else ())
        def apply_prog(trainable, opt_state, grads):
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, optax.global_norm(grads)

        def step(state: TrainState, base_params, teacher_params, batch):
            grads, metrics = grad_prog(state.trainable, base_params,
                                       teacher_params, batch)
            trainable, opt_state, gn = apply_prog(state.trainable,
                                                  state.opt_state, grads)
            metrics["grad_norm"] = gn
            return TrainState(trainable, opt_state, state.step + 1), metrics

        return step

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, base_params, teacher_params, batch):
        grads, metrics = _accumulate(grad_fn, state.trainable, batch,
                                     (base_params, teacher_params))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(trainable, opt_state, state.step + 1), metrics

    return step


def make_kd_eval_step(student_cfg: Qwen3Config, distill_cfg: DistillConfig,
                      *, mode: str,
                      teacher_cfg: Optional[Qwen3Config] = None,
                      teacher_forward: Optional[Callable] = None,
                      use_lora: bool = True,
                      merge_weights: bool = False):
    """Loss-only evaluation step (reference eval_strategy='epoch',
    train.py:341): same loss math as the train step, no grads."""
    lcfg = distill_cfg.lora

    if teacher_forward is None and mode != "precomputed":
        t_cfg = teacher_cfg or student_cfg

        def teacher_forward(tp, ids, mask):
            return qwen3.forward(tp, ids, t_cfg, attention_mask=mask)

    def loss_fn(trainable, mb, base_params, teacher_params):
        eff, adapters, ascale = _effective_student(
            trainable, base_params, lcfg, use_lora, merge_weights)
        logits = qwen3.forward(eff, mb["input_ids"], student_cfg,
                               attention_mask=mb["attention_mask"],
                               adapters=adapters, adapter_scale=ascale)
        labels = mb["labels"]
        smask = mb.get("speech_token_mask")
        if mode == "precomputed":
            out = losses.sparse_distill_loss(
                logits, mb["teacher_top_k_v"], mb["teacher_top_k_i"],
                labels, smask, distill_cfg.temperature, distill_cfg.alpha)
        else:
            t_ids = mb.get("teacher_input_ids", mb["input_ids"])
            t_mask = mb.get("teacher_attention_mask", mb["attention_mask"])
            # CPU: teacher chain after the student forward (parallel/mesh)
            t_ids = meshlib.serialize_collective_chains(logits, t_ids)
            t_logits = teacher_forward(teacher_params, t_ids, t_mask)
            if mode == "online_sparse":
                v, i = losses.extract_top_k(
                    t_logits, distill_cfg.top_k, student_cfg.vocab_size,
                    method=distill_cfg.online_topk_method,
                    recall=distill_cfg.online_topk_recall)
                out = losses.sparse_distill_loss(
                    logits, v, i, labels, smask, distill_cfg.temperature,
                    distill_cfg.alpha)
            else:
                out = losses.dense_distill_loss(
                    logits, t_logits[..., :student_cfg.vocab_size], labels,
                    smask, distill_cfg.temperature, distill_cfg.alpha)
        return {"loss": out.total, "student_loss": out.task,
                "distill_loss": out.distill, "teacher_loss": out.teacher}

    @jax.jit
    def eval_step(trainable, base_params, teacher_params, batch):
        # batch carries the [A, B, T] microbatch axis; average over A
        def one(mb):
            return loss_fn(trainable, mb, base_params, teacher_params)
        ms = jax.lax.map(one, batch)
        return jax.tree.map(jnp.mean, ms)

    return eval_step


# ---------------------------------------------------------------------------
# Stage-1 warm-up: new-embedding-only training
# ---------------------------------------------------------------------------


def mask_new_token_grads(grads: Params, old_vocab_size: int) -> Params:
    """Zero gradient rows below old_vocab_size for embed/lm_head
    (reference stage1.py:52-73 backward hooks)."""
    def mask_rows(g):
        rows = jnp.arange(g.shape[0])[:, None]
        return jnp.where(rows >= old_vocab_size, g, 0.0)

    out = {}
    for key in grads:
        out[key] = {"weight": mask_rows(grads[key]["weight"])}
    return out


def make_stage1_eval_step(cfg: Qwen3Config):
    """Loss-only stage-1 evaluation: next-token CE over labels != -100
    (reference eval_strategy='steps' when eval_size > 0, stage1.py:303-311).
    Batch carries the [A, B, T] microbatch axis; returns mean metrics."""

    def loss_fn(trainable, mb, base_params):
        eff = dict(base_params)
        eff["embed"] = trainable["embed"]
        if "lm_head" in trainable:
            eff["lm_head"] = trainable["lm_head"]
        logits = qwen3.forward(eff, mb["input_ids"], cfg,
                               attention_mask=mb["attention_mask"])
        shift_labels = mb["labels"][:, 1:]
        valid = (shift_labels != losses.IGNORE_INDEX).astype(jnp.float32)
        ce = losses._ce_per_pos(logits[:, :-1, :], shift_labels)
        # sums (not means): the caller aggregates groups by valid-token
        # count so the overall metric is the exact per-token mean
        return {"loss_sum": jnp.sum(ce * valid), "n_tokens": jnp.sum(valid)}

    @jax.jit
    def eval_step(trainable, base_params, batch):
        ms = jax.lax.map(lambda mb: loss_fn(trainable, mb, base_params),
                         batch)
        return jax.tree.map(jnp.sum, ms)

    return eval_step


def make_stage1_step(cfg: Qwen3Config, optimizer, old_vocab_size: int,
                     donate: bool = True, fused_loss: bool = False,
                     fused_backend: str = "xla"):
    """SFT CE step training only the new speech-token embedding rows.

    trainable = {"embed": ..., ["lm_head": ...]}; the rest of the model is
    frozen in base_params (reference stage1.py:29-93). Loss = next-token CE
    over labels != -100 (TRL SFT semantics).

    ``fused_loss`` uses the fused lm-head CE (Liger FLCE equivalent) — at
    the reference's stage-1 defaults (seq 4096, stage1.py:443-447) the
    materialized [B*T, 159k] fp32 logits would not fit in HBM.
    """

    def loss_fn(trainable, mb, base_params):
        eff = dict(base_params)
        eff["embed"] = trainable["embed"]
        if "lm_head" in trainable:
            eff["lm_head"] = trainable["lm_head"]
        labels = mb["labels"]
        if fused_loss:
            hidden = qwen3.forward(eff, mb["input_ids"], cfg,
                                   attention_mask=mb["attention_mask"],
                                   return_hidden=True)
            lm_w = qwen3.lm_head_weight(eff)
            if fused_backend == "pallas":
                from speech_distill_tpu.ops.pallas_lm_loss import lm_head_stats
                h = hidden[:, :-1, :].reshape(-1, hidden.shape[-1])
                shift = labels[:, 1:].reshape(-1)
                valid = (shift != losses.IGNORE_INDEX).astype(jnp.float32)
                interp = jax.devices()[0].platform != "tpu"
                lse1, _, label_logit = lm_head_stats(
                    h, lm_w, jnp.maximum(shift, 0), 2.0, 1024, 1024, interp)
                loss = losses._masked_mean(lse1 - label_logit, valid)
            else:
                from speech_distill_tpu.ops.fused_lm_loss import fused_cross_entropy
                loss = fused_cross_entropy(hidden, lm_w, labels)
            return loss, {"loss": loss}
        logits = qwen3.forward(eff, mb["input_ids"], cfg,
                               attention_mask=mb["attention_mask"])
        shift_labels = labels[:, 1:]
        valid = (shift_labels != losses.IGNORE_INDEX).astype(jnp.float32)
        ce = losses._ce_per_pos(logits[:, :-1, :], shift_labels)
        loss = losses._masked_mean(ce, valid)
        return loss, {"loss": loss}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else (),
                       static_argnums=())
    def step(state: TrainState, base_params, batch):
        grads, metrics = _accumulate(grad_fn, state.trainable, batch,
                                     (base_params,))
        grads = mask_new_token_grads(grads, old_vocab_size)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(trainable, opt_state, state.step + 1), metrics

    return step
