"""Distilled-artifact quality evaluation: held-out teacher-student agreement.

Neither the reference nor the train loop measures the distilled *product*:
the reference logs only train-time sub-losses (reference train.py:107-114,
distillation_loss.py:71,110-118 — matched by core/trainer + train_step).
This module measures the artifact itself on held-out data:

  * top-1 agreement      argmax(student) == argmax(teacher)
  * top-K agreement      argmax(student) within the teacher's top-K set
  * KL(teacher||student) at T=1 (the distillation objective's end state)
  * student CE / teacher CE on the gold labels

Every metric is reported over two position slices:

  * ``all``     — every attended next-token position (the KD loss only
                  ever sees speech positions; text-slice agreement shows
                  whether distillation regressed the text LM)
  * ``speech``  — positions inside the speech-token span
                  (speech_token_mask), the actual distillation target

Two modes mirror the KD data paths (train_step.make_kd_step):
``make_agreement_step`` runs the teacher forward in-loop and computes
exact full-vocab metrics; ``make_sparse_agreement_step`` evaluates against
stored ``teacher_top_k_v/i`` artifacts (agreement vs the stored index set,
KL renormalized over the stored top-K — the same approximation the sparse
KD loss trains against).

Steps return *sums plus counts* (not means) so callers can stream batches
of any size and aggregate exactly; ``finalize_metrics`` turns the sums
into rates.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import Qwen3Config
from speech_distill_tpu.models import qwen3

IGNORE_INDEX = -100


def _position_masks(batch: Dict[str, jax.Array]):
    """Shifted position masks, all [B, T-1] fp32.

    all_m:    target position attended (prediction and target both exist)
    speech_m: all_m AND target inside the speech span
    label_m:  all_m AND gold label kept (labels != -100 — CE positions)
    """
    mask = batch["attention_mask"]
    all_m = (mask[:, 1:] * mask[:, :-1]).astype(jnp.float32)
    smask = batch.get("speech_token_mask")
    speech_m = all_m * (smask[:, 1:] != 0) if smask is not None \
        else jnp.zeros_like(all_m)
    labels = batch.get("labels")
    label_m = all_m * (labels[:, 1:] != IGNORE_INDEX) if labels is not None \
        else jnp.zeros_like(all_m)
    return all_m, speech_m, label_m


def _top1_rank_in(t_chunk: jax.Array, s1: jax.Array) -> jax.Array:
    """Rank of the student argmax inside the teacher logits, with
    lax.top_k tie order (ties resolve to the smallest index): rank =
    #{j: t[j] > t[s1]} + #{j < s1: t[j] == t[s1]}.  O(V) — no sort."""
    t_at = jnp.take_along_axis(t_chunk, s1[..., None], axis=-1)
    above = jnp.sum((t_chunk > t_at).astype(jnp.int32), axis=-1)
    iota = jnp.arange(t_chunk.shape[-1])
    ties = jnp.sum(((t_chunk == t_at)
                    & (iota < s1[..., None])).astype(jnp.int32), axis=-1)
    return above + ties


def _chunk_dense_metrics(s: jax.Array, t: jax.Array, target: jax.Array,
                         k: int):
    """Per-position metric planes for one [B, C, V] fp32 chunk pair."""
    lsm_s = jax.nn.log_softmax(s, axis=-1)
    lsm_t = jax.nn.log_softmax(t, axis=-1)
    p_t = jnp.exp(lsm_t)
    kl = jnp.sum(p_t * (lsm_t - lsm_s), axis=-1)
    safe = jnp.maximum(target, 0)
    ce_s = -jnp.take_along_axis(lsm_s, safe[..., None], axis=-1)[..., 0]
    ce_t = -jnp.take_along_axis(lsm_t, safe[..., None], axis=-1)[..., 0]
    s1 = jnp.argmax(s, axis=-1)
    t1 = jnp.argmax(t, axis=-1)
    agree1 = (s1 == t1).astype(jnp.float32)
    agreek = (_top1_rank_in(t, s1) < k).astype(jnp.float32)
    return {"kl": kl, "ce_s": ce_s, "ce_t": ce_t,
            "agree1": agree1, "agreek": agreek}


def _sum_slices(planes: Dict[str, jax.Array], all_m, speech_m, label_m):
    out = {}
    for name, m in (("all", all_m), ("speech", speech_m)):
        out[f"n_{name}"] = jnp.sum(m)
        for key in ("kl", "agree1", "agreek"):
            out[f"{key}_{name}"] = jnp.sum(planes[key] * m)
        # CE additionally needs a kept gold label
        lm = m * label_m
        out[f"n_label_{name}"] = jnp.sum(lm)
        out[f"ce_s_{name}"] = jnp.sum(planes["ce_s"] * lm)
        out[f"ce_t_{name}"] = jnp.sum(planes["ce_t"] * lm)
    return out


def make_agreement_step(student_cfg: Qwen3Config,
                        teacher_cfg: Optional[Qwen3Config] = None,
                        k: int = 10,
                        teacher_forward: Optional[Callable] = None,
                        chunk: int = 128):
    """Jitted exact-agreement step (online teacher forward).

    Returns ``step(student_params, teacher_params, batch) -> sums`` where
    batch is a flat [B, T] collated dict. Metrics stream over ``chunk``
    -wide time slices so the fp32 softmax temporaries never exceed
    [B, chunk, V] (both bf16 logit tensors are materialized once — the
    same envelope as the online-dense KD eval step).
    """
    t_cfg = teacher_cfg or student_cfg
    if teacher_forward is None:
        def teacher_forward(tp, ids, mask):
            return qwen3.forward(tp, ids, t_cfg, attention_mask=mask)

    @jax.jit
    def step(student_params, teacher_params, batch):
        s_logits = qwen3.forward(student_params, batch["input_ids"],
                                 student_cfg,
                                 attention_mask=batch["attention_mask"])
        t_ids = batch.get("teacher_input_ids", batch["input_ids"])
        t_mask = batch.get("teacher_attention_mask",
                           batch["attention_mask"])
        # CPU test meshes: teacher chain strictly after the student
        # forward (independent collective chains can deadlock the XLA:CPU
        # executor — parallel/mesh.py). No-op on TPU.
        from speech_distill_tpu.parallel import mesh as meshlib
        t_ids = meshlib.serialize_collective_chains(s_logits, t_ids)
        t_logits = teacher_forward(teacher_params, t_ids, t_mask)
        t_logits = t_logits[..., :student_cfg.vocab_size]

        target = batch["input_ids"][:, 1:]
        all_m, speech_m, label_m = _position_masks(batch)
        Tm1 = target.shape[1]
        c = min(chunk, Tm1)
        n_chunks = -(-Tm1 // c)
        pad = n_chunks * c - Tm1

        def pad_t(x, fill=0):
            return jnp.pad(x, [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2),
                           constant_values=fill) if pad else x

        # chunk planes: [B, N, c, ...] -> scan over N (keeps fp32 softmax
        # temporaries to one chunk at a time)
        def to_chunks(x):
            return pad_t(x).reshape(x.shape[0], n_chunks, c,
                                    *x.shape[2:]).swapaxes(0, 1)

        xs = (to_chunks(s_logits[:, :-1].astype(jnp.float32)),
              to_chunks(t_logits[:, :-1].astype(jnp.float32)),
              to_chunks(target), to_chunks(all_m), to_chunks(speech_m),
              to_chunks(label_m))

        def body(acc, ch):
            s, t, tgt, am, sm, lm = ch
            planes = _chunk_dense_metrics(s, t, tgt, k)
            sums = _sum_slices(planes, am, sm, lm)
            return {kk: acc[kk] + sums[kk] for kk in acc}, None

        keys = [f"{m}_{sl}" for sl in ("all", "speech")
                for m in ("n", "kl", "agree1", "agreek",
                          "n_label", "ce_s", "ce_t")]
        init = {kk: jnp.zeros((), jnp.float32) for kk in keys}
        sums, _ = jax.lax.scan(body, init, xs)
        return sums

    return step


def make_sparse_agreement_step(student_cfg: Qwen3Config, k: int = 10):
    """Jitted agreement step against stored top-K artifacts
    (``teacher_top_k_v/i``, the extract_logits output). The teacher view
    is its renormalized top-K distribution — exactly what the sparse KD
    loss distills — so ``kl`` here is the sparse objective at T=1 and
    agreement is membership in the stored index set.

    ``k`` must be <= the stored K; top-K agreement tests the student
    argmax against the FIRST k stored indices (they are stored in
    lax.top_k descending order).
    """
    @jax.jit
    def step(student_params, batch):
        s_logits = qwen3.forward(student_params, batch["input_ids"],
                                 student_cfg,
                                 attention_mask=batch["attention_mask"])
        s = s_logits[:, :-1].astype(jnp.float32)
        v = batch["teacher_top_k_v"][:, :-1].astype(jnp.float32)
        idx = batch["teacher_top_k_i"][:, :-1].astype(jnp.int32)
        target = batch["input_ids"][:, 1:]
        all_m, speech_m, label_m = _position_masks(batch)

        lsm_s_lse = jax.nn.logsumexp(s, axis=-1)
        log_q = jnp.take_along_axis(s, idx, axis=-1) - lsm_s_lse[..., None]
        log_p = jax.nn.log_softmax(v, axis=-1)          # renormalized top-K
        p = jnp.exp(log_p)
        kl = jnp.sum(p * (log_p - log_q), axis=-1)

        safe = jnp.maximum(target, 0)
        ce_s = lsm_s_lse - jnp.take_along_axis(
            s, safe[..., None], axis=-1)[..., 0]
        # teacher CE where the gold label appears in the stored top-K
        # (the reference's approximate monitor, distillation_loss.py:110-118)
        hit = (idx == target[..., None])
        ce_t = -jnp.sum(jnp.where(hit, v, 0.0), axis=-1)
        has_hit = jnp.any(hit, axis=-1).astype(jnp.float32)

        s1 = jnp.argmax(s, axis=-1)
        agree1 = (s1 == idx[..., 0]).astype(jnp.float32)
        agreek = jnp.any(idx[..., :k] == s1[..., None],
                         axis=-1).astype(jnp.float32)

        planes = {"kl": kl, "agree1": agree1, "agreek": agreek,
                  "ce_s": ce_s, "ce_t": ce_t}
        sums = _sum_slices(planes, all_m, speech_m, label_m)
        # teacher CE denominators shrink to label positions WITH a top-K hit
        for name, m in (("all", all_m), ("speech", speech_m)):
            lm = m * label_m * has_hit
            sums[f"ce_t_{name}"] = jnp.sum(ce_t * lm)
            sums[f"n_teacher_{name}"] = jnp.sum(lm)
        return sums

    return step


def finalize_metrics(sums: Dict[str, float], k: int) -> Dict[str, object]:
    """Turn streamed metric sums into rates; returns a JSON-ready dict."""
    s = {kk: float(v) for kk, v in sums.items()}
    out: Dict[str, object] = {"agree_k": k}
    for name in ("all", "speech"):
        n = s.get(f"n_{name}", 0.0)
        nl = s.get(f"n_label_{name}", 0.0)
        nt = s.get(f"n_teacher_{name}", nl)
        sl = {
            "positions": int(n),
            "top1_agreement": s[f"agree1_{name}"] / n if n else None,
            f"top{k}_agreement": s[f"agreek_{name}"] / n if n else None,
            "kl_t1": s[f"kl_{name}"] / n if n else None,
            "student_ce": s[f"ce_s_{name}"] / nl if nl else None,
            "teacher_ce": s[f"ce_t_{name}"] / nt if nt else None,
        }
        out[name] = sl
    return out
