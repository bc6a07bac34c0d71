"""CosyVoice2 teacher: split-embedding / split-head Qwen2 LM, unified vocab.

The reference wraps a torch CosyVoice2 so it looks like a plain CausalLM over
a unified id space (cosyvoice2/teacher_wrapper.py:10-190): input ids are
range-routed into three embedding tables and output logits are merged from
two heads. TPU-first redesign: the three tables are *concatenated once* into
a single [V_unified, D] matrix so embedding is one gather (no masks, no
scatter), and the merged logits are a concatenation of head outputs with
constant -10000 filler — both XLA-trivial.

Unified id layout (teacher_wrapper.py:52-57):
    [0, text_vocab)              text tokens      -> backbone embed / lm_head
    [text_vocab, text_vocab+2)   sos, task        -> llm_embedding (2 rows)
    [text_vocab+2, +2+S+3)       speech tokens    -> speech_embedding / llm_decoder
    remainder                    unmapped         -> zero embed / -10000 logits

S = 6561 speech codes; decoder head has S+3 outputs (eos=S, unused, fill=S+2;
cosyvoice2/modeling.py:86-94).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_distill_tpu.core.config import Qwen3Config, qwen2_cosyvoice_backbone
from speech_distill_tpu.models import qwen3

Params = Dict[str, Any]

NEG_FILL = -10000.0
IGNORE_ID = -1


@dataclasses.dataclass
class CosyVoice2Config:
    backbone: Qwen3Config = dataclasses.field(
        default_factory=qwen2_cosyvoice_backbone)
    text_vocab_size: int = 152704       # unified text range (wrapper default)
    speech_token_size: int = 6561       # codebook entries
    unified_vocab_size: int = 159271    # wrapper's merged logit width
    mix_ratio: Tuple[int, int] = (5, 15)

    @property
    def sos_id(self) -> int:
        return self.text_vocab_size

    @property
    def task_id(self) -> int:
        return self.text_vocab_size + 1

    @property
    def speech_offset(self) -> int:
        return self.text_vocab_size + 2

    @property
    def num_decoder_out(self) -> int:
        return self.speech_token_size + 3  # + eos / unused / fill

    @property
    def eos_unified(self) -> int:
        return self.speech_offset + self.speech_token_size

    @property
    def fill_unified(self) -> int:
        return self.speech_offset + self.speech_token_size + 2


def init_params(rng: jax.Array, cfg: CosyVoice2Config) -> Params:
    k0, k1, k2, k3 = jax.random.split(rng, 4)
    dt = jnp.dtype(cfg.backbone.dtype)
    D = cfg.backbone.hidden_size
    return {
        "backbone": qwen3.init_params(k0, cfg.backbone),
        "llm_embedding": jax.random.normal(k1, (2, D), jnp.float32).astype(dt) * 0.02,
        "speech_embedding": jax.random.normal(
            k2, (cfg.num_decoder_out, D), jnp.float32).astype(dt) * 0.02,
        "llm_decoder": {
            "w": jax.random.normal(
                k3, (D, cfg.num_decoder_out), jnp.float32).astype(dt) * 0.02,
            "b": jnp.zeros((cfg.num_decoder_out,), dt),
        },
    }


def unified_embedding_table(params: Params, cfg: CosyVoice2Config) -> jax.Array:
    """[V_unified, D]: concat(text embed (zero-padded), llm_embedding,
    speech_embedding, zero tail). Built once per forward; XLA hoists it."""
    text = params["backbone"]["embed"]["weight"]
    D = text.shape[1]
    dt = text.dtype
    pieces = [text]
    if text.shape[0] < cfg.text_vocab_size:
        pieces.append(jnp.zeros((cfg.text_vocab_size - text.shape[0], D), dt))
    else:
        pieces = [text[:cfg.text_vocab_size]]
    pieces.append(params["llm_embedding"].astype(dt))
    pieces.append(params["speech_embedding"].astype(dt))
    used = cfg.speech_offset + params["speech_embedding"].shape[0]
    if used < cfg.unified_vocab_size:
        pieces.append(jnp.zeros((cfg.unified_vocab_size - used, D), dt))
    return jnp.concatenate(pieces, axis=0)


def forward(params: Params, input_ids: jax.Array, cfg: CosyVoice2Config,
            attention_mask: Optional[jax.Array] = None) -> jax.Array:
    """Unified-vocab teacher logits [B, T, unified_vocab_size] (fp32).

    Matches wrapper semantics (teacher_wrapper.py:59-162): text logits from
    the backbone lm_head truncated to text_vocab, special ids filled -10000,
    speech logits from llm_decoder at the speech offset.
    """
    table = unified_embedding_table(params, cfg)
    x = jnp.take(table, input_ids, axis=0)
    hidden = qwen3.forward(params["backbone"], None, cfg.backbone,
                           attention_mask=attention_mask, inputs_embeds=x,
                           return_hidden=True)
    f32 = jnp.float32
    lm_w = qwen3.lm_head_weight(params["backbone"])
    text_logits = hidden.astype(f32) @ lm_w.T.astype(f32)
    n_text = min(text_logits.shape[-1], cfg.text_vocab_size)
    text_logits = text_logits[..., :n_text]
    B, T = hidden.shape[:2]

    def fill(n):
        return jnp.full((B, T, n), NEG_FILL, f32)

    speech_logits = (hidden.astype(f32) @ params["llm_decoder"]["w"].astype(f32)
                     + params["llm_decoder"]["b"].astype(f32))
    n_speech = min(speech_logits.shape[-1], cfg.num_decoder_out)
    pieces = [text_logits]
    if n_text < cfg.text_vocab_size:
        pieces.append(fill(cfg.text_vocab_size - n_text))
    pieces.append(fill(2))  # sos/task rows are never predicted
    pieces.append(speech_logits[..., :n_speech])
    used = cfg.speech_offset + n_speech
    if used < cfg.unified_vocab_size:
        pieces.append(fill(cfg.unified_vocab_size - used))
    return jnp.concatenate(pieces, axis=-1)


def make_teacher_forward(cfg: CosyVoice2Config):
    """Adapter matching the KD step's teacher_forward signature."""
    def fn(params, ids, mask):
        return forward(params, ids, cfg, attention_mask=mask)
    return fn


def make_teacher_extract(cfg: CosyVoice2Config, k: int,
                         student_vocab_size: int, chunk_size: int = 16384,
                         extract: str = "materialized",
                         recall: float = 0.95):
    """Top-K extraction over the split text/speech heads.

    Equivalent to ``extract_top_k(forward(...), k, student_vocab_size)``
    without building the unified [B, T, vocab] layout: each head is
    processed separately, tops merged with globalized indices, joint
    logsumexp = ``logaddexp`` of the per-head ones (the -10000 filler rows
    of the unified layout underflow to exactly 0 probability mass in both
    formulations, teacher_wrapper.py:126-162).

    extract='materialized' (default): per-head dense logits +
    ``approx_max_k`` — the online-KD throughput path (chunked exact
    top-k measured ~4x slower on v5e). 'fused': chunked
    top-k+logsumexp scan that never materializes head logits
    (ops.fused_lm_loss.fused_topk_lse) — exact, for the offline
    extraction CLI or HBM-bound configs.
    """
    from speech_distill_tpu.ops.fused_lm_loss import fused_topk_lse

    def _hidden(params, ids, mask):
        table = unified_embedding_table(params, cfg)
        x = jnp.take(table, ids, axis=0)
        hidden = qwen3.forward(params["backbone"], None, cfg.backbone,
                               attention_mask=mask, inputs_embeds=x,
                               return_hidden=True)
        B, T, D = hidden.shape
        lm_w = qwen3.lm_head_weight(params["backbone"])
        n_text = min(lm_w.shape[0], cfg.text_vocab_size, student_vocab_size)
        n_speech = 0
        if student_vocab_size > cfg.speech_offset:
            n_speech = min(cfg.num_decoder_out,
                           student_vocab_size - cfg.speech_offset)
            assert k <= n_speech, "top_k exceeds the speech head"
        return hidden.reshape(-1, D), lm_w, n_text, n_speech, (B, T)

    def _merge(tv, ti, lse, tv2, ti2, lse2):
        cand_v = jnp.concatenate([tv, tv2], axis=1)
        cand_i = jnp.concatenate([ti, ti2 + cfg.speech_offset], axis=1)
        v, sel = jax.lax.top_k(cand_v, k)
        i = jnp.take_along_axis(cand_i, sel, axis=1)
        return v, i, jnp.logaddexp(lse, lse2)

    def fn_fused(params, ids, mask):
        h, lm_w, n_text, n_speech, (B, T) = _hidden(params, ids, mask)
        tv, ti, lse = fused_topk_lse(h, lm_w, k, n_text, chunk_size)
        if n_speech:
            tv2, ti2, lse2 = fused_topk_lse(
                h, params["llm_decoder"]["w"].T, k, n_speech, chunk_size,
                bias=params["llm_decoder"]["b"])
            tv, ti, lse = _merge(tv, ti, lse, tv2, ti2, lse2)
        v = (tv - lse[:, None]).astype(jnp.float16)
        return v.reshape(B, T, k), ti.reshape(B, T, k)

    def fn_materialized(params, ids, mask):
        h, lm_w, n_text, n_speech, (B, T) = _hidden(params, ids, mask)
        tl = jax.lax.dot_general(
            h, lm_w[:n_text], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        lse = jax.nn.logsumexp(tl, axis=-1)
        tv, ti = jax.lax.approx_max_k(tl, k, recall_target=recall)
        if n_speech:
            sl = jax.lax.dot_general(
                h, params["llm_decoder"]["w"][:, :n_speech],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) \
                + params["llm_decoder"]["b"][:n_speech]
            lse2 = jax.nn.logsumexp(sl, axis=-1)
            tv2, ti2 = jax.lax.top_k(sl, k)   # 6,564 lanes: exact is cheap
            tv, ti, lse = _merge(tv, ti, lse, tv2, ti2, lse2)
        v = (tv - lse[:, None]).astype(jnp.float16)
        return v.reshape(B, T, k), ti.reshape(B, T, k)

    return fn_materialized if extract == "materialized" else fn_fused


def convert_torch_state(state: Dict[str, Any],
                        cfg: CosyVoice2Config) -> Params:
    """Map a reference CosyVoice2 torch checkpoint into this pytree.

    torch names (cosyvoice2/modeling.py:71-97):
      llm_embedding.weight [2, D], speech_embedding.weight [S+3, D],
      llm_decoder.{weight,bias}, and the Qwen2 backbone under
      ``llm.model.`` (Qwen2Encoder wraps Qwen2ForCausalLM).
    """
    import numpy as np
    from speech_distill_tpu.models.hf_loader import from_state_dict

    def np_(t):
        if isinstance(t, np.ndarray):
            return t.astype(np.float32)
        import torch
        return t.detach().to(torch.float32).cpu().numpy()

    backbone_state = {k[len("llm.model."):]: v for k, v in state.items()
                     if k.startswith("llm.model.")}
    return {
        "backbone": from_state_dict(backbone_state, cfg.backbone),
        "llm_embedding": jnp.asarray(np_(state["llm_embedding.weight"])),
        "speech_embedding": jnp.asarray(np_(state["speech_embedding.weight"])),
        "llm_decoder": {
            "w": jnp.asarray(np_(state["llm_decoder.weight"]).T),
            "b": jnp.asarray(np_(state["llm_decoder.bias"])),
        },
    }


# ---------------------------------------------------------------------------
# Training-sequence construction (bistream / unistream interleave)
# ---------------------------------------------------------------------------


def prepare_lm_sequences(cfg: CosyVoice2Config,
                         text_tokens: Sequence[Sequence[int]],
                         speech_tokens: Sequence[Sequence[int]],
                         bistream: Sequence[bool],
                         pad_to: Optional[int] = None):
    """Build unified-id inputs + targets, host-side numpy.

    Reference ``prepare_lm_input_target`` (cosyvoice2/modeling.py:99-212)
    interleaves *embeddings*; with the unified table, ids interleave instead
    and the embedding lookup happens in-model (one gather).

    bistream[i]: mix text/speech 5:15 chunks with fill tokens; else
    unistream: [sos, text..., task, speech..., eos].
    Targets are unified speech ids (offset applied), IGNORE_ID elsewhere.
    Returns (input_ids [B, T], targets [B, T], lengths [B]).
    """
    m_t, m_s = cfg.mix_ratio
    seqs: List[List[int]] = []
    tgts: List[List[int]] = []
    for text, speech, bi in zip(text_tokens, speech_tokens, bistream):
        text = list(text)
        speech = list(speech)
        if bi and len(speech) / max(len(text), 1) > m_s / m_t:
            inp = [cfg.sos_id]
            tgt = [IGNORE_ID]
            n_chunks = int(np.ceil((len(text) + 1) / m_t))
            for j in range(n_chunks):
                t_chunk = text[j * m_t:(j + 1) * m_t]
                s_chunk = speech[j * m_s:(j + 1) * m_s]
                if len(t_chunk) == m_t:
                    tgt += [IGNORE_ID] * (m_t - 1)
                    tgt += [cfg.speech_offset + c for c in s_chunk]
                    tgt.append(cfg.fill_unified)
                    inp += t_chunk
                    inp += [cfg.speech_offset + c for c in s_chunk]
                else:
                    tgt += [IGNORE_ID] * len(t_chunk)
                    tgt += [cfg.speech_offset + c for c in speech[j * m_s:]]
                    tgt.append(cfg.eos_unified)
                    inp += t_chunk
                    inp.append(cfg.task_id)
                    inp += [cfg.speech_offset + c for c in speech[j * m_s:]]
        else:
            inp = ([cfg.sos_id] + text + [cfg.task_id]
                   + [cfg.speech_offset + c for c in speech])
            tgt = ([IGNORE_ID] * (1 + len(text))
                   + [cfg.speech_offset + c for c in speech]
                   + [cfg.eos_unified])
        seqs.append(inp)
        tgts.append(tgt)

    lengths = np.asarray([len(s) for s in seqs], np.int32)
    T = pad_to or int(lengths.max())
    B = len(seqs)
    ids = np.zeros((B, T), np.int32)
    targets = np.full((B, T), IGNORE_ID, np.int64)
    for b in range(B):
        n = min(len(seqs[b]), T)
        ids[b, :n] = seqs[b][:n]
        targets[b, :len(tgts[b][:T])] = tgts[b][:T]
    return ids, targets, lengths
