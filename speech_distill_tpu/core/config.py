"""Configuration system: dataclasses + JSON/flag overlay.

Replaces the reference's per-script argparse duplication
(reference: train.py:430-596, stage1.py:350-531, soulxpodcast/config.py:12-142)
with one set of dataclasses shared by every pipeline. Values and defaults
mirror the reference CLI surface exactly so artifacts stay compatible.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field, fields
from typing import Any, Callable, Dict, Optional, Union

Prefix = Union[str, Dict[str, str], Callable[[str, str], str]]


def parse_prefix(prefix_str: Optional[str]) -> Union[str, Dict[str, str]]:
    """Parse a CLI prefix flag: JSON dict string -> dict, else literal string.

    Semantics match reference data.py:11-17.
    """
    if not prefix_str:
        return ""
    try:
        return json.loads(prefix_str)
    except json.JSONDecodeError:
        return prefix_str


def _overlay(cls, *sources: Dict[str, Any]):
    """Build a dataclass from dicts, later sources win, unknown keys dropped."""
    merged: Dict[str, Any] = {}
    for src in sources:
        if src:
            merged.update(src)
    valid = {f.name for f in fields(cls)}
    return cls(**{k: v for k, v in merged.items() if k in valid})


class _JsonOverlayMixin:
    @classmethod
    def from_initial_and_json(cls, initial_values: Optional[Dict[str, Any]] = None,
                              json_file: Optional[str] = None):
        file_data: Dict[str, Any] = {}
        if json_file and os.path.exists(json_file):
            with open(json_file, "r", encoding="utf-8") as f:
                file_data = json.load(f)
        return _overlay(cls, file_data, initial_values or {})

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass
class Qwen3Config(_JsonOverlayMixin):
    """Qwen3 decoder config. Defaults = SoulX-Podcast-1.7B-dialect teacher
    (reference soulxpodcast/config.py:12-43)."""

    vocab_size: int = 159488           # text + speech vocab + 2 (eos, task id)
    hidden_size: int = 2048
    intermediate_size: int = 6144
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    max_position_embeddings: int = 40_960
    tie_word_embeddings: bool = True
    attention_bias: bool = False       # True for Qwen2-family backbones
    qk_norm: bool = True               # False for Qwen2-family backbones
    bos_token_id: int = 151643
    eos_token_id: int = 151675         # speech eos
    speech_token_offset: int = 152927  # first semantic speech token id
    dtype: str = "bfloat16"

    # TPU runtime knobs (no reference equivalent; XLA-facing)
    remat: bool = True                 # jax.checkpoint each layer
    remat_policy: str = "full"         # full | dots (save MXU outputs,
    #                                    recompute only elementwise in bwd)
    scan_layers: bool = True           # stack layers & lax.scan
    attn_impl: str = "auto"            # auto | xla | pallas | ring | ring_zigzag
    pp_microbatches: int = 0           # >0: GPipe-pipeline the layer stack
    #                                    over the mesh's pp axis, splitting
    #                                    the batch into this many
    #                                    microbatches (training fwd only)
    pp_interleave: int = 1             # >1: virtual pipeline stages per
    #                                    device (Megatron-style interleaved
    #                                    1F1B; pp_schedule='1f1b' only) —
    #                                    pipeline bubble / interleave
    logits_dtype: str = "float32"
    head_bwd_dtype: str = "float32"    # lm-head cotangent dtype for the
    #                                    UNFUSED unembed path (stage-1
    #                                    plain loss, eval, head_loss=
    #                                    'unfused'). bf16 measured speed-
    #                                    NEUTRAL on v5e (the fused head
    #                                    ops carry the real win) and costs
    #                                    exact-autodiff grad parity, so
    #                                    exact fp32 is the default

    @property
    def q_dim(self) -> int:
        return self.num_attention_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_key_value_heads * self.head_dim


def qwen2_cosyvoice_backbone(vocab_size: int = 151936) -> Qwen3Config:
    """CosyVoice2's Qwen2-0.5B backbone (reference cosyvoice2/modeling.py:39-97:
    hidden 896, qkv bias, no qk-norm)."""
    return Qwen3Config(
        vocab_size=vocab_size,
        hidden_size=896,
        intermediate_size=4864,
        num_hidden_layers=24,
        num_attention_heads=14,
        num_key_value_heads=2,
        head_dim=64,
        rope_theta=1_000_000.0,
        attention_bias=True,
        qk_norm=False,
        tie_word_embeddings=True,
        max_position_embeddings=32768,
    )


def qwen3_teacher_1p7b() -> Qwen3Config:
    """SoulX-Podcast-1.7B-dialect (reference soulxpodcast/config.py:12-43)."""
    return Qwen3Config()


def qwen3_student_0p6b(vocab_size: int = 159488) -> Qwen3Config:
    """Qwen3-0.6B after vocab expansion (reference prepare_student.py:7-86)."""
    return Qwen3Config(
        vocab_size=vocab_size,
        hidden_size=1024,
        intermediate_size=3072,
        num_hidden_layers=28,
        num_attention_heads=16,
        num_key_value_heads=8,
        head_dim=128,
        tie_word_embeddings=True,
    )


def qwen3_tiny(vocab_size: int = 512, **kw) -> Qwen3Config:
    """Tiny config for tests."""
    base = dict(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        speech_token_offset=vocab_size // 2,
        eos_token_id=vocab_size - 1,
    )
    base.update(kw)
    return Qwen3Config(**base)


# ---------------------------------------------------------------------------
# Distillation / training configs
# ---------------------------------------------------------------------------


@dataclass
class TemplateConfig:
    """Prompt-template grammar knobs (reference train.py:543-577 defaults)."""

    teacher_prefix: Union[str, Dict[str, str]] = "<|task_podcast|><|SPEAKER_0|>"
    student_prefix: Union[str, Dict[str, str]] = ""
    text_bos: str = "<|text_start|>"
    text_eos: str = "<|text_end|>"
    text_prefix: Union[str, Dict[str, str]] = field(
        default_factory=lambda: {"en": "", "zh": "", "yue": "<|Yue|>"})
    speech_bos: str = "<|semantic_token_start|>"
    speech_eos: str = "<|semantic_token_end|>"
    pad_token: str = "<|semantic_token_end|>"
    max_length: Optional[int] = 512


@dataclass
class LoraConfig:
    """LoRA knobs (reference train.py:180-202,474-487 defaults)."""

    use_lora: bool = True
    r: int = 32
    alpha: int = 64
    use_rslora: bool = True
    init_weights: str = "pissa"        # pissa | gaussian | default
    dropout: float = 0.0
    target_modules: tuple = (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")
    # full-rank trained alongside LoRA because of the new vocab rows
    modules_to_save: tuple = ("embed_tokens", "lm_head")


@dataclass
class DistillConfig(_JsonOverlayMixin):
    """Stage-2 KD config (reference train.py defaults)."""

    temperature: float = 2.0
    alpha: float = 0.5
    top_k: int = 128                   # <=0 -> dense distillation
    online_topk_method: str = "approx"  # online extraction: approx | exact
    online_topk_recall: float = 0.95   # approx_max_k recall target; the
    #                                    tokens a lower recall misses are
    #                                    tail entries of the renormalized
    #                                    top-K with negligible KL mass.
    #                                    Measured on v5e: 0.95 is +25%
    #                                    step throughput over 0.99 with a
    #                                    0.01% KD-loss difference
    online_extract: str = "materialized"  # materialized | fused — fused
    #   (chunked scan, never materializes teacher logits) measured ~4x
    #   SLOWER online on v5e (lax.top_k sorts per chunk); materialized
    #   + approx_max_k is the throughput path, fused saves HBM headroom
    teacher_quant: str = "none"        # none | int8 | int4==nf4 (forces dense)
    learning_rate: float = 5e-5
    num_train_epochs: int = 3
    warmup_steps: int = 1000
    per_device_batch_size: int = 4
    gradient_accumulation_steps: int = 4
    logging_steps: int = 10
    save_total_limit: int = 3
    bf16: bool = True
    gradient_checkpointing: bool = True
    seed: int = 42
    pad_to_multiple_of: int = 128      # mandatory static shapes on TPU
    shuffle_buffer_size: int = 0       # 0 -> whole-epoch shuffle (exact
    #   permutation, O(epoch) host RAM); >0 -> windowed shuffle buffer
    #   (O(buffer) RAM, streaming — pod-scale corpora)
    lora: LoraConfig = field(default_factory=LoraConfig)

    @property
    def use_dense(self) -> bool:
        # Quantized teacher => dense distillation (reference train.py:74-79).
        return self.top_k <= 0 or self.teacher_quant != "none"


@dataclass
class Stage1Config(_JsonOverlayMixin):
    """Stage-1 warm-up (reference stage1.py:350-531 defaults)."""

    num_new_tokens: int = 8220
    learning_rate: float = 1e-4
    num_epochs: int = 3
    batch_size: int = 4
    warmup_steps: int = 1000
    weight_decay: float = 0.01
    gradient_accumulation_steps: int = 4
    max_seq_length: int = 4096
    save_steps: int = 500
    logging_steps: int = 50
    use_8bit_optimizer: bool = False
    gradient_checkpointing: bool = True
    seed: int = 42
    pad_to_multiple_of: int = 128


# ---------------------------------------------------------------------------
# Inference configs
# ---------------------------------------------------------------------------


@dataclass
class SamplingParams(_JsonOverlayMixin):
    """Decode sampling params (reference soulxpodcast/config.py:106-119)."""

    temperature: float = 0.6
    repetition_penalty: float = 1.25
    top_k: int = 100
    top_p: float = 0.9
    min_tokens: int = 8
    max_tokens: int = 3000
    stop_token_ids: tuple = (151675,)
    use_ras: bool = True               # Repetition-Aware Sampling (VALL-E 2)
    win_size: int = 25
    tau_r: float = 0.2
    topk_method: str = "exact"         # exact | approx (lax.approx_max_k)


@dataclass
class EngineConfig(_JsonOverlayMixin):
    """TTS engine config (reference soulxpodcast/config.py:121-142)."""

    model: str = ""
    max_model_len: int = 8192
    max_turn_size: int = 10
    turn_tokens_threshold: int = 6192
    prompt_context: int = 2
    history_context: int = 2
    history_text_context: int = 2
    llm: Qwen3Config = field(default_factory=Qwen3Config)
    sampling: SamplingParams = field(default_factory=SamplingParams)

    def __post_init__(self):
        self.max_model_len = min(self.max_model_len,
                                 self.llm.max_position_embeddings)


# ---------------------------------------------------------------------------
# Mesh / parallelism config
# ---------------------------------------------------------------------------


@dataclass
class MeshConfig:
    """Device-mesh layout. The reference has no parallelism (SURVEY §2.5);
    this is a first-class new component: GSPMD dp x tp over ICI."""

    dp: int = -1                       # -1: all remaining devices
    pp: int = 1                        # pipeline parallel (layer stages)
    sp: int = 1                        # sequence/context parallel (ring attn)
    tp: int = 1
    # activation sequence sharding axis rides on tp when enabled
    shard_sequence: bool = False
