"""Inference glue: model construction + request preprocessing.

Port of reference soulxpodcast/utils/infer_utils.py:16-161.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional

import numpy as np

from speech_distill_tpu.core.config import (EngineConfig, Qwen3Config,
                                            SamplingParams)
from speech_distill_tpu.utils.commons import set_all_random_seed


def pad_log_mels(log_mels: List[np.ndarray]):
    """[n_mels, T_i] list -> ([B, n_mels, T_max], lens) like
    s3tokenizer.padding."""
    T = max(m.shape[-1] for m in log_mels)
    B = len(log_mels)
    out = np.zeros((B, log_mels[0].shape[0], T), np.float32)
    lens = np.zeros((B,), np.int32)
    for i, m in enumerate(log_mels):
        out[i, :, :m.shape[-1]] = m
        lens[i] = m.shape[-1]
    return out, lens


def pad_mels(mels: List[np.ndarray]):
    """[T_i, 80] list -> [B, T_max, 80] zero-padded."""
    T = max(m.shape[0] for m in mels)
    out = np.zeros((len(mels), T, mels[0].shape[1]), np.float32)
    for i, m in enumerate(mels):
        out[i, :m.shape[0]] = m
    return out


def initiate_model(seed: int, model_path: str, llm_engine: str = "jax",
                   fp16_flow: bool = False, add_task_token: bool = True,
                   add_speaker_id: bool = True, spk_emb_fn=None,
                   kv_cache_dtype: str = "bf16"):
    """Build (SoulXPodcast model, PodcastInferHandler dataset).

    Loads: HF LLM dir (config+safetensors+tokenizer), flow.pt, hift.pt,
    speech tokenizer checkpoint, campplus.onnx (if onnxruntime available).
    Reference: infer_utils.py:16-44. ``llm_engine`` selects the decode
    engine like the reference's hf|vllm switch: "jax" (stateful
    contiguous-cache DecodeEngine, the HF-engine equivalent) or "paged"
    (stateless block-table PagedEngine with prefix caching — the vLLM
    equivalent). ``kv_cache_dtype``: "bf16" or "int8" (paged engine only;
    the quantized-KV-cache serving option)."""
    set_all_random_seed(seed)

    llm_cfg = Qwen3Config.from_initial_and_json(
        json_file=os.path.join(model_path, "soulxpodcast_config.json"))
    config = EngineConfig(model=model_path, llm=llm_cfg)

    from transformers import AutoTokenizer
    from speech_distill_tpu.infer.dataloader import (PodcastInferHandler,
                                                     make_onnx_spk_emb_fn)
    from speech_distill_tpu.infer.engine import DecodeEngine
    from speech_distill_tpu.infer.soulxpodcast import SoulXPodcast
    from speech_distill_tpu.models import flow as flow_lib
    from speech_distill_tpu.models import hift as hift_lib
    from speech_distill_tpu.models.hf_loader import load_pretrained
    from speech_distill_tpu.tokenizer.s3 import S3Config, load_s3_tokenizer
    import torch

    tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=True)
    _, llm_params = load_pretrained(model_path)
    if llm_engine == "paged":
        import jax.numpy as jnp
        from speech_distill_tpu.infer.paged import PagedEngine
        engine = PagedEngine(
            llm_params, llm_cfg, config.sampling,
            max_len=config.max_model_len, seed=seed,
            cache_dtype=(jnp.int8 if kv_cache_dtype == "int8"
                         else jnp.bfloat16))
    else:
        engine = DecodeEngine(llm_params, llm_cfg, config.sampling,
                              max_len=config.max_model_len, seed=seed)

    flow_cfg = flow_lib.FlowConfig()
    flow_state = torch.load(os.path.join(model_path, "flow.pt"),
                            map_location="cpu", weights_only=True)
    flow_params = flow_lib.convert_torch_state(
        {k: v for k, v in flow_state.items()}, flow_cfg)

    hift_cfg = hift_lib.HiFTConfig()
    hift_state = {k.replace("generator.", ""): v for k, v in torch.load(
        os.path.join(model_path, "hift.pt"), map_location="cpu",
        weights_only=True).items()}
    hift_params = hift_lib.convert_torch_state(hift_state, hift_cfg)

    s3 = load_s3_tokenizer(os.path.join(model_path, "speech_tokenizer_v2.pt")
                           if os.path.exists(os.path.join(
                               model_path, "speech_tokenizer_v2.pt"))
                           else None)

    def s3_quantize(mels, lens):
        from speech_distill_tpu.tokenizer.s3 import quantize
        return quantize(s3.params, mels, lens, s3.cfg)

    model = SoulXPodcast(config, engine, s3_quantize, flow_params, flow_cfg,
                         hift_params, hift_cfg, seed=seed)

    if spk_emb_fn is None:
        # JAX CAM++ preferred (a torch state_dict named campplus.pt);
        # fall back to the reference's onnxruntime path when only
        # campplus.onnx is present (dataloader.py:93-102)
        camp_pt = os.path.join(model_path, "campplus.pt")
        if os.path.exists(camp_pt):
            from speech_distill_tpu.models import campplus
            camp_params = campplus.convert_torch_state(
                torch.load(camp_pt, map_location="cpu", weights_only=True))
            spk_emb_fn = campplus.make_spk_emb_fn(camp_params)
        else:
            try:
                spk_emb_fn = make_onnx_spk_emb_fn(model_path)
            except ImportError:
                spk_emb_fn = None
    dataset = PodcastInferHandler(tokenizer, None, spk_emb_fn=spk_emb_fn,
                                  add_task_token=add_task_token,
                                  add_speaker_id=add_speaker_id)
    return model, dataset


def _assemble(data: Dict[str, Any],
              use_dialect_prompt: Optional[bool] = None) -> Dict[str, Any]:
    mels, lens = pad_log_mels(data["log_mel"])
    out = {
        "prompt_mels_for_llm": mels,
        "prompt_mels_lens_for_llm": lens,
        "prompt_text_tokens_for_llm": data["prompt_text_tokens"],
        "text_tokens_for_llm": data["text_tokens"],
        "prompt_mels_for_flow_ori": pad_mels(data["mel"]),
        "prompt_mels_lens_for_flow": np.asarray(data["mel_len"], np.int32),
        "spk_emb_for_flow": np.asarray(data["spk_emb"], np.float32),
        "sampling_params": SamplingParams(use_ras=True, win_size=25,
                                          tau_r=0.2),
        "spk_ids": data["spks_list"],
        "infos": [data["info"]],
    }
    if use_dialect_prompt is not None:
        out["use_dialect_prompt"] = use_dialect_prompt
        if use_dialect_prompt:
            out["dialect_prompt_text_tokens_for_llm"] = \
                data["dialect_prompt_text_tokens"]
            out["dialect_prefix"] = data["dialect_prefix"]
    return out


def process_single_tts_input(dataset, texts, prompt_wav_list,
                             prompt_text_list) -> Dict[str, Any]:
    dataset.update_datasource([{
        "key": "001", "prompt_text": prompt_text_list,
        "prompt_wav": prompt_wav_list, "text": texts}])
    return _assemble(dataset[0])


def process_single_input(dataset, target_text_list, prompt_wav_list,
                         prompt_text_list, use_dialect_prompt,
                         dialect_prompt_text_list) -> Dict[str, Any]:
    """Regex-split ``[S1]``-tagged dialogue lines (infer_utils.py:88-152)."""
    spks, texts = [], []
    for target_text in target_text_list:
        match = re.match(r"(\[S[1-9]\])(.+)", target_text)
        texts.append(match.group(2))
        spks.append(int(match.group(1)[2]) - 1)
    item = {"key": "001", "prompt_text": prompt_text_list,
            "prompt_wav": prompt_wav_list, "text": texts, "spk": spks}
    if use_dialect_prompt:
        item["dialect_prompt_text"] = dialect_prompt_text_list
    dataset.update_datasource([item])
    return _assemble(dataset[0], use_dialect_prompt)


def check_models(model_path: str, inputs: Dict[str, Any]) -> bool:
    if inputs.get("use_dialect_prompt"):
        assert "dialect" in model_path, \
            "Dialect prompt is used, you should use a dialect model."
    return True
