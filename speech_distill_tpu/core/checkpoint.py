"""Orbax checkpointing of train state + HF-compatible export.

The reference delegates checkpointing to HF Trainer (epoch saves,
save_total_limit=3, load_best_at_end — train.py:341-345); here Orbax manages
the pytree state (trainable + opt state + step) with the same retention
policy, and :func:`export_hf` folds LoRA and writes an HF-style directory so
reference users can consume TPU-produced artifacts.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


class CheckpointManager:
    """Thin wrapper: save/restore (state pytree, host metadata)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = directory
        self._mgr = _manager(directory, max_to_keep)

    def save(self, step: int, state, metadata: Optional[Dict[str, Any]] = None,
             force: bool = False):
        import orbax.checkpoint as ocp
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **({"metadata": ocp.args.JsonSave(metadata)} if metadata else {}))
        self._mgr.save(step, args=args, force=force)

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)))
        return restored["state"]

    def close(self):
        self._mgr.close()


def export_hf(params: Dict[str, Any], cfg, out_dir: str,
              extra_config: Optional[Dict[str, Any]] = None):
    """Write an HF-style model dir (config.json + model.safetensors) from a
    plain (merged) parameter pytree."""
    from safetensors.numpy import save_file
    from speech_distill_tpu.models.hf_loader import to_state_dict

    os.makedirs(out_dir, exist_ok=True)
    state = to_state_dict(params, cfg)
    # safetensors serializes raw buffers: transposed views must be made
    # contiguous or they round-trip as transposed data
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    save_file(state, os.path.join(out_dir, "model.safetensors"))
    hf_cfg = {
        "architectures": ["Qwen3ForCausalLM"],
        "model_type": "qwen3",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "head_dim": cfg.head_dim,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "torch_dtype": "bfloat16",
        "bos_token_id": cfg.bos_token_id,
        "eos_token_id": cfg.eos_token_id,
    }
    hf_cfg.update(extra_config or {})
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
