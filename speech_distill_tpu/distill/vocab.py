"""Student vocab expansion: teacher tokenizer + resized embeddings.

Semantics of reference ``expand_student_vocab`` (prepare_student.py:7-86):
the student adopts the *teacher's* tokenizer for perfect ID alignment; new
embedding matrices are initialised with noisy mean (N(0, 1/sqrt(d)) + mean
embedding) and rows for tokens present in both vocabs are copied over.
Host-side numpy — a one-shot offline transform.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def expand_embeddings(old_input: np.ndarray, old_output: np.ndarray,
                      old_vocab: Dict[str, int], new_vocab: Dict[str, int],
                      seed: int = 0) -> Tuple[np.ndarray, np.ndarray, int]:
    """Return (new_input [V', D], new_output [V', D], matched_count)."""
    new_size = len(new_vocab)
    dim = old_input.shape[1]
    old_size = old_input.shape[0]
    rng = np.random.default_rng(seed)

    std = 1.0 / np.sqrt(dim)
    new_input = rng.normal(0.0, std, (new_size, dim)).astype(np.float32)
    new_input += old_input.mean(axis=0, keepdims=True)
    new_output = rng.normal(0.0, std, (new_size, dim)).astype(np.float32)
    new_output += old_output.mean(axis=0, keepdims=True)

    matched = 0
    for token, new_idx in new_vocab.items():
        old_idx = old_vocab.get(token)
        if old_idx is not None and old_idx < old_size and new_idx < new_size:
            new_input[new_idx] = old_input[old_idx]
            new_output[new_idx] = old_output[old_idx]
            matched += 1
    return new_input, new_output, matched


def expand_student_params(params: Dict[str, Any], cfg,
                          old_vocab: Dict[str, int],
                          new_vocab: Dict[str, int], seed: int = 0):
    """Apply :func:`expand_embeddings` to a Qwen3 param pytree.

    Returns (new_params, new_cfg, matched). Tied embeddings use one matrix
    for both input and output (like HF resize on a tied model).
    """
    import dataclasses
    import jax.numpy as jnp

    old_in = np.asarray(params["embed"]["weight"], np.float32)
    old_out = np.asarray(params["lm_head"]["weight"], np.float32) \
        if "lm_head" in params else old_in
    new_in, new_out, matched = expand_embeddings(
        old_in, old_out, old_vocab, new_vocab, seed)

    dt = jnp.dtype(cfg.dtype)
    new_params = dict(params)
    new_params["embed"] = {"weight": jnp.asarray(new_in, dt)}
    if "lm_head" in params:
        new_params["lm_head"] = {"weight": jnp.asarray(new_out, dt)}
    new_cfg = dataclasses.replace(cfg, vocab_size=len(new_vocab))
    return new_params, new_cfg, matched
