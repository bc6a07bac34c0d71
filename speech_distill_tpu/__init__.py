"""speech_distill_tpu — a TPU-native speech-LLM distillation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``indiejoseph/speech-distill``: two-stage knowledge distillation of a speech
LLM (SoulX-Podcast-1.7B, a Qwen3 with semantic speech tokens appended to its
vocab) into a small student (Qwen3-0.6B), plus the full TTS inference stack
(LLM decode -> flow-matching mel decoder -> HiFT vocoder) and the audio
front-end / semantic tokenizer.

Design stance (not a port):
  * pure functional models over pytree params, layers stacked for lax.scan
  * explicit ``jax.sharding.Mesh`` (dp/tp axes) with GSPMD collectives
  * static shapes everywhere: bucketed padding, masked (not filtered) losses
  * Pallas kernels for the hot ops (fused lm-head losses, flash attention)
  * Orbax checkpointing; HF-compatible import/export on the host
"""

__version__ = "0.1.0"
