"""SoulXPodcast TTS orchestrator: LLM decode -> flow -> vocoder.

JAX port of reference ``SoulXPodcast``
(soulxpodcast/models/soulxpodcast.py:19-432): single-shot TTS
(forward_tts / forward_tts2) and multi-turn longform synthesis with the
KV-cache history-eviction policy (soulxpodcast.py:345-374).

Components are injected (audio tokenizer params, decode engine, flow/hift
params) so the orchestrator is testable with tiny random models and swaps
cleanly between checkpoints.
"""
from __future__ import annotations

from itertools import chain
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import EngineConfig, SamplingParams
from speech_distill_tpu.infer.engine import DecodeEngine
from speech_distill_tpu.models import flow as flow_lib
from speech_distill_tpu.models import hift as hift_lib


def _flatten(lst):
    if lst and isinstance(lst[0], list):
        return list(chain.from_iterable(lst))
    return list(lst)


class SoulXPodcast:
    def __init__(self, config: EngineConfig, llm_engine: DecodeEngine,
                 s3_quantize, flow_params, flow_cfg: flow_lib.FlowConfig,
                 hift_params, hift_cfg: hift_lib.HiFTConfig,
                 seed: int = 0):
        """s3_quantize(mels [B, n_mels, T], lens [B]) -> (codes, code_lens).

        ``llm_engine`` is any engine exposing ``generate(ids) ->
        {"token_ids": ...}``: the stateful DecodeEngine (caller-held
        KV state per turn) or the stateless PagedEngine (full context per
        turn, incremental via its persistent prefix cache — the
        reference's vLLM serving mode)."""
        self.config = config
        self.llm = llm_engine
        self.s3_quantize = s3_quantize
        self.flow_params = flow_params
        self.flow_cfg = flow_cfg
        self.hift_params = hift_params
        self.hift_cfg = hift_cfg
        self._rng = jax.random.PRNGKey(seed)
        self._flow_fn = jax.jit(
            lambda t, tl, pf, pfl, emb, rng: flow_lib.forward_flow(
                self.flow_params, t, tl, pf, pfl, emb, self.flow_cfg,
                rng=rng))
        self._hift_fn = jax.jit(
            lambda mel, rng: hift_lib.forward(self.hift_params, mel,
                                              self.hift_cfg, rng=rng))

    # -- helpers ------------------------------------------------------------

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _align_prompt(self, speech_tokens: np.ndarray, token_len: int,
                      prompt_mel: np.ndarray):
        """Align prompt speech-token count with the flow prompt mel
        (token*2 vs mel frames; soulxpodcast.py:283-300)."""
        mel_len = prompt_mel.shape[0]
        if token_len * 2 > mel_len:
            tokens = speech_tokens[: mel_len // 2]
            return tokens, prompt_mel, mel_len
        return speech_tokens[:token_len], prompt_mel[:token_len * 2], token_len * 2

    def _token_to_wav(self, speech_tokens: List[int],
                      prompt_speech_token: Sequence[int],
                      prompt_mel: np.ndarray, prompt_mel_len: int,
                      spk_emb: np.ndarray,
                      bucket: int = 64) -> np.ndarray:
        """Flow + vocoder for one turn. Token/mel lengths are bucketed so a
        multi-turn session compiles the flow and HiFT programs once per
        bucket instead of once per turn length."""
        toks = list(prompt_speech_token) + list(speech_tokens)
        n = len(toks)
        width = -(-n // bucket) * bucket
        flow_input = np.zeros((1, width), np.int32)
        flow_input[0, :n] = toks
        flow_len = np.asarray([n], np.int32)
        pf = np.asarray(prompt_mel, np.float32)[None]
        mels, mel_lens = self._flow_fn(
            jnp.asarray(flow_input), jnp.asarray(flow_len), jnp.asarray(pf),
            jnp.asarray([prompt_mel_len], np.int32),
            jnp.asarray(spk_emb[None] if spk_emb.ndim == 1 else spk_emb,
                        jnp.float32),
            self._next_rng())
        # keep the mel bucket-shaped for the vocoder; trim the wav instead
        mel = mels[:, prompt_mel_len:]                       # [1, T_b, 80]
        wav, _ = self._hift_fn(mel, self._next_rng())
        true_mel = int(mel_lens[0]) - prompt_mel_len
        return np.asarray(wav[0])[: true_mel * self.hift_cfg.upsample_scale]

    def _generated_to_flow_tokens(self, token_ids: List[int]) -> List[int]:
        off = self.config.llm.speech_token_offset
        return [t - off for t in token_ids[:-1]]             # drop final eos

    def _ensure_stream_programs(self):
        """Shared jitted flow/vocoder programs for streaming synthesis:
        per-turn jits would re-trace + reload every width bucket each turn
        (streaming_tts.make_stream_programs)."""
        if not hasattr(self, "_stream_programs"):
            from speech_distill_tpu.infer import streaming_tts
            self._stream_programs = streaming_tts.make_stream_programs(
                self.flow_cfg, self.hift_cfg)
        return self._stream_programs

    # -- single-shot TTS ----------------------------------------------------

    def _tts_prepare(self, prompt_mels_for_llm, prompt_mels_lens_for_llm,
                     prompt_mels_for_flow_ori):
        """Shared single-shot preamble: tokenize the prompt audio and align
        the prompt speech tokens with the flow prompt mel."""
        mels = np.asarray(prompt_mels_for_llm, np.float32)
        if mels.ndim == 2:
            mels = mels[None]
        lens = np.atleast_1d(np.asarray(prompt_mels_lens_for_llm, np.int32))
        codes, code_lens = self.s3_quantize(jnp.asarray(mels),
                                            jnp.asarray(lens))
        codes = np.asarray(codes)
        pmel = np.asarray(prompt_mels_for_flow_ori, np.float32)
        if pmel.ndim == 3:
            pmel = pmel[0]
        return self._align_prompt(codes[0], int(code_lens[0]), pmel)

    def forward_tts(self, prompt_mels_for_llm, prompt_mels_lens_for_llm,
                    prompt_text_tokens_for_llm, text_tokens_for_llm,
                    prompt_mels_for_flow_ori, spk_emb_for_flow,
                    sampling_params: Optional[SamplingParams] = None,
                    **kwargs) -> Dict[str, Any]:
        """Reference forward_tts (soulxpodcast.py:145-250)."""
        prompt_tokens, prompt_mel, prompt_mel_len = self._tts_prepare(
            prompt_mels_for_llm, prompt_mels_lens_for_llm,
            prompt_mels_for_flow_ori)

        off = self.config.llm.speech_token_offset
        speech_tokens_i = [int(t) + off for t in prompt_tokens]
        speech_tokens_i.append(self.config.llm.eos_token_id)
        inputs = (_flatten(prompt_text_tokens_for_llm) + speech_tokens_i
                  + _flatten(text_tokens_for_llm))

        out = self.llm.generate(inputs)
        gen = self._generated_to_flow_tokens(out["token_ids"])
        wav = self._token_to_wav(gen, [int(t) for t in prompt_tokens],
                                 prompt_mel, prompt_mel_len,
                                 np.asarray(spk_emb_for_flow, np.float32))
        return {"generated_wavs": [wav]}

    def forward_tts_streaming(self, prompt_mels_for_llm,
                              prompt_mels_lens_for_llm,
                              prompt_text_tokens_for_llm,
                              text_tokens_for_llm,
                              prompt_mels_for_flow_ori, spk_emb_for_flow,
                              llm_chunk: Optional[int] = None,
                              **kwargs):
        """Streaming forward_tts: a generator yielding wav chunks while the
        LLM is still generating (first-audio latency O(chunk) instead of
        O(turn)). Runs the chunk-causal machinery the reference ships but
        never invokes (streaming=False at soulxpodcast.py:419-420); the
        emitted mel is exactly the offline streaming=True computation
        (infer/streaming_tts.py). Requires a token-streaming engine
        (DecodeEngine.generate_stream)."""
        from speech_distill_tpu.infer import streaming_tts

        if not hasattr(self.llm, "generate_stream"):
            raise ValueError("streaming TTS needs a token-streaming engine "
                             "(DecodeEngine.generate_stream)")
        self._ensure_stream_programs()
        prompt_tokens, prompt_mel, prompt_mel_len = self._tts_prepare(
            prompt_mels_for_llm, prompt_mels_lens_for_llm,
            prompt_mels_for_flow_ori)

        off = self.config.llm.speech_token_offset
        speech_tokens_i = [int(t) + off for t in prompt_tokens]
        speech_tokens_i.append(self.config.llm.eos_token_id)
        inputs = (_flatten(prompt_text_tokens_for_llm) + speech_tokens_i
                  + _flatten(text_tokens_for_llm))
        yield from streaming_tts.stream_tts(
            self.llm, self.flow_params, self.flow_cfg, self.hift_params,
            self.hift_cfg, inputs, off, [int(t) for t in prompt_tokens],
            prompt_mel, prompt_mel_len,
            np.asarray(spk_emb_for_flow, np.float32), self._next_rng(),
            llm_chunk=llm_chunk, programs=self._stream_programs)

    def forward_tts2(self, prompt_mels_for_llm, prompt_mels_lens_for_llm,
                     inputs, prompt_mels_for_flow_ori, spk_emb_for_flow,
                     sampling_params: Optional[SamplingParams] = None,
                     **kwargs) -> Dict[str, Any]:
        """Reference forward_tts2 (soulxpodcast.py:59-143): caller supplies
        the fully-assembled LLM input ids."""
        prompt_tokens, prompt_mel, prompt_mel_len = self._tts_prepare(
            prompt_mels_for_llm, prompt_mels_lens_for_llm,
            prompt_mels_for_flow_ori)

        out = self.llm.generate(list(inputs))
        gen = self._generated_to_flow_tokens(out["token_ids"])
        wav = self._token_to_wav(gen, [int(t) for t in prompt_tokens],
                                 prompt_mel, prompt_mel_len,
                                 np.asarray(spk_emb_for_flow, np.float32))
        return {"generated_wavs": [wav]}

    # -- longform multi-turn ------------------------------------------------

    def _longform_prepare(self, prompt_mels_for_llm,
                          prompt_mels_lens_for_llm,
                          prompt_text_tokens_for_llm,
                          prompt_mels_for_flow_ori,
                          use_dialect_prompt=False,
                          dialect_prompt_text_tokens_for_llm=None,
                          dialect_prefix=None):
        """Shared longform setup (soulxpodcast.py:272-335): tokenize prompt
        audio, align prompt mels, assemble per-speaker prompt/history token
        lists (incl. the dialect-prompt pre-generation)."""
        cfg = self.config
        off = cfg.llm.speech_token_offset
        prompt_size = len(prompt_text_tokens_for_llm)
        mels = np.asarray(prompt_mels_for_llm, np.float32)
        lens = np.asarray(prompt_mels_lens_for_llm, np.int32)
        codes, code_lens = self.s3_quantize(jnp.asarray(mels),
                                            jnp.asarray(lens))
        codes = np.asarray(codes)

        prompt_speech_tokens, prompt_mels_flow, prompt_mels_lens_flow = \
            [], [], []
        for i in range(prompt_size):
            pmel = np.asarray(prompt_mels_for_flow_ori[i], np.float32)
            toks, mel_i, mel_len = self._align_prompt(
                codes[i], int(code_lens[i]), pmel)
            prompt_speech_tokens.append([int(t) for t in toks])
            prompt_mels_flow.append(mel_i)
            prompt_mels_lens_flow.append(mel_len)

        prompt_inputs: List[List[int]] = []
        history_inputs: List[List[int]] = []
        for i in range(prompt_size):
            speech_tokens_i = [t + off for t in prompt_speech_tokens[i]]
            speech_tokens_i.append(cfg.llm.eos_token_id)
            if use_dialect_prompt and dialect_prompt_text_tokens_for_llm \
                    and len(dialect_prompt_text_tokens_for_llm[i]) > 0:
                dialect_input = (prompt_text_tokens_for_llm[i]
                                 + speech_tokens_i
                                 + dialect_prompt_text_tokens_for_llm[i])
                if i > 0:
                    dialect_input = dialect_prefix[0] + dialect_input
                gen = self.llm.generate(dialect_input)["token_ids"]
                item = (dialect_prefix[i + 1]
                        + dialect_prompt_text_tokens_for_llm[i] + gen)
                prompt_inputs.append(item)
                history_inputs.append(list(item))
            else:
                prompt_inputs.append(prompt_text_tokens_for_llm[i]
                                     + speech_tokens_i)
                history_inputs.append(prompt_text_tokens_for_llm[i]
                                      + speech_tokens_i)
        return (prompt_speech_tokens, prompt_mels_flow,
                prompt_mels_lens_flow, prompt_inputs, history_inputs)

    def forward_longform_streaming(self, prompt_mels_for_llm,
                                   prompt_mels_lens_for_llm,
                                   prompt_text_tokens_for_llm,
                                   text_tokens_for_llm,
                                   prompt_mels_for_flow_ori,
                                   spk_emb_for_flow,
                                   spk_ids: Optional[List[int]] = None,
                                   use_dialect_prompt: bool = False,
                                   dialect_prompt_text_tokens_for_llm=None,
                                   dialect_prefix=None,
                                   llm_chunk: Optional[int] = None,
                                   **kwargs):
        """Streaming forward_longform: a generator yielding ``(turn_index,
        wav_chunk)`` while each turn's LLM decode is still running. Context
        management (KV reuse + the eviction policy) is identical to
        forward_longform; synthesis per turn runs the chunk-causal
        incremental path (infer/streaming_tts.py). Requires the stateful
        DecodeEngine (token streaming + caller-held cache state)."""
        from speech_distill_tpu.infer import streaming_tts

        if not getattr(self.llm, "stateful", True):
            raise ValueError("streaming longform needs the stateful "
                             "DecodeEngine (generate_stream)")
        programs = self._ensure_stream_programs()
        cfg = self.config
        off = cfg.llm.speech_token_offset
        turn_size = len(text_tokens_for_llm)
        spk_ids = spk_ids or [0] * turn_size
        (prompt_speech_tokens, prompt_mels_flow, prompt_mels_lens_flow,
         prompt_inputs, history_inputs) = self._longform_prepare(
            prompt_mels_for_llm, prompt_mels_lens_for_llm,
            prompt_text_tokens_for_llm, prompt_mels_for_flow_ori,
            use_dialect_prompt, dialect_prompt_text_tokens_for_llm,
            dialect_prefix)
        prompt_size = len(prompt_text_tokens_for_llm)

        inputs = _flatten(prompt_inputs)
        state = None
        pending = list(inputs)
        valid_turn_size = prompt_size

        for i in range(turn_size):
            if (valid_turn_size > cfg.max_turn_size
                    or len(inputs) > cfg.turn_tokens_threshold):
                prompt_text_bound = max(
                    cfg.prompt_context,
                    len(history_inputs) - cfg.history_text_context
                    - cfg.history_context)
                inputs = _flatten(
                    history_inputs[:cfg.prompt_context]
                    + history_inputs[prompt_text_bound:-cfg.history_context]
                    + prompt_inputs[-cfg.history_context:])
                valid_turn_size = (cfg.prompt_context + len(history_inputs)
                                   - prompt_text_bound)
                state = None
                pending = list(inputs)
            valid_turn_size += 1

            inputs = inputs + list(text_tokens_for_llm[i])
            pending = pending + list(text_tokens_for_llm[i])
            if state is None:
                state = self.llm.new_state(1)
            spk = spk_ids[i]
            synth = streaming_tts.StreamingTokenToWav(
                self.flow_params, self.flow_cfg, self.hift_params,
                self.hift_cfg, prompt_speech_tokens[spk],
                prompt_mels_flow[spk], prompt_mels_lens_flow[spk],
                np.asarray(spk_emb_for_flow[spk:spk + 1], np.float32),
                self._next_rng(), programs=programs)
            token_ids: List[int] = []
            for new in self.llm.generate_stream(
                    pending, chunk=llm_chunk or synth.chunk, state=state):
                token_ids.extend(new)
                for wav in synth.push([t - off for t in token_ids[:-1]]):
                    yield i, wav
            state = self.llm.last_stream_state
            for wav in synth.push([t - off for t in token_ids[:-1]],
                                  final=True):
                yield i, wav
            pending = []

            inputs = inputs + token_ids
            prompt_inputs.append(list(text_tokens_for_llm[i]) + token_ids)
            history_inputs.append(list(text_tokens_for_llm[i])[:-1])

    def forward_longform(self, prompt_mels_for_llm, prompt_mels_lens_for_llm,
                         prompt_text_tokens_for_llm: List[List[int]],
                         text_tokens_for_llm: List[List[int]],
                         prompt_mels_for_flow_ori, spk_emb_for_flow,
                         sampling_params: Optional[SamplingParams] = None,
                         spk_ids: Optional[List[int]] = None,
                         use_dialect_prompt: bool = False,
                         dialect_prompt_text_tokens_for_llm=None,
                         dialect_prefix=None,
                         **kwargs) -> Dict[str, Any]:
        """Reference forward_longform (soulxpodcast.py:252-432): multi-turn
        dialogue with KV-cache reuse and the eviction policy — when the
        session exceeds max_turn_size turns or turn_tokens_threshold tokens,
        rebuild the context from (first prompt_context prompts) + (middle
        text-only history window) + (last history_context full turns) and
        start a fresh cache."""
        cfg = self.config
        off = cfg.llm.speech_token_offset
        turn_size = len(text_tokens_for_llm)
        spk_ids = spk_ids or [0] * turn_size
        (prompt_speech_tokens, prompt_mels_flow, prompt_mels_lens_flow,
         prompt_inputs, history_inputs) = self._longform_prepare(
            prompt_mels_for_llm, prompt_mels_lens_for_llm,
            prompt_text_tokens_for_llm, prompt_mels_for_flow_ori,
            use_dialect_prompt, dialect_prompt_text_tokens_for_llm,
            dialect_prefix)
        prompt_size = len(prompt_text_tokens_for_llm)

        generated_wavs = []
        inputs = _flatten(prompt_inputs)
        state = None            # fresh prefill on first turn
        pending = list(inputs)  # ids not yet prefilled into the cache
        valid_turn_size = prompt_size

        for i in range(turn_size):
            if (valid_turn_size > cfg.max_turn_size
                    or len(inputs) > cfg.turn_tokens_threshold):
                prompt_text_bound = max(
                    cfg.prompt_context,
                    len(history_inputs) - cfg.history_text_context
                    - cfg.history_context)
                inputs = _flatten(
                    history_inputs[:cfg.prompt_context]
                    + history_inputs[prompt_text_bound:-cfg.history_context]
                    + prompt_inputs[-cfg.history_context:])
                valid_turn_size = (cfg.prompt_context + len(history_inputs)
                                   - prompt_text_bound)
                state = None
                pending = list(inputs)
            valid_turn_size += 1

            inputs = inputs + list(text_tokens_for_llm[i])
            pending = pending + list(text_tokens_for_llm[i])
            if getattr(self.llm, "stateful", True):
                if state is None:
                    state = self.llm.new_state(1)
                out = self.llm.generate(pending, state=state)
                state = out["state"]
                pending = []
                token_ids = out["token_ids"]
            else:
                # stateless engine (PagedEngine): the full context goes in
                # every turn and the engine's persistent prefix cache makes
                # it incremental — the reference's vLLM serving pattern
                # (llm_engine.py:78-114). Eviction rebuilds above just
                # change `inputs`; no cache state to reset.
                token_ids = self.llm.generate(inputs)["token_ids"]
                pending = []

            inputs = inputs + token_ids
            prompt_inputs.append(list(text_tokens_for_llm[i]) + token_ids)
            history_inputs.append(list(text_tokens_for_llm[i])[:-1])

            spk = spk_ids[i]
            gen = [t - off for t in token_ids[:-1]]
            wav = self._token_to_wav(
                gen, prompt_speech_tokens[spk], prompt_mels_flow[spk],
                prompt_mels_lens_flow[spk],
                np.asarray(spk_emb_for_flow[spk:spk + 1], np.float32))
            generated_wavs.append(wav)
            # generated ids must live in the cache for the next turn; they
            # already do (the decode loop appended them).

        return {"generated_wavs": generated_wavs}
