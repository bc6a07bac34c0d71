"""Streaming TTS synthesis: incremental token -> mel -> wav.

The reference ships the full streaming machinery — chunk-causal attention
masks (upsample_encoder.py:43-118, estimator.py:760-792 static_chunk_size),
causal convs, the 3-frame pre-lookahead (upsample_encoder.py:329-365), and
the vocoder NSF source cache (hifigan.py:237-249 cache_source) — but only
ever invokes it with ``streaming=False`` (soulxpodcast.py:419-420): audio
for a turn is synthesized after the whole turn's tokens exist. This module
actually runs that machinery: wav chunks are emitted while the LLM is
still generating, cutting first-audio latency from O(turn) to O(chunk).

Design (the CosyVoice2 streaming recipe, restated for static shapes):

* **Token chunking.** Emission boundaries are multiples of the encoder's
  ``static_chunk_size`` tokens. In streaming mode every attention mask is
  chunk-causal (a frame attends only to keys before the END of its own
  block) and every conv is causal, so the mel frames of a COMPLETED block
  never change as more tokens append — each flow call recomputes the
  full prefix (O(n^2) total, but the per-call cost is one jitted program
  over a bucketed width) and the freshly completed blocks are emitted
  exactly once. The emitted mel is BIT-IDENTICAL to the offline
  streaming=True computation (tests/test_streaming_tts.py).
* **Lookahead.** The pre-lookahead layer reads ``la`` future tokens, so a
  block is only final once ``la`` tokens beyond its boundary exist; the
  final flush encodes everything (zero-padded lookahead), exactly the
  reference's ``finalize=True``.
* **Fixed noise.** The CFM solves from one noise buffer sampled per
  utterance and sliced per call — the ODE trajectory of a frame is
  frame-local, so fixed noise + stable velocity field = stable mel.
* **Vocoder windowing.** HiFT convs are not causal, so chunks are vocoded
  over a small overlap window: the last ``mel_cache_frames`` mel frames
  are re-synthesized with the next chunk, the NSF source is spliced
  through ``cache_source`` (phase continuity), and the overlap region is
  Hamming cross-faded (the fade_in_out of the CosyVoice2 recipe).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Iterator, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.models import flow as flow_lib
from speech_distill_tpu.models import hift as hift_lib


def make_stream_programs(flow_cfg: flow_lib.FlowConfig,
                         hift_cfg: hift_lib.HiFTConfig) -> dict:
    """Jitted flow/vocoder programs shared by every StreamingTokenToWav
    built from the same configs. A fresh ``jax.jit`` per utterance would
    re-trace and re-load each width bucket from the persistent compile
    cache EVERY TURN (~0.5 s per program through the relay — measured 3.0 s
    first-audio latency vs 0.4 s with shared programs); build once, pass to
    every synthesizer."""
    return {
        "flow": jax.jit(partial(flow_lib.forward_flow, cfg=flow_cfg,
                                streaming=True)),
        # incremental variant (StreamingTokenToWav(incremental=True)),
        # split so token widths W and frame buckets F compile
        # independently (~W/bucket cheap encoder compiles + ~log F big
        # solver compiles instead of their product); donate the per-step
        # caches or the multi-GB tree is copied at every program entry
        # (same lesson as the paged-KV pool)
        "flow_enc_inc": jax.jit(partial(flow_lib.encode_flow_tokens,
                                        cfg=flow_cfg)),
        "flow_solve_inc": jax.jit(partial(flow_lib.solve_flow_incremental,
                                          cfg=flow_cfg),
                                  donate_argnames=("caches",)),
        "hift": jax.jit(partial(hift_lib.forward, cfg=hift_cfg)),
    }


def fade_in_out(new: np.ndarray, old_tail: np.ndarray,
                window: np.ndarray) -> np.ndarray:
    """Cross-fade the first ``len(old_tail)`` samples of ``new`` against
    ``old_tail`` with the two halves of ``window`` (rising half on the new
    audio, falling half on the old)."""
    n = old_tail.shape[-1]
    out = new.copy()
    out[..., :n] = new[..., :n] * window[:n] + old_tail * window[n:]
    return out


class StreamingTokenToWav:
    """Incremental speech-token -> waveform synthesizer for ONE utterance.

    ``push(gen_tokens, final)`` takes the FULL list of generated flow
    tokens so far (prompt tokens are fixed at construction) and returns
    the wav chunks newly available at chunk-aligned boundaries; the
    ``final=True`` call flushes everything remaining.
    """

    def __init__(self, flow_params, flow_cfg: flow_lib.FlowConfig,
                 hift_params, hift_cfg: hift_lib.HiFTConfig,
                 prompt_tokens: Sequence[int], prompt_mel: np.ndarray,
                 prompt_mel_len: int, spk_emb: np.ndarray,
                 rng: jax.Array, chunk_tokens: Optional[int] = None,
                 token_bucket: int = 64,
                 mel_cache_frames: Optional[int] = None,
                 max_tokens: int = 4096, programs: Optional[dict] = None,
                 mel_pad_to: Optional[int] = None,
                 incremental: bool = False, inc_max_frames: int = 2048,
                 inc_kv_dtype=jnp.bfloat16):
        self.fp, self.fc = flow_params, flow_cfg
        self.hp, self.hc = hift_params, hift_cfg
        self.prompt_tokens = [int(t) for t in prompt_tokens]
        self.prompt_mel = np.asarray(prompt_mel, np.float32)[None] \
            if np.asarray(prompt_mel).ndim == 2 else np.asarray(
                prompt_mel, np.float32)
        self.prompt_mel_len = int(prompt_mel_len)
        # pad the (length-masked) prompt mel to a fixed frame bucket so
        # sessions with different prompt lengths share one flow-program
        # shape and can be stacked into batched multi-session calls
        # (infer/tts_serve.py) — the batched rows then match the
        # single-session computation (same shapes, identical masked math)
        if mel_pad_to is not None:
            if mel_pad_to < self.prompt_mel.shape[1]:
                raise ValueError(f"mel_pad_to={mel_pad_to} < prompt mel "
                                 f"frames {self.prompt_mel.shape[1]}")
            self.prompt_mel = np.pad(
                self.prompt_mel,
                [(0, 0), (0, mel_pad_to - self.prompt_mel.shape[1]),
                 (0, 0)])
        self.spk_emb = np.asarray(spk_emb, np.float32)
        if self.spk_emb.ndim == 1:
            self.spk_emb = self.spk_emb[None]
        self.la = flow_cfg.pre_lookahead_len
        self.ratio = flow_cfg.token_mel_ratio
        # emission boundaries must complete BOTH chunk masks: chunk must be
        # a multiple of the encoder's (token-level) chunk AND chunk*ratio a
        # multiple of the estimator's (mel-level) chunk — i.e. a multiple
        # of est / gcd(est, ratio) tokens
        enc_c = flow_cfg.encoder.static_chunk_size
        est = flow_cfg.static_chunk_size
        base = math.lcm(enc_c, est // math.gcd(est, self.ratio))
        self.chunk = chunk_tokens or base
        if self.chunk % base != 0:
            raise ValueError(
                f"chunk_tokens={self.chunk} must be a multiple of "
                f"lcm(encoder chunk {enc_c}, estimator chunk {est} / "
                f"gcd(est, ratio {self.ratio})) = {base}")
        self.bucket = token_bucket
        if mel_cache_frames is None:
            mel_cache_frames = 8          # the CosyVoice2 overlap window
        if mel_cache_frames < 1:
            raise ValueError("mel_cache_frames must be >= 1 (the -0: "
                             "slices would invert the hold semantics)")
        self.cache_frames = mel_cache_frames
        self.scale = hift_cfg.upsample_scale
        fade = mel_cache_frames * self.scale
        self._window = np.hamming(2 * fade).astype(np.float32)
        rng, kn, kh = jax.random.split(rng, 3)
        # one noise buffer per utterance, sliced per call (see module doc)
        self._noise = jax.random.normal(
            kn, (1, self.ratio * max_tokens, flow_cfg.output_size),
            jnp.float32)
        self._hift_rng = kh
        # vocoder streaming caches
        self._mel_cache = np.zeros((1, 0, flow_cfg.output_size), np.float32)
        self._source_cache = jnp.zeros((1, 0), jnp.float32)
        self._speech_tail: Optional[np.ndarray] = None
        # mel emitted by the flow but not yet vocoded: the first emitted
        # region after a non-chunk-aligned prompt can be smaller than the
        # hold window — accumulate until a window can both refill the
        # cache and emit >= 1 frame, instead of storing an undersized
        # tail that breaks the next cross-fade
        self._pending_mel = np.zeros((1, 0, flow_cfg.output_size),
                                     np.float32)
        self._mel_done = self.prompt_mel_len   # mel frames already vocoded
        self._enc_done = len(self.prompt_tokens)  # tokens already encoded
        programs = programs or make_stream_programs(flow_cfg, hift_cfg)
        self._flow = programs["flow"]
        self._hift = programs["hift"]
        # incremental flow (models/flow.py per-Euler-step caches): O(n)
        # total flow work instead of the O(n^2/chunk) prefix recompute —
        # per-chunk latency stays flat in turn length. Single-stream only
        # (the batched tts_serve path keeps the recompute form). The bf16
        # KV default drifts the mel ~1e-3 vs the fp32 recompute
        # (inaudible); pass inc_kv_dtype=jnp.float32 for tight parity at
        # 2x cache memory (~6.9 MB/frame at the production config).
        self.incremental = incremental
        if incremental:
            self._inc_max_frames = inc_max_frames
            self._t_past = 0
            self._inc_caches = flow_lib.init_incremental_cache(
                flow_cfg, 1, inc_max_frames, kv_dtype=inc_kv_dtype)
            self._flow_enc_inc = programs["flow_enc_inc"]
            self._flow_solve_inc = programs["flow_solve_inc"]
        self._finished = False

    # -- flow (plan / execute / apply) ---------------------------------------
    #
    # The staged form lets a multi-session coordinator (infer/tts_serve.py)
    # collect every session's job for one tick and run ONE batched device
    # call per shape group; push() composes the same stages for the
    # single-session path, so both paths share all synthesis logic.

    def flow_job(self, gen_tokens: Sequence[int],
                 final: bool = False) -> Optional[dict]:
        """Plan the flow call advancing the stream to ``gen_tokens`` (the
        full generated-token list so far). Returns None when no new chunk
        boundary completed (the final flush may still need vocoding — call
        ``vocode_job`` regardless)."""
        if self._finished:
            raise RuntimeError("push() after final=True")
        total = self.prompt_tokens + [int(t) for t in gen_tokens]
        n = len(total)
        if final:
            self._finished = True
            n_enc = n
        else:
            # encode up to the last chunk boundary with `la` lookahead
            # tokens beyond it
            n_enc = ((n - self.la) // self.chunk) * self.chunk
        if n_enc <= self._enc_done:
            return None
        tokens = total[:min(n, n_enc + self.la)]
        W = -(-max(len(tokens), 1) // self.bucket) * self.bucket
        return {"tokens": tokens, "n_enc": n_enc, "W": W}

    def flow_args(self, job: dict):
        """The per-row device arguments of ``job`` for the shared flow
        program: (tokens [1, W], n [1], prompt_mel, prompt_mel_len [1],
        spk_emb, noise [1, ratio*W, D], enc_len [1]). Rows of one shape
        group stack along axis 0 into a batched call."""
        n, W = len(job["tokens"]), job["W"]
        arr = np.zeros((1, W), np.int32)
        arr[0, :n] = job["tokens"]
        return (arr, np.asarray([n], np.int32), self.prompt_mel,
                np.asarray([self.prompt_mel_len], np.int32), self.spk_emb,
                jax.lax.dynamic_slice_in_dim(self._noise, 0,
                                             self.ratio * W, axis=1),
                np.asarray([job["n_enc"]], np.int32))

    def apply_flow(self, mel: np.ndarray, job: dict) -> None:
        """Fold the flow result (mel [1, ratio*n_enc, 80] — slice a
        batched call's row to the job's encoded region first) back into
        the stream state."""
        self._pending_mel = np.concatenate(
            [self._pending_mel, mel[:, self._mel_done:]], axis=1)
        self._enc_done = job["n_enc"]
        self._mel_done = mel.shape[1]

    def _flow_call_inc(self, job: dict) -> None:
        """Incremental execution of a flow job: encode the (bucketed)
        token prefix, then Euler-solve ONLY the new frames against the
        per-step caches (forward_flow_incremental). Folds the new mel into
        the stream state directly (the offline plan/apply contract hands
        over mel from frame 0; here mel starts at the old write front)."""
        n, W = len(job["tokens"]), job["W"]
        arr = np.zeros((1, W), np.int32)
        arr[0, :n] = job["tokens"]
        f_new = self.ratio * job["n_enc"] - self._t_past
        base = self.ratio * self.chunk
        F = base
        while F < f_new:
            F *= 2
        if self._t_past + F > self._inc_max_frames:
            raise ValueError(
                f"incremental stream over {self._inc_max_frames} frames "
                f"(need {self._t_past + F}); raise inc_max_frames")
        noise_new = jax.lax.dynamic_slice_in_dim(
            self._noise, self._t_past, F, axis=1)
        h = np.asarray(self._flow_enc_inc(
            self.fp, jnp.asarray(arr), jnp.asarray([n], jnp.int32),
            enc_len=jnp.asarray([job["n_enc"]], jnp.int32)))
        need = self._t_past + F
        if h.shape[1] < need:     # final partial chunk: padded rows are
            h = np.pad(h, [(0, 0), (0, need - h.shape[1]), (0, 0)])
        mu_new = h[:, self._t_past:need]
        mel_new, self._inc_caches = self._flow_solve_inc(
            self.fp, jnp.asarray(mu_new),
            jnp.asarray(self.prompt_mel),
            jnp.asarray([self.prompt_mel_len], jnp.int32),
            jnp.asarray(self.spk_emb), caches=self._inc_caches,
            t_past=jnp.asarray(self._t_past, jnp.int32),
            noise_new=noise_new,
            enc_len=jnp.asarray([job["n_enc"]], jnp.int32))
        mel_new = np.asarray(mel_new[:, :f_new])
        start = max(self._mel_done - self._t_past, 0)
        self._t_past += f_new
        self._pending_mel = np.concatenate(
            [self._pending_mel, mel_new[:, start:]], axis=1)
        self._enc_done = job["n_enc"]
        self._mel_done = self._t_past

    def _flow_call(self, job: dict) -> np.ndarray:
        """Single-session execution of a flow job."""
        a = self.flow_args(job)
        mels, _ = self._flow(
            self.fp, jnp.asarray(a[0]), jnp.asarray(a[1]),
            jnp.asarray(a[2]), jnp.asarray(a[3]), jnp.asarray(a[4]),
            noise=a[5], enc_len=jnp.asarray(a[6]))
        return np.asarray(mels[:, :self.ratio * job["n_enc"]])

    # -- vocoder (plan / execute / apply) -------------------------------------

    def vocode_job(self, final: bool = False) -> Optional[dict]:
        """Plan the windowed HiFT call over the pending mel: vocode when
        the window can refill the hold cache AND emit >= 1 frame (always
        on final). Consumes the pending mel; apply_vocode folds the result
        back."""
        have = self._pending_mel.shape[1] + self._mel_cache.shape[1]
        if final:
            if have == 0:
                return None
        elif have <= self.cache_frames or self._pending_mel.shape[1] == 0:
            return None
        mel_in = np.concatenate([self._mel_cache, self._pending_mel],
                                axis=1)
        self._pending_mel = self._pending_mel[:, :0]
        self._hift_rng, sub = jax.random.split(self._hift_rng)
        return {"mel_in": mel_in, "source": self._source_cache,
                "rng": sub, "final": final}

    def apply_vocode(self, wav: np.ndarray, source,
                     job: dict) -> np.ndarray:
        """Cross-fade + cache update for one executed vocode job; returns
        the emitted wav chunk [T]."""
        wav = np.asarray(wav)
        mel_in, final = job["mel_in"], job["final"]
        if self._speech_tail is not None:
            wav = fade_in_out(wav, self._speech_tail, self._window)
        hold = self.cache_frames * self.scale
        if final:
            self._mel_cache = mel_in[:, mel_in.shape[1]:]
            self._speech_tail = None
            return wav[0]
        self._mel_cache = mel_in[:, -self.cache_frames:]
        self._source_cache = source[:, -hold:]
        self._speech_tail = wav[:, -hold:]
        return wav[0, :-hold]

    # -- public -------------------------------------------------------------

    def push(self, gen_tokens: Sequence[int],
             final: bool = False) -> List[np.ndarray]:
        """Advance the stream to ``gen_tokens`` (the full generated-token
        list so far, flow-vocabulary ids). Returns 0+ wav chunks [T]."""
        fj = self.flow_job(gen_tokens, final)
        if fj is not None:
            if self.incremental:
                self._flow_call_inc(fj)
            else:
                self.apply_flow(self._flow_call(fj), fj)
        out: List[np.ndarray] = []
        vj = self.vocode_job(final)
        if vj is not None:
            wav, source = self._hift(self.hp, jnp.asarray(vj["mel_in"]),
                                     rng=vj["rng"],
                                     cache_source=vj["source"])
            out.append(self.apply_vocode(wav, source, vj))
        return out


def stream_tts(llm_engine, flow_params, flow_cfg, hift_params, hift_cfg,
               llm_inputs: Sequence[int], speech_token_offset: int,
               prompt_tokens: Sequence[int], prompt_mel: np.ndarray,
               prompt_mel_len: int, spk_emb: np.ndarray, rng: jax.Array,
               llm_chunk: Optional[int] = None,
               programs: Optional[dict] = None,
               **kw) -> Iterator[np.ndarray]:
    """End-to-end streaming TTS for one turn: LLM token chunks feed the
    incremental synthesizer; yields wav chunks as they complete.

    The trailing token of the generated stream is withheld from the flow
    until the end (it is the EOS in the reference grammar —
    soulxpodcast.py:390-393 drops it before flow)."""
    synth = StreamingTokenToWav(flow_params, flow_cfg, hift_params,
                                hift_cfg, prompt_tokens, prompt_mel,
                                prompt_mel_len, spk_emb, rng,
                                programs=programs, **kw)
    # la + 1 extra tokens must exist past a boundary before it can flush
    # (1 withheld possible-EOS + la lookahead); poll the LLM in chunk-sized
    # pieces so wav chunks appear at a steady cadence
    chunk = llm_chunk or synth.chunk
    gen: List[int] = []
    for new in llm_engine.generate_stream(list(llm_inputs), chunk=chunk):
        gen.extend(new)
        for wav in synth.push([t - speech_token_offset for t in gen[:-1]]):
            yield wav
    for wav in synth.push([t - speech_token_offset for t in gen[:-1]],
                          final=True):
        yield wav
