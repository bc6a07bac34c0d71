"""Concurrent multi-session streaming TTS serving.

The reference's TTS product path is strictly one session at a time: vLLM
serves the LLM, but flow+vocoder run B=1 per turn after generation
(soulxpodcast/models/soulxpodcast.py:252-432 forward_longform), so N
podcast sessions synthesize serially. This module serves N sessions
CONCURRENTLY end-to-end: the paged LLM engine decodes all sessions in one
slot pool (infer/paged.py), and at every decode-chunk boundary the
coordinator runs ONE BATCHED flow call and ONE BATCHED vocoder call over
all sessions with fresh chunk-aligned tokens — the estimator and HiFT are
batch-native, so N sessions cost ~one session's dispatch overhead.

Exactness: each session's synthesis is the SAME computation as its
single-session StreamingTokenToWav run on the same token stream — the
plan/apply stages are shared code, batched HiFT rows are bit-equal to the
B=1 call (per-row NSF rng, models/hift.py), and batched flow rows match
to 1-2 ulp (XLA batches the row-independent matmuls; verified in
tests/test_tts_serve.py).

Shape discipline (one compiled program per group shape, amortized across
sessions and ticks):

* flow rows group by padded token width W (token_bucket) and prompt-mel
  frames Tp (mel_pad_to pads every session to one bucket);
* vocoder rows group by (mel frames, source-cache length) — uniform chunk
  cadence makes steady-state rows identical;
* each group executes in power-of-two row sub-batches, so the compile
  cache holds log2(N) row variants per shape instead of N.
"""
from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.infer.streaming_tts import (StreamingTokenToWav,
                                                    make_stream_programs)


class TTSSession:
    """One podcast turn: the LLM prompt plus the acoustic context the
    flow/vocoder condition on (mirrors process_single_input's per-item
    dict, soulxpodcast/utils/dataloader.py)."""

    def __init__(self, llm_ids: Sequence[int],
                 flow_prompt_tokens: Sequence[int],
                 prompt_mel: np.ndarray, prompt_mel_len: int,
                 spk_emb: np.ndarray, rng: jax.Array):
        self.llm_ids = [int(t) for t in llm_ids]
        self.flow_prompt_tokens = [int(t) for t in flow_prompt_tokens]
        self.prompt_mel = np.asarray(prompt_mel, np.float32)
        self.prompt_mel_len = int(prompt_mel_len)
        self.spk_emb = np.asarray(spk_emb, np.float32)
        self.rng = rng


class MultiSessionTTS:
    """Serve N TTS sessions through one PagedEngine with batched
    downstream synthesis ticks.

    ``engine`` is a PagedEngine (or anything with the same
    ``serve(prompts, on_tokens=..., on_chunk=...)`` contract).
    """

    def __init__(self, engine, flow_params, flow_cfg, hift_params,
                 hift_cfg, speech_token_offset: int,
                 programs: Optional[dict] = None,
                 token_bucket: int = 64,
                 mel_pad_to: Optional[int] = None,
                 chunk_tokens: Optional[int] = None,
                 max_tokens: int = 4096,
                 confidence_gate: Optional[float] = None,
                 gate_max_defer: int = 2):
        self.engine = engine
        self.fp, self.fc = flow_params, flow_cfg
        self.hp, self.hc = hift_params, hift_cfg
        self.offset = int(speech_token_offset)
        self.programs = programs or make_stream_programs(flow_cfg, hift_cfg)
        self.token_bucket = token_bucket
        self.mel_pad_to = mel_pad_to
        self.chunk_tokens = chunk_tokens
        self.max_tokens = max_tokens
        # confidence-gated synthesis (consumer of the engine's streamed
        # per-token logprobs): when a tick's fresh tokens have mean
        # logprob below this threshold (nats; e.g. -3.0), DEFER the
        # session's flow/vocode tick so the uncertain run accumulates
        # right-context before being committed to audio — the
        # chunk-causal flow conditions a token's mel on everything up to
        # its chunk boundary, so merging ticks strictly grows the
        # context an uncertain token is vocoded with. ``gate_max_defer``
        # bounds consecutive deferrals (latency stays bounded); the
        # final tick always synthesizes. Requires the engine to stream
        # logprobs (PagedEngine(return_logprobs=True)). Off by default —
        # on the axon relay, merged ticks add (W, mel) shape-group
        # compile diversity.
        self.confidence_gate = confidence_gate
        self.gate_max_defer = int(gate_max_defer)

    # -- batched executors ----------------------------------------------------

    def _run_flow_rows(self, rows: List[tuple]) -> None:
        """One batched flow call over same-shape rows [(synth, job)]."""
        args = [s.flow_args(j) for s, j in rows]
        toks = np.concatenate([a[0] for a in args])
        n = np.concatenate([a[1] for a in args])
        pm = np.concatenate([a[2] for a in args])
        plen = np.concatenate([a[3] for a in args])
        spk = np.concatenate([a[4] for a in args])
        noise = jnp.concatenate([a[5] for a in args])
        enc = np.concatenate([a[6] for a in args])
        mels, _ = self.programs["flow"](
            self.fp, jnp.asarray(toks), jnp.asarray(n), jnp.asarray(pm),
            jnp.asarray(plen), jnp.asarray(spk), noise=noise,
            enc_len=jnp.asarray(enc))
        mels = np.asarray(mels)
        ratio = self.fc.token_mel_ratio
        for b, (s, j) in enumerate(rows):
            s.apply_flow(mels[b:b + 1, :ratio * j["n_enc"]], j)

    def _run_vocode_rows(self, rows: List[tuple]) -> List[np.ndarray]:
        """One batched HiFT call over same-shape rows [(synth, job)];
        returns the emitted wav chunk per row (per-row NSF rngs keep each
        row bit-equal to its single-session call)."""
        mel_in = np.concatenate([j["mel_in"] for _, j in rows])
        src = np.concatenate([np.asarray(j["source"]) for _, j in rows])
        rngs = jnp.stack([j["rng"] for _, j in rows])
        wav, source = self.programs["hift"](
            self.hp, jnp.asarray(mel_in), rng=None,
            cache_source=jnp.asarray(src), per_row_rngs=rngs)
        wav, source = np.asarray(wav), np.asarray(source)
        return [s.apply_vocode(wav[b:b + 1], source[b:b + 1], j)
                for b, (s, j) in enumerate(rows)]

    @staticmethod
    def _pow2_batches(rows: List[tuple]):
        """Split a shape group into power-of-two row sub-batches (bounds
        the compile cache to log2 row variants per shape)."""
        i = 0
        while i < len(rows):
            take = 1 << ((len(rows) - i).bit_length() - 1)
            yield rows[i:i + take]
            i += take

    # -- serving ---------------------------------------------------------------

    def serve(self, sessions: Sequence[TTSSession],
              max_new: Optional[int] = None,
              on_wav=None) -> List[dict]:
        """Run every session's turn to completion; returns per session
        {"wav": [T] float32, "tokens": generated llm ids, "ttfa_s": ...,
        "n_chunks": ..., "gate_deferrals": ...}. ``on_wav(sid,
        wav_chunk)`` optionally streams chunks as they are synthesized.
        With ``confidence_gate`` set, low-confidence ticks are deferred
        (see __init__) and the engine must stream logprobs.

        TTFA here is serve-entry -> first wav chunk of the session, i.e.
        it includes the time the request waits for an LLM slot — the
        end-to-end number a client sees under concurrent load."""
        if self.mel_pad_to is None:
            tp = max((s.prompt_mel.shape[0] if s.prompt_mel.ndim == 2
                      else s.prompt_mel.shape[1]) for s in sessions)
            mel_pad_to = max(-(-max(tp, 1) // 16) * 16, 16)
        else:
            mel_pad_to = self.mel_pad_to
        synths = [StreamingTokenToWav(
            self.fp, self.fc, self.hp, self.hc, s.flow_prompt_tokens,
            s.prompt_mel, s.prompt_mel_len, s.spk_emb, s.rng,
            chunk_tokens=self.chunk_tokens, token_bucket=self.token_bucket,
            max_tokens=self.max_tokens, programs=self.programs,
            mel_pad_to=mel_pad_to) for s in sessions]
        st: List[Dict] = [{"gen": [], "lps": [], "dirty": False,
                           "done": False, "finalized": False, "wavs": [],
                           "n_seen": 0, "defers": 0, "total_defers": 0,
                           "t_first": None} for _ in sessions]
        t0 = time.perf_counter()

        def on_tokens(rid, new, done):
            r = st[rid]
            r["gen"].extend(new)
            r["dirty"] = True
            r["done"] = r["done"] or done

        def on_logprobs(rid, new, done):
            st[rid]["lps"].extend(new)

        def on_chunk():
            # 1. plan + run flow, grouped by (W, mel-frame) shape
            flow_groups = defaultdict(list)
            ticked = []
            for sid, r in enumerate(st):
                if not r["dirty"] or r["finalized"]:
                    continue
                final = r["done"]
                # the trailing generated token is withheld until final:
                # it may be the EOS the reference grammar drops before
                # flow (soulxpodcast.py:390-393)
                toks = [t - self.offset for t in r["gen"][:-1]]
                if self.confidence_gate is not None and not final:
                    # confidence gate: defer this tick (stay dirty) when
                    # the fresh tokens are low-confidence, so they reach
                    # the vocoder with more right-context
                    fresh = r["lps"][r["n_seen"]:len(toks)]
                    if (fresh and sum(fresh) / len(fresh)
                            < self.confidence_gate
                            and r["defers"] < self.gate_max_defer):
                        r["defers"] += 1
                        r["total_defers"] += 1
                        continue
                r["defers"] = 0
                r["n_seen"] = len(toks)
                r["dirty"] = False
                if final:
                    r["finalized"] = True
                job = synths[sid].flow_job(toks, final=final)
                ticked.append(sid)
                if job is not None:
                    flow_groups[job["W"]].append((synths[sid], job))
            for rows in flow_groups.values():
                for sub in self._pow2_batches(rows):
                    self._run_flow_rows(sub)
            # 2. plan + run vocode, grouped by (mel frames, source len)
            voc_groups = defaultdict(list)
            order = []
            for sid in ticked:
                job = synths[sid].vocode_job(final=st[sid]["finalized"])
                if job is not None:
                    key = (job["mel_in"].shape[1],
                           np.asarray(job["source"]).shape[1])
                    voc_groups[key].append((sid, (synths[sid], job)))
            for rows in voc_groups.values():
                for sub in self._pow2_batches(rows):
                    wavs = self._run_vocode_rows([rj for _, rj in sub])
                    order.extend((sid, w)
                                 for (sid, _), w in zip(sub, wavs))
            for sid, wav in order:
                r = st[sid]
                r["wavs"].append(wav)
                if r["t_first"] is None:
                    r["t_first"] = time.perf_counter()
                if on_wav is not None:
                    on_wav(sid, wav)

        kw = ({"on_logprobs": on_logprobs}
              if self.confidence_gate is not None else {})
        outputs = self.engine.serve([s.llm_ids for s in sessions],
                                    max_new=max_new, on_tokens=on_tokens,
                                    on_chunk=on_chunk, **kw)
        # engines without on_chunk pipelining (or zero-chunk tails) still
        # need the final flush
        for sid, r in enumerate(st):
            r["gen"] = outputs[sid]
            r["done"] = True
            if not r["finalized"]:
                r["dirty"] = True
        on_chunk()
        return [{
            "wav": (np.concatenate(r["wavs"]) if r["wavs"]
                    else np.zeros((0,), np.float32)),
            "tokens": r["gen"],
            "n_chunks": len(r["wavs"]),
            "gate_deferrals": r["total_defers"],
            "ttfa_s": (None if r["t_first"] is None
                       else r["t_first"] - t0),
        } for r in st]
