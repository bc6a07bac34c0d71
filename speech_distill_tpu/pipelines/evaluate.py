"""Distilled-model quality evaluation CLI.

Measures the distilled *product* on held-out data — something neither the
reference nor the train loop does (the reference's only quality signal is
train-time sub-loss logging, train.py:107-114): teacher-student top-1 /
top-K agreement, KL(teacher||student) at T=1, and student/teacher CE, all
sliced to speech-token positions vs all attended positions
(distill/evaluate.py), plus an optional end-to-end audio smoke — the
distilled student generates speech tokens under the production RAS sampler
and drives the flow + HiFT stack; the wav must have the exact expected
duration, be finite, and carry non-degenerate energy.

Emits ONE JSON artifact per evaluated checkpoint.

Usage:
  python -m speech_distill_tpu evaluate \
      --student_model distilled_model/final_model \
      --teacher_model Soul-AILab/SoulX-Podcast-1.7B-dialect \
      --dataset_path processed_dataset [--smoke]

With a dataset carrying ``teacher_top_k_v/i`` columns (the extract_logits
output) the teacher model is not needed: metrics run against the stored
top-K artifacts (the same view the sparse KD loss trains against).
``--test_size`` replays the train CLI's held-out split (same seed), so
evaluation runs on data the checkpoint never saw.
"""
from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    from speech_distill_tpu.pipelines.common import add_template_args

    p = argparse.ArgumentParser(
        description="Evaluate a distilled student against its teacher.")
    p.add_argument("--student_model", type=str, required=True,
                   help="distilled checkpoint dir (train CLI final_model)")
    p.add_argument("--teacher_model", type=str, default=None,
                   help="teacher checkpoint; omit when the dataset carries "
                        "stored teacher_top_k_v/i artifacts")
    p.add_argument("--teacher_family", type=str, default="qwen3",
                   choices=["qwen3", "cosyvoice2"])
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--max_length", type=int, default=512)
    add_template_args(p)
    p.add_argument("--test_size", type=int, default=10,
                   help="held-out rows, split with the train CLI's seed so "
                        "this is the data the checkpoint never saw "
                        "(0: evaluate the whole dataset)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_batches", type=int, default=0, help="0 = all")
    p.add_argument("--agree_k", type=int, default=10,
                   help="K for top-K agreement")
    p.add_argument("--pad_to_multiple_of", type=int, default=128)
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel size (0: all remaining devices; "
                        "batch_size must divide by it)")
    p.add_argument("--output", type=str, default=None,
                   help="JSON artifact path (default: "
                        "<student_model>/eval_quality.json)")
    # ---- e2e audio smoke -------------------------------------------------
    p.add_argument("--smoke", action="store_true",
                   help="generate speech tokens from the student (RAS "
                        "sampler) and synthesize a wav through flow+HiFT; "
                        "checks duration/finiteness/energy")
    p.add_argument("--smoke_max_tokens", type=int, default=60)
    p.add_argument("--flow_model", type=str, default=None,
                   help="flow.pt torch checkpoint (omit: randomly "
                        "initialized flow — plumbing/duration check only)")
    p.add_argument("--hift_model", type=str, default=None)
    p.add_argument("--smoke_tiny", action="store_true",
                   help="scaled-down random flow/HiFT (test rigs)")
    p.add_argument("--smoke_wav", type=str, default=None,
                   help="also write the smoke wav here")
    return p


def _smoke_flow_hift(config, flow_vocab: int):
    """(flow_cfg, flow_params, hift_cfg, hift_params) — converted from
    torch checkpoints when given, random-init otherwise."""
    import jax
    from speech_distill_tpu.models import flow as flow_lib
    from speech_distill_tpu.models import flow_encoder
    from speech_distill_tpu.models import hift as hift_lib

    if config.smoke_tiny:
        enc = flow_encoder.FlowEncoderConfig(
            input_size=16, output_size=16, attention_heads=2,
            linear_units=32, num_blocks=1, num_up_blocks=1)
        flow_cfg = flow_lib.FlowConfig(
            input_size=16, output_size=8, spk_embed_dim=6,
            vocab_size=max(flow_vocab, 2), n_timesteps=2,
            est_in_channels=32, est_channels=16, est_n_blocks=1,
            est_num_mid_blocks=1, est_num_heads=2, est_head_dim=8,
            encoder=enc)
        hift_cfg = hift_lib.HiFTConfig(
            in_channels=8, base_channels=16, nb_harmonics=2,
            resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
            source_resblock_kernel_sizes=(3, 3, 3),
            source_resblock_dilations=((1,), (1,), (1,)),
            f0_cond_channels=8)
    else:
        flow_cfg = flow_lib.FlowConfig()
        hift_cfg = hift_lib.HiFTConfig()

    if config.flow_model:
        import torch
        state = torch.load(config.flow_model, map_location="cpu",
                           weights_only=True)
        flow_params = flow_lib.convert_torch_state(state, flow_cfg)
        flow_src = "checkpoint"
    else:
        flow_params = flow_lib.init_params(jax.random.PRNGKey(1), flow_cfg)
        flow_src = "random"
    if config.hift_model:
        import torch
        state = torch.load(config.hift_model, map_location="cpu",
                           weights_only=True)
        hift_params = hift_lib.convert_torch_state(state, hift_cfg)
        hift_src = "checkpoint"
    else:
        hift_params = hift_lib.init_params(jax.random.PRNGKey(2), hift_cfg)
        hift_src = "random"
    return flow_cfg, flow_params, hift_cfg, hift_params, flow_src, hift_src


def run_smoke(config, s_cfg, s_params, prompt_ids) -> dict:
    """End-to-end audio smoke: student decode -> flow -> HiFT -> checks.

    Reference anchor: the forward_tts chain (soulxpodcast.py:145-250). The
    sampler is the production one (RAS, reference defaults scaled to the
    model's stop token)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from speech_distill_tpu.core.config import SamplingParams
    from speech_distill_tpu.infer.engine import DecodeEngine
    from speech_distill_tpu.models import flow as flow_lib
    from speech_distill_tpu.models import hift as hift_lib

    eos = s_cfg.eos_token_id
    sp = SamplingParams(max_tokens=config.smoke_max_tokens,
                        stop_token_ids=(eos,),
                        top_k=min(100, s_cfg.vocab_size))
    max_len = 1 << (len(prompt_ids)
                    + config.smoke_max_tokens + 1).bit_length()
    eng = DecodeEngine(s_params, s_cfg, sp, max_len=max(max_len, 512),
                       prefill_bucket=16, cache_dtype=jnp.float32)
    gen = eng.generate([int(t) for t in prompt_ids])["token_ids"]
    offset = s_cfg.speech_token_offset
    flow_tokens = [t - offset for t in gen if t >= offset and t != eos]
    result = {"generated_tokens": len(gen),
              "speech_tokens": len(flow_tokens)}
    if not flow_tokens:
        result["status"] = "no_speech_tokens"
        return result

    flow_cfg, flow_params, hift_cfg, hift_params, fsrc, hsrc = \
        _smoke_flow_hift(config, flow_vocab=max(flow_tokens) + 1)
    flow_tokens = [min(t, flow_cfg.vocab_size - 1) for t in flow_tokens]
    n = len(flow_tokens)
    tok = jnp.asarray(np.asarray(flow_tokens, np.int32)[None])
    mels, mel_lens = flow_lib.forward_flow(
        flow_params, tok, jnp.asarray([n], jnp.int32),
        jnp.zeros((1, 0, flow_cfg.output_size), jnp.float32),
        jnp.asarray([0], jnp.int32),
        jnp.ones((1, flow_cfg.spk_embed_dim), jnp.float32), flow_cfg,
        rng=jax.random.PRNGKey(0))
    wav, _ = hift_lib.forward(hift_params, mels, hift_cfg,
                              rng=jax.random.PRNGKey(3))
    wav = np.asarray(wav[0])
    expected = n * flow_cfg.token_mel_ratio * hift_cfg.upsample_scale
    rms = float(np.sqrt(np.mean(np.square(wav)))) if wav.size else 0.0
    result.update({
        "flow_weights": fsrc, "hift_weights": hsrc,
        "wav_samples": int(wav.shape[0]),
        "expected_samples": int(expected),
        "duration_s": wav.shape[0] / hift_cfg.sampling_rate,
        "rms": rms,
        "finite": bool(np.isfinite(wav).all()),
        "duration_exact": int(wav.shape[0]) == int(expected),
        "status": "ok" if (np.isfinite(wav).all() and rms > 1e-6
                           and wav.shape[0] == expected) else "failed",
    })
    if config.smoke_wav:
        from scipy.io.wavfile import write as wav_write
        wav_write(config.smoke_wav, hift_cfg.sampling_rate,
                  (np.clip(wav, -1, 1) * 32767).astype(np.int16))
    return result


def evaluate(config) -> dict:
    import jax
    import numpy as np
    from speech_distill_tpu.core.config import MeshConfig, parse_prefix
    from speech_distill_tpu.data.collator import DistillCollator
    from speech_distill_tpu.data.template import align_prefixes
    from speech_distill_tpu.distill import evaluate as ev
    from speech_distill_tpu.models.hf_loader import load_pretrained
    from speech_distill_tpu.parallel import mesh as meshlib
    from speech_distill_tpu.parallel import sharding
    from speech_distill_tpu.pipelines.common import (load_hf_dataset,
                                                     load_tokenizer)

    tokenizer = load_tokenizer(config.student_model, config.pad_token)
    dataset = load_hf_dataset(config.dataset_path)
    is_preprocessed = "student_input_ids" in dataset.column_names \
        or "input_ids" in dataset.column_names
    has_topk = "teacher_top_k_v" in dataset.column_names

    # replay the train CLI's split (same seed) -> truly held-out rows
    if config.test_size > 0 and len(dataset) > config.test_size:
        dataset = dataset.train_test_split(
            test_size=config.test_size, seed=42)["test"]

    if not is_preprocessed:
        from speech_distill_tpu.pipelines.prepare_dataset import \
            make_dual_processor
        teacher_prefix = parse_prefix(config.teacher_prefix)
        student_prefix = parse_prefix(config.student_prefix)
        teacher_prefix, student_prefix = align_prefixes(
            teacher_prefix, student_prefix, tokenizer)
        dual = make_dual_processor(tokenizer, teacher_prefix,
                                   student_prefix, config)
        dataset = dataset.map(dual, batched=True, desc="process")

    s_cfg, s_params = load_pretrained(config.student_model)
    dp = config.dp or len(jax.devices()) // config.tp
    if config.batch_size % dp:
        raise ValueError(f"--batch_size {config.batch_size} must divide "
                         f"by dp={dp} (pass --dp explicitly)")
    mesh = meshlib.make_mesh(MeshConfig(dp=dp, tp=config.tp),
                             devices=jax.devices()[:dp * config.tp])
    meshlib.set_active_mesh(mesh)
    s_params = sharding.shard_params(mesh, s_params, s_cfg)

    mode = "precomputed" if has_topk else "online"
    teacher_params = teacher_forward = t_cfg = None
    if mode == "online":
        if not config.teacher_model:
            raise ValueError("--teacher_model required (dataset has no "
                             "stored teacher_top_k_v/i artifacts)")
        if config.teacher_family == "cosyvoice2":
            import torch
            from speech_distill_tpu.models import cosyvoice2 as cv2
            cv_cfg = cv2.CosyVoice2Config()
            state = torch.load(config.teacher_model, map_location="cpu",
                               weights_only=True)
            teacher_params = cv2.convert_torch_state(state, cv_cfg)
            teacher_forward = cv2.make_teacher_forward(cv_cfg)
            t_cfg = cv_cfg.backbone
            teacher_params = dict(
                teacher_params,
                backbone=sharding.shard_params(
                    mesh, teacher_params["backbone"], t_cfg))
        else:
            t_cfg, teacher_params = load_pretrained(config.teacher_model)
            teacher_params = sharding.shard_params(mesh, teacher_params,
                                                   t_cfg)
        step = ev.make_agreement_step(s_cfg, t_cfg, k=config.agree_k,
                                      teacher_forward=teacher_forward)
    else:
        step = ev.make_sparse_agreement_step(s_cfg, k=config.agree_k)

    collator = DistillCollator(
        pad_token_id=tokenizer.pad_token_id,
        speech_bos_id=tokenizer.encode(
            config.speech_bos, add_special_tokens=False)[0],
        pad_to_multiple_of=config.pad_to_multiple_of,
        emit_speech_mask=True)

    sums, n_batches, n_rows = None, 0, 0
    bs = config.batch_size
    for i0 in range(0, len(dataset) - bs + 1, bs):
        batch = collator([dataset[i] for i in range(i0, i0 + bs)])
        batch = sharding.shard_batch(mesh, batch, microbatched=False)
        s = jax.device_get(step(s_params, teacher_params, batch)
                           if mode == "online" else step(s_params, batch))
        sums = s if sums is None else {k: sums[k] + s[k] for k in s}
        n_batches += 1
        n_rows += bs
        if config.max_batches and n_batches >= config.max_batches:
            break
    if sums is None:
        raise ValueError(f"dataset has fewer than {bs} rows")

    report = {
        "student_model": config.student_model,
        "teacher_model": config.teacher_model,
        "dataset": config.dataset_path,
        "mode": mode,
        "rows": n_rows,
        "metrics": ev.finalize_metrics(sums, config.agree_k),
    }

    if config.smoke:
        # prompt = the first held-out row's student ids up to (and incl.)
        # the speech span start — the exact production generation prompt
        row = dataset[0]
        ids = row.get("student_input_ids", row.get("input_ids"))
        smask = None
        b0 = collator([row])
        if "speech_token_mask" in b0:
            m = np.asarray(b0["speech_token_mask"][0])
            nz = np.nonzero(m)[0]
            smask = int(nz[0]) if nz.size else None
        cut = (smask + 1) if smask is not None else len(ids)
        report["smoke"] = run_smoke(config, s_cfg,
                                    jax.device_get(s_params), ids[:cut])

    out_path = config.output or os.path.join(
        config.student_model, "eval_quality.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    m = report["metrics"]
    for sl in ("all", "speech"):
        d = m[sl]
        if d["positions"]:
            print(f"[{sl}] n={d['positions']} "
                  f"top1={d['top1_agreement']:.4f} "
                  f"top{config.agree_k}={d[f'top{config.agree_k}_agreement']:.4f} "
                  f"kl={d['kl_t1']:.4f} "
                  f"ce_s={d['student_ce'] if d['student_ce'] is not None else float('nan'):.4f}")
    if "smoke" in report:
        print(f"[smoke] {report['smoke'].get('status')} "
              f"({report['smoke'].get('speech_tokens', 0)} speech tokens, "
              f"{report['smoke'].get('duration_s', 0):.2f}s)")
    print(f"Wrote {out_path}")
    return report


def main(argv=None):
    config = build_parser().parse_args(argv)
    evaluate(config)


if __name__ == "__main__":
    main()
