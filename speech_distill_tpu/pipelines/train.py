"""Stage-2 KD training CLI.

Reference: train.py:119-596. Flags match 1:1; the engine underneath is the
jitted KD step over a dp x tp mesh instead of HF Trainer.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from speech_distill_tpu.pipelines.common import add_template_args

    p = argparse.ArgumentParser(
        description="Distill a teacher LLM into a student LLM.")
    p.add_argument("--teacher_model", type=str,
                   default="Soul-AILab/SoulX-Podcast-1.7B-dialect")
    p.add_argument("--student_model", type=str,
                   default="./pretrained_models/Qwen3-0.6B")
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./distilled_model")
    p.add_argument("--max_length", type=int, default=512)
    add_template_args(p)
    p.add_argument("--use_lora", action="store_true")
    p.add_argument("--lora_r", type=int, default=32)
    p.add_argument("--lora_alpha", type=int, default=64)
    p.add_argument("--use_rslora", action="store_true")
    p.set_defaults(use_rslora=True)
    p.add_argument("--init_lora_weights", type=str, default="pissa")
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--num_train_epochs", type=int, default=3)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--bf16", action="store_true")
    p.set_defaults(bf16=True)
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.set_defaults(gradient_checkpointing=True)
    p.add_argument("--test_size", type=int, default=10)
    p.add_argument("--report_to", type=str, default="none")
    p.add_argument("--top_k", type=int, default=128)
    p.add_argument("--teacher_family", type=str, default="qwen3",
                   choices=["qwen3", "cosyvoice2"],
                   help="cosyvoice2: split-embedding Qwen2 teacher over the "
                        "unified vocab (reference cosyvoice2/teacher_wrapper.py)")
    p.add_argument("--load_teacher_in_4bit", action="store_true")
    p.add_argument("--load_teacher_in_8bit", action="store_true")
    p.add_argument("--per_device_train_batch_size", type=int, default=4)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--pad_to_multiple_of", type=int, default=128)
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel size (ring attention over the "
                        "sp mesh axis; seq_len must divide by it)")
    p.add_argument("--sp_zigzag", action="store_true",
                   help="zig-zag chunk-pair sequence sharding: balances "
                        "causal attention work across sp ranks and halves "
                        "attention FLOPs vs the contiguous ring "
                        "(seq_len must divide by 2*sp)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel size (GPipe over the layer "
                        "stack; num layers must divide by it)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="microbatches per pipeline step (default 2*pp)")
    p.add_argument("--pp_schedule", choices=["gpipe", "1f1b"],
                   default="gpipe",
                   help="pipeline schedule: gpipe (autodiff through the "
                        "pipelined forward) or 1f1b (hand-scheduled "
                        "backward, activation stash bounded by pp depth "
                        "instead of microbatch count; precomputed-KD "
                        "student step only — the teacher side, if any, "
                        "stays gpipe)")
    p.add_argument("--pp_interleave", type=int, default=1,
                   help="virtual pipeline stages per device (Megatron-"
                        "style interleaved 1F1B; requires --pp_schedule "
                        "1f1b and num layers divisible by "
                        "pp*pp_interleave). Shrinks the pipeline bubble "
                        "by this factor at the cost of as many more "
                        "stashed chunk inputs and ring hops")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard optimizer moments additionally "
                        "over dp (GSPMD reduce-scatters grads into the "
                        "moment shards and all-gathers updated params; "
                        "~2.6 GB of fp32 AdamW state on the 0.6B student "
                        "divides by dp per chip)")
    p.add_argument("--teacher_devices", type=int, default=0,
                   help="disaggregate the online teacher onto its own "
                        "trailing N devices (0: share the student mesh); "
                        "extraction pipelines ahead of the student step")
    p.add_argument("--teacher_tp", type=int, default=1,
                   help="tensor-parallel size of the disaggregated "
                        "teacher mesh")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="multi-host: host:port of process 0's coordination "
                        "service (jax.distributed). Every host runs this "
                        "CLI with the same flags plus its --process_id; "
                        "the mesh then spans all hosts' devices and dp "
                        "gradient collectives ride DCN. Env fallback: "
                        "SDT_COORDINATOR/SDT_NUM_PROCESSES/SDT_PROCESS_ID")
    p.add_argument("--num_processes", type=int, default=None,
                   help="multi-host: total process (host) count")
    p.add_argument("--process_id", type=int, default=None,
                   help="multi-host: this process's rank in [0, "
                        "num_processes)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--shuffle_buffer_size", type=int, default=0,
                   help="0: whole-epoch shuffle (exact permutation, "
                        "O(epoch) host RAM); >0: windowed shuffle buffer "
                        "(streaming, O(buffer) RAM)")
    return p


def train(config) -> None:
    import jax
    from speech_distill_tpu.core.config import (
        DistillConfig, LoraConfig, MeshConfig, parse_prefix)
    from speech_distill_tpu.core.trainer import LoopConfig, batches_from, train_loop
    from speech_distill_tpu.data.collator import DistillCollator
    from speech_distill_tpu.data.template import align_prefixes
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.distill.lora import init_lora
    from speech_distill_tpu.models import qwen3
    from speech_distill_tpu.models.hf_loader import load_pretrained
    from speech_distill_tpu.parallel import mesh as meshlib
    from speech_distill_tpu.parallel import sharding
    from speech_distill_tpu.parallel import multihost
    from speech_distill_tpu.pipelines.common import load_hf_dataset, load_tokenizer
    from speech_distill_tpu.pipelines.prepare_dataset import make_dual_processor

    # multi-host entry: must precede the first backend touch
    multihost.initialize(getattr(config, "coordinator_address", None),
                         getattr(config, "num_processes", None),
                         getattr(config, "process_id", None))

    tokenizer = load_tokenizer(config.student_model, config.pad_token)
    teacher_prefix = parse_prefix(config.teacher_prefix)
    student_prefix = parse_prefix(config.student_prefix)
    teacher_prefix, student_prefix = align_prefixes(
        teacher_prefix, student_prefix, tokenizer)

    dataset = load_hf_dataset(config.dataset_path)
    is_preprocessed = ("student_input_ids" in dataset.column_names
                      and "teacher_input_ids" in dataset.column_names)
    has_topk = "teacher_top_k_v" in dataset.column_names

    if config.test_size > 0 and len(dataset) > config.test_size:
        split = dataset.train_test_split(test_size=config.test_size, seed=42)
        dataset, eval_dataset = split["train"], split["test"]
    else:
        eval_dataset = None

    if not is_preprocessed:
        dual = make_dual_processor(
            tokenizer, teacher_prefix, student_prefix, config)
        dataset = dataset.map(dual, batched=True, desc="process")

    # sample preview (reference train.py:383-418)
    sample = dataset[0]
    s_ids = sample.get("student_input_ids", sample.get("input_ids"))
    t_ids = sample.get("teacher_input_ids")
    print("=" * 50 + "\nSAMPLE DATA PREVIEW\n" + "=" * 50)
    if s_ids is not None:
        print(f"--- STUDENT INPUT ---\nText: "
              f"{tokenizer.decode(s_ids[:100])} ... "
              f"{tokenizer.decode(s_ids[-10:])}")
        print(f"IDs: {list(s_ids[:20])} ... {list(s_ids[-10:])}")
    if t_ids is not None:
        print(f"--- TEACHER INPUT ---\nText: "
              f"{tokenizer.decode(t_ids[:100])} ... "
              f"{tokenizer.decode(t_ids[-10:])}")
        print(f"IDs: {list(t_ids[:20])} ... {list(t_ids[-10:])}")
    print("=" * 50)

    quant = ("int4" if config.load_teacher_in_4bit
             else "int8" if config.load_teacher_in_8bit else "none")
    dcfg = DistillConfig(
        temperature=config.temperature, alpha=config.alpha,
        top_k=config.top_k, teacher_quant=quant,
        learning_rate=config.learning_rate,
        num_train_epochs=config.num_train_epochs,
        warmup_steps=config.warmup_steps,
        per_device_batch_size=config.per_device_train_batch_size,
        gradient_accumulation_steps=config.gradient_accumulation_steps,
        pad_to_multiple_of=config.pad_to_multiple_of,
        shuffle_buffer_size=getattr(config, "shuffle_buffer_size", 0),
        lora=LoraConfig(use_lora=config.use_lora, r=config.lora_r,
                        alpha=config.lora_alpha,
                        use_rslora=config.use_rslora,
                        init_weights=config.init_lora_weights))

    # models
    sp = getattr(config, "sp", 1)
    pp = getattr(config, "pp", 1)
    if sp > 1 and pp > 1:
        raise ValueError("--sp (ring attention) and --pp (pipeline) "
                         "cannot combine; pick one")
    pp_micro = getattr(config, "pp_microbatches", 0) or 2 * pp
    s_cfg, s_params = load_pretrained(config.student_model)
    if sp > 1:
        # seq-sharded activations + ring attention over the sp axis; must
        # be applied before any forward closure captures the config
        s_cfg = dataclasses.replace(
            s_cfg,
            attn_impl="ring_zigzag" if config.sp_zigzag else "ring")
    pp_inter = max(getattr(config, "pp_interleave", 1), 1)
    if pp_inter > 1 and getattr(config, "pp_schedule", "gpipe") != "1f1b":
        raise ValueError("--pp_interleave > 1 requires --pp_schedule 1f1b")
    if pp > 1:
        s_cfg = dataclasses.replace(s_cfg, pp_microbatches=pp_micro,
                                    pp_interleave=pp_inter)
    mode = "precomputed" if has_topk else (
        "online_dense" if dcfg.use_dense else "online_sparse")
    n_tdev = getattr(config, "teacher_devices", 0)
    disagg = n_tdev > 0 and mode != "precomputed"
    if disagg and jax.process_count() > 1:
        raise ValueError("--teacher_devices (disaggregated teacher) is "
                         "single-host; multi-host runs share the mesh")
    if disagg and mode == "online_dense":
        raise ValueError(
            "--teacher_devices streams sparse top-K artifacts; dense KD "
            "(quantized teacher or top_k<=0) must share the mesh")
    teacher_cfg = teacher_params = None
    teacher_forward = teacher_extract = None
    if mode != "precomputed":
        if config.teacher_family == "cosyvoice2":
            import torch
            from speech_distill_tpu.models import cosyvoice2 as cv2
            cv_cfg = cv2.CosyVoice2Config()
            if sp > 1 and not disagg:
                # a disaggregated teacher mesh has no sp axis; ring only
                # applies when the teacher shares the student mesh
                cv_cfg = dataclasses.replace(
                    cv_cfg, backbone=dataclasses.replace(
                        cv_cfg.backbone,
                        attn_impl="ring_zigzag" if config.sp_zigzag
                        else "ring"))
            if pp > 1 and not disagg \
                    and cv_cfg.backbone.num_hidden_layers % pp == 0:
                cv_cfg = dataclasses.replace(
                    cv_cfg, backbone=dataclasses.replace(
                        cv_cfg.backbone, pp_microbatches=pp_micro))
            state = torch.load(config.teacher_model, map_location="cpu",
                               weights_only=True)
            teacher_params = cv2.convert_torch_state(state, cv_cfg)
            teacher_forward = cv2.make_teacher_forward(cv_cfg)
            if mode == "online_sparse":
                teacher_extract = cv2.make_teacher_extract(
                    cv_cfg, dcfg.top_k, s_cfg.vocab_size,
                    extract=dcfg.online_extract,
                    recall=dcfg.online_topk_recall)
            teacher_cfg = cv_cfg.backbone
        else:
            teacher_cfg, teacher_params = load_pretrained(config.teacher_model)
        if quant != "none":
            from speech_distill_tpu.ops.quant import quantize_params
            if config.teacher_family == "cosyvoice2":
                teacher_params["backbone"] = quantize_params(
                    teacher_params["backbone"],
                    bits=8 if quant == "int8" else 4)
            else:
                teacher_params = quantize_params(
                    teacher_params, bits=8 if quant == "int8" else 4)

    s_devs = t_devs = None
    if disagg:
        from speech_distill_tpu.distill import disaggregate
        s_devs, t_devs = disaggregate.split_devices(n_tdev)
    mesh = meshlib.make_mesh(MeshConfig(tp=config.tp, sp=sp, pp=pp),
                             devices=s_devs)
    meshlib.set_active_mesh(mesh)
    dp = mesh.shape["dp"]
    if sp > 1 and not disagg and teacher_cfg is not None \
            and not teacher_cfg.attn_impl.startswith("ring"):
        teacher_cfg = dataclasses.replace(
            teacher_cfg,
            attn_impl="ring_zigzag" if config.sp_zigzag else "ring")
    if pp > 1 and not disagg and teacher_cfg is not None \
            and teacher_cfg.num_hidden_layers % pp == 0:
        teacher_cfg = dataclasses.replace(teacher_cfg,
                                          pp_microbatches=pp_micro)

    if config.use_lora:
        lora, base = init_lora(jax.random.PRNGKey(dcfg.seed), s_params,
                               s_cfg, dcfg.lora)
    else:
        lora, base = s_params, s_params  # full finetune: trainable == params

    n_examples = len(dataset)
    global_batch = dcfg.per_device_batch_size * dp
    # multi-host: every host collates only ITS shard of each global batch
    # (shuffled_stream host_index split); make_global_batch stitches the
    # local arrays into global dp-sharded jax.Arrays
    host_batch = multihost.local_batch_size(global_batch)
    steps_per_epoch = n_examples // (
        global_batch * dcfg.gradient_accumulation_steps)
    total_steps = config.max_steps or steps_per_epoch * dcfg.num_train_epochs

    opt = train_step.make_optimizer(dcfg.learning_rate, dcfg.warmup_steps,
                                    total_steps)
    state = train_step.init_state(lora, opt)
    base_s = sharding.shard_params(mesh, base, s_cfg)
    teacher_service = None
    if teacher_params is not None:
        t_mesh = mesh
        if disagg:
            t_mesh = meshlib.make_mesh(
                MeshConfig(tp=getattr(config, "teacher_tp", 1)),
                devices=t_devs)
        if config.teacher_family == "cosyvoice2":
            teacher_params = dict(
                teacher_params,
                backbone=sharding.shard_params(
                    t_mesh, teacher_params["backbone"], teacher_cfg))
            teacher_params = {
                k: (v if k == "backbone" else sharding.replicate(t_mesh, v))
                for k, v in teacher_params.items()}
        else:
            teacher_params = sharding.shard_params(t_mesh, teacher_params,
                                                   teacher_cfg)
        if disagg:
            teacher_service = disaggregate.make_teacher_service(
                teacher_params, teacher_cfg, t_mesh, top_k=dcfg.top_k,
                student_vocab_size=s_cfg.vocab_size,
                method=dcfg.online_topk_method,
                recall=dcfg.online_topk_recall,
                extract_fn=teacher_extract, shard=False)
            print(f"Disaggregated teacher: {len(t_devs)} devices "
                  f"(mesh {dict(t_mesh.shape)}), student mesh "
                  f"{dict(mesh.shape)}")
    if config.use_lora:
        lora_s = sharding.shard_lora(mesh, lora)
        state = train_step.TrainState(
            lora_s, sharding.shard_opt_state(
                mesh, state.opt_state,
                sharding.lora_pspecs(lora, pp=sharding.mesh_has_pp(mesh)),
                zero1=config.zero1),
            state.step)

    # a disaggregated teacher turns the student step into the precomputed
    # one: artifacts stream in through pipeline_batches instead of a
    # teacher forward inside the step program
    step_mode = "precomputed" if teacher_service is not None else mode
    step_fn = train_step.make_kd_step(
        s_cfg, dcfg, opt, mode=step_mode, teacher_cfg=teacher_cfg,
        teacher_forward=teacher_forward, teacher_extract=teacher_extract,
        use_lora=config.use_lora,
        pp_schedule=getattr(config, "pp_schedule", "gpipe")
        if pp > 1 else "gpipe")

    collator = DistillCollator(
        pad_token_id=tokenizer.pad_token_id,
        speech_bos_id=tokenizer.encode(
            config.speech_bos, add_special_tokens=False)[0],
        pad_to_multiple_of=dcfg.pad_to_multiple_of)

    def batch_iter(epoch):
        it = batches_from(
            (dataset[i] for i in range(len(dataset))), collator,
            host_batch, dcfg.gradient_accumulation_steps,
            shuffle_seed=dcfg.seed, epoch=epoch,
            shuffle_buffer=dcfg.shuffle_buffer_size or None,
            host_count=jax.process_count(),
            host_index=jax.process_index())
        if teacher_service is not None:
            it = disaggregate.pipeline_batches(it, teacher_service)
        return it

    loop_cfg = LoopConfig(
        num_epochs=dcfg.num_train_epochs, max_steps=config.max_steps,
        logging_steps=dcfg.logging_steps, output_dir=config.output_dir,
        report_to=config.report_to,
        save_total_limit=dcfg.save_total_limit)

    eval_fn = None
    if eval_dataset is not None and len(eval_dataset) > 0:
        if not is_preprocessed:
            eval_dataset = eval_dataset.map(dual, batched=True, desc="eval")
        eval_step = train_step.make_kd_eval_step(
            s_cfg, dcfg, mode=step_mode, teacher_cfg=teacher_cfg,
            teacher_forward=teacher_forward, use_lora=config.use_lora)

        def eval_fn(state):
            import jax.numpy as jnp
            totals, n = None, 0
            # every host streams the FULL eval set (identical batch count
            # on all processes — collectives stay in lockstep) and
            # contributes its dp rows of each batch
            it = batches_from(
                (eval_dataset[i] for i in range(len(eval_dataset))),
                collator, global_batch, 1, drop_last=False)
            if teacher_service is not None:
                it = disaggregate.pipeline_batches(it, teacher_service)
            for hb in it:
                if jax.process_count() > 1:
                    i0 = jax.process_index() * host_batch
                    hb = {k: v[:, i0:i0 + host_batch]
                          for k, v in hb.items()}
                m = eval_step(state.trainable, base_s,
                              None if teacher_service is not None
                              else teacher_params,
                              multihost.make_global_batch(mesh, hb))
                m = jax.device_get(m)
                totals = m if totals is None else \
                    {k: totals[k] + m[k] for k in m}
                n += 1
            return {k: float(v) / max(n, 1) for k, v in totals.items()} \
                if totals else {}

    frozen = (base_s,
              None if teacher_service is not None else teacher_params)
    state = train_loop(
        step_fn, state, frozen, batch_iter, loop_cfg,
        put_batch=lambda b: multihost.make_global_batch(mesh, b),
        eval_fn=eval_fn,
        tokens_per_batch=global_batch * dcfg.gradient_accumulation_steps
        * dcfg.pad_to_multiple_of)

    # export merged model for HF consumers (multi-host: params may be
    # sharded across processes — fetch replicated, write on primary only)
    from speech_distill_tpu.core.checkpoint import export_hf
    from speech_distill_tpu.distill.lora import merge_and_export
    trainable_h = multihost.fetch_replicated(state.trainable)
    if multihost.is_primary():
        final = merge_and_export(multihost.fetch_replicated(base_s),
                                 trainable_h, dcfg.lora) \
            if config.use_lora else trainable_h
        export_hf(jax.device_get(final), s_cfg,
                  os.path.join(config.output_dir, "final_model"))
    tokenizer.save_pretrained(os.path.join(config.output_dir, "final_model"))
    print("Training complete.")


def main(argv=None):
    train(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
