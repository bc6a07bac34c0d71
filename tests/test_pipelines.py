"""End-to-end pipeline integration on tiny HF artifacts:

prepare_student (vocab expansion) -> prepare_dataset (dual processing) ->
extract_logits (teacher top-K) -> train (stage-2 KD) -> stage1 warm-up,
all through the CLI mains with reference-matching flags.
"""
import json
import os
import numpy as np
import pytest
import jax

import speech_distill_tpu.models.qwen3 as qwen3
from speech_distill_tpu.core.checkpoint import export_hf
from speech_distill_tpu.core.config import qwen3_tiny

datasets = pytest.importorskip("datasets")


def make_tiny_tokenizer(out_dir, n_speech=50, extra=()):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    vocab = {chr(c): i for i, c in enumerate(range(ord("a"), ord("z") + 1))}
    vocab.update({" ": 26, "?": 27})
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="?"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="?")
    fast.add_tokens(["<|text_start|>", "<|text_end|>",
                     "<|semantic_token_start|>", "<|semantic_token_end|>",
                     "<|task_podcast|>", "<|SPEAKER_0|>", "<|Yue|>",
                     *extra])
    fast.add_tokens([f"<|{i}|>" for i in range(n_speech)])
    fast.pad_token = "<|semantic_token_end|>"
    fast.eos_token = "<|semantic_token_end|>"
    fast.save_pretrained(out_dir)
    return fast


def make_tiny_model_dir(out_dir, vocab_size, seed=0, n_speech=50,
                        extra=()):
    tok = make_tiny_tokenizer(out_dir, n_speech, extra)
    assert len(tok) <= vocab_size, (len(tok), vocab_size)
    cfg = qwen3_tiny(vocab_size)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(seed), cfg)
    export_hf(jax.device_get(params), cfg, out_dir)
    return cfg, tok


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    student_dir = str(root / "student")
    cfg, tok = make_tiny_model_dir(student_dir, vocab_size=96)

    # raw dataset with a precomputed 'codes' column (no audio tokenizer)
    rng = np.random.default_rng(0)
    rows = {
        "codes": [rng.integers(0, 50, rng.integers(3, 8)).tolist()
                  for _ in range(12)],
        "text": ["hello", "abc", "good day", "xyz"] * 3,
        "lang": ["en", "zh", "yue", "en"] * 3,
    }
    raw_dir = str(root / "raw")
    datasets.Dataset.from_dict(rows).save_to_disk(raw_dir)
    return {"root": root, "student": student_dir, "raw": raw_dir,
            "cfg": cfg}


def test_prepare_student_vocab_expansion(tmp_path):
    teacher_dir = str(tmp_path / "teacher")
    student_dir = str(tmp_path / "student_small")
    out_dir = str(tmp_path / "student_big")
    make_tiny_model_dir(teacher_dir, vocab_size=96, seed=1)
    # small student: fewer speech tokens -> smaller vocab
    make_tiny_model_dir(student_dir, vocab_size=48, seed=2, n_speech=10)

    from speech_distill_tpu.pipelines.prepare_student import main
    main(["--teacher-model", teacher_dir, "--student-model", student_dir,
          "--output-dir", out_dir])

    from transformers import AutoTokenizer
    from speech_distill_tpu.models.hf_loader import load_pretrained
    new_tok = AutoTokenizer.from_pretrained(out_dir)
    teacher_tok = AutoTokenizer.from_pretrained(teacher_dir)
    assert new_tok.get_vocab() == teacher_tok.get_vocab()
    cfg2, params2 = load_pretrained(out_dir, dtype="float32")
    assert cfg2.vocab_size == len(teacher_tok.get_vocab())
    # matched rows copied: 'a' keeps its old embedding
    _, old_params = load_pretrained(student_dir, dtype="float32")
    old_id = AutoTokenizer.from_pretrained(student_dir).get_vocab()["a"]
    new_id = teacher_tok.get_vocab()["a"]
    np.testing.assert_allclose(
        np.asarray(params2["embed"]["weight"][new_id], np.float32),
        np.asarray(old_params["embed"]["weight"][old_id], np.float32),
        atol=2e-3)  # bf16 storage rounding


@pytest.mark.slow
def test_prepare_dataset_and_extract_and_train(workspace):
    root = workspace["root"]
    processed = str(root / "processed")
    enriched = str(root / "enriched")
    out_model = str(root / "distilled")

    from speech_distill_tpu.pipelines.prepare_dataset import main as prep
    prep(["--dataset_path", workspace["raw"], "--output_path", processed,
          "--student_model", workspace["student"],
          "--teacher_prefix", "<|task_podcast|><|SPEAKER_0|>",
          "--max_length", "64"])
    ds = datasets.load_from_disk(processed)
    assert "student_input_ids" in ds.column_names
    assert "teacher_input_ids" in ds.column_names
    # prefix alignment: the student's empty prefix is left-padded with pad
    # tokens so both sequences index-align position-by-position
    assert len(ds[0]["teacher_input_ids"]) == len(ds[0]["student_input_ids"])
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(workspace["student"])
    pad_id = tok.pad_token_id
    task_id = tok.get_vocab()["<|task_podcast|>"]
    assert ds[0]["teacher_input_ids"][0] == task_id
    assert ds[0]["student_input_ids"][0] == pad_id
    # tails identical (same text/speech tokens)
    assert ds[0]["teacher_input_ids"][2:] == ds[0]["student_input_ids"][2:]

    from speech_distill_tpu.pipelines.extract_logits import main as extract
    extract(["--teacher_model_path", workspace["student"],
             "--dataset_path", processed, "--output_path", enriched,
             "--top_k", "8", "--batch_size", "4",
             "--pad_to_multiple_of", "16"])
    ds2 = datasets.load_from_disk(enriched)
    assert "teacher_top_k_v" in ds2.column_names
    assert len(ds2[0]["teacher_top_k_v"]) == len(ds2[0]["teacher_input_ids"])
    assert len(ds2[0]["teacher_top_k_v"][0]) == 8

    from speech_distill_tpu.pipelines.train import main as train_main
    train_main(["--dataset_path", enriched,
                "--student_model", workspace["student"],
                "--output_dir", out_model,
                "--use_lora", "--lora_r", "2", "--lora_alpha", "4",
                "--init_lora_weights", "gaussian",
                "--per_device_train_batch_size", "1",
                "--gradient_accumulation_steps", "1",
                "--pad_to_multiple_of", "16",
                "--test_size", "4", "--max_steps", "2",
                "--warmup_steps", "1"])
    assert os.path.exists(os.path.join(out_model, "final_model",
                                       "model.safetensors"))


def test_stage1_pipeline(workspace, tmp_path):
    out = str(tmp_path / "stage1_out")
    from speech_distill_tpu.pipelines.stage1 import main as stage1_main
    stage1_main(["--model_path", workspace["student"],
                 "--dataset_path", workspace["raw"],
                 "--output_dir", out,
                 "--num_epochs", "1", "--batch_size", "1",
                 "--gradient_accumulation_steps", "1",
                 "--max_seq_length", "16", "--num_new_tokens", "50",
                 "--warmup_steps", "1", "--logging_steps", "1",
                 "--save_steps", "100",
                 "--eval_size", "0.25", "--eval_steps", "1",
                 "--eval_batch_size", "1", "--num_workers", "2"])
    assert os.path.exists(os.path.join(out, "final_model",
                                       "model.safetensors"))
    # eval wiring produced eval_loss entries (stage1.py:303-311 semantics)
    import json
    lines = [json.loads(l) for l in
             open(os.path.join(out, "metrics.jsonl"))]
    assert any("eval_loss" in m for m in lines), lines


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_train_disaggregated_teacher(workspace, tmp_path):
    """Online KD through the CLI with --teacher_devices: the teacher
    extracts on its own 4-device mesh, the student trains precomputed-style
    on the other 4."""
    processed = str(tmp_path / "processed")
    out_model = str(tmp_path / "distilled_disagg")

    from speech_distill_tpu.pipelines.prepare_dataset import main as prep
    prep(["--dataset_path", workspace["raw"], "--output_path", processed,
          "--student_model", workspace["student"],
          "--teacher_prefix", "<|task_podcast|><|SPEAKER_0|>",
          "--max_length", "64"])

    from speech_distill_tpu.pipelines.train import main as train_main
    train_main(["--dataset_path", processed,
                "--student_model", workspace["student"],
                "--teacher_model", workspace["student"],
                "--teacher_devices", "4", "--top_k", "8",
                "--output_dir", out_model,
                "--use_lora", "--lora_r", "2", "--lora_alpha", "4",
                "--init_lora_weights", "gaussian",
                "--per_device_train_batch_size", "1",
                "--gradient_accumulation_steps", "1",
                "--pad_to_multiple_of", "16",
                "--test_size", "4", "--max_steps", "2",
                "--warmup_steps", "1"])
    assert os.path.exists(os.path.join(out_model, "final_model",
                                       "model.safetensors"))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("zigzag", [False, True])
def test_train_cli_sequence_parallel(workspace, tmp_path, zigzag):
    """The --sp CLI path end-to-end (ring and zig-zag): online KD over a
    dp x sp mesh through the real argparse surface — guards the config
    plumbing (a NameError in the sp branch once shipped untested because
    only the library path had coverage)."""
    processed = str(tmp_path / f"processed_sp{int(zigzag)}")
    out_model = str(tmp_path / f"distilled_sp{int(zigzag)}")

    from speech_distill_tpu.pipelines.prepare_dataset import main as prep
    prep(["--dataset_path", workspace["raw"], "--output_path", processed,
          "--student_model", workspace["student"],
          "--teacher_prefix", "<|task_podcast|><|SPEAKER_0|>",
          "--max_length", "64"])

    from speech_distill_tpu.pipelines.train import main as train_main
    train_main(["--dataset_path", processed,
                "--student_model", workspace["student"],
                "--teacher_model", workspace["student"],
                "--top_k", "8", "--sp", "2",
                "--output_dir", out_model,
                "--use_lora", "--lora_r", "2", "--lora_alpha", "4",
                "--init_lora_weights", "gaussian",
                "--per_device_train_batch_size", "4",
                "--gradient_accumulation_steps", "1",
                "--pad_to_multiple_of", "16",
                "--test_size", "4", "--max_steps", "2",
                "--warmup_steps", "1"]
               + (["--sp_zigzag"] if zigzag else []))
    assert os.path.exists(os.path.join(out_model, "final_model",
                                       "model.safetensors"))
