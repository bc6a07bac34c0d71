"""Inference dataset: synthetic wav files -> prompt features."""
import json
import numpy as np
import pytest
from scipy.io.wavfile import write as wav_write

from speech_distill_tpu.infer.dataloader import (PodcastDataset, SPK_DICT,
                                                 TASK_PODCAST)
from tests.test_data import make_tokenizer


def _write_wav(path, seconds=0.6, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    data = (rng.normal(size=int(sr * seconds)) * 0.1 * 32767).astype(np.int16)
    wav_write(str(path), sr, data)


def fake_spk_emb(feat):
    # deterministic stand-in for the CAM++ onnx model
    return feat.mean(axis=0)[:8]


def test_podcast_dataset_item(tmp_path):
    wav1 = tmp_path / "a.wav"
    wav2 = tmp_path / "b.wav"
    _write_wav(wav1, seed=1)
    _write_wav(wav2, seconds=0.4, seed=2)

    datalist = tmp_path / "data.jsonl"
    datalist.write_text(json.dumps({
        "key": "u1",
        "prompt_text": ["hello there", "hi"],
        "prompt_wav": [str(wav1), str(wav2)],
        "text": ["how are you", "fine thanks"],
        "spk": [0, 1],
    }) + "\n")

    tok = make_tokenizer()
    ds = PodcastDataset(tok, str(datalist), spk_emb_fn=fake_spk_emb)
    assert len(ds) == 1
    item = ds[0]
    assert item is not None
    # two speakers -> two of everything
    assert len(item["prompt_text_tokens"]) == 2
    assert len(item["spk_emb"]) == 2
    assert len(item["mel"]) == 2
    # s3 log-mel is [128, T]; flow mel is [T', 80] with even T'
    assert item["log_mel"][0].shape[0] == 128
    assert item["mel"][0].shape[1] == 80
    assert item["mel"][0].shape[0] % 2 == 0
    # prompt text grammar: task token first (speaker 0 only), speaker tags
    task_ids = tok.encode(TASK_PODCAST)
    assert item["prompt_text_tokens"][0][:len(task_ids)] == task_ids
    spk1_ids = tok.encode(SPK_DICT[1])
    assert item["prompt_text_tokens"][1][:len(spk1_ids)] == spk1_ids
    # dialogue turns tokenized with speaker tags
    assert len(item["text_tokens"]) == 2
    assert item["spks_list"] == [0, 1]


def test_missing_wav_rows_are_skipped(tmp_path):
    wav1 = tmp_path / "a.wav"
    _write_wav(wav1)
    datalist = tmp_path / "data.jsonl"
    rows = [
        {"key": "ok", "prompt_text": ["x"], "prompt_wav": [str(wav1)],
         "text": ["y"]},
        {"key": "missing", "prompt_text": ["x"],
         "prompt_wav": [str(tmp_path / "nope.wav")], "text": ["y"]},
    ]
    datalist.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = PodcastDataset(make_tokenizer(), str(datalist),
                        spk_emb_fn=fake_spk_emb)
    assert len(ds) == 1  # the missing-wav row was dropped with a count


def test_dialect_prompt_fields(tmp_path):
    wav1 = tmp_path / "a.wav"
    _write_wav(wav1)
    datalist = tmp_path / "d.jsonl"
    datalist.write_text(json.dumps({
        "key": "u2", "prompt_text": ["hello"], "prompt_wav": [str(wav1)],
        "text": ["hey"], "spk": [0],
        "dialect_prompt_text": ["<|Yue|>ok la"],
    }) + "\n")
    ds = PodcastDataset(make_tokenizer(), str(datalist),
                        spk_emb_fn=fake_spk_emb)
    item = ds[0]
    assert item["use_dialect_prompt"]
    assert len(item["dialect_prompt_text_tokens"]) == 1
    # dialect_prefix: [task] + per-speaker entries
    assert len(item["dialect_prefix"]) == 2
