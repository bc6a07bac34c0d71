"""Distilled-model quality evaluation (distill/evaluate.py + the evaluate
CLI).

The metric step is proven against a dense numpy oracle (full-vocab
softmax/argmax/rank math recomputed outside JAX), the degenerate
student==teacher case, and dense==sparse equivalence at K=vocab; the CLI
is driven end-to-end on tiny HF artifacts (test_pipelines.py recipe)
including the audio smoke path.
"""
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import qwen3_tiny
from speech_distill_tpu.distill import evaluate as ev
from speech_distill_tpu.models import qwen3


def _setup(vocab=64, B=2, T=12, seed=0):
    cfg = qwen3_tiny(vocab)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    s_params = qwen3.init_params(jax.random.PRNGKey(seed), cfg)
    t_params = qwen3.init_params(jax.random.PRNGKey(seed + 1), cfg)
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, (B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, T - 3:] = 0
    labels = ids.astype(np.int64).copy()
    labels[:, : T // 2] = -100                     # text span masked out
    smask = np.zeros((B, T), np.float32)
    smask[:, T // 2:] = 1.0
    batch = {"input_ids": jnp.asarray(ids),
             "attention_mask": jnp.asarray(mask),
             "labels": jnp.asarray(labels),
             "speech_token_mask": jnp.asarray(smask)}
    return cfg, s_params, t_params, batch


def _oracle_sums(s_logits, t_logits, batch, k):
    """Numpy reimplementation of the dense agreement sums."""
    s = np.asarray(s_logits, np.float64)[:, :-1]
    t = np.asarray(t_logits, np.float64)[:, :-1]
    ids = np.asarray(batch["input_ids"])
    mask = np.asarray(batch["attention_mask"])
    labels = np.asarray(batch["labels"])
    smask = np.asarray(batch["speech_token_mask"])
    target = ids[:, 1:]
    all_m = (mask[:, 1:] * mask[:, :-1]).astype(np.float64)
    speech_m = all_m * (smask[:, 1:] != 0)
    label_m = all_m * (labels[:, 1:] != -100)

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    ls, lt = lsm(s), lsm(t)
    p = np.exp(lt)
    kl = (p * (lt - ls)).sum(-1)
    B, Tm1 = target.shape
    ce_s = np.take_along_axis(-ls, target[..., None], -1)[..., 0]
    ce_t = np.take_along_axis(-lt, target[..., None], -1)[..., 0]
    s1 = s.argmax(-1)
    t1 = t.argmax(-1)
    agree1 = (s1 == t1).astype(np.float64)
    t_at = np.take_along_axis(t, s1[..., None], -1)
    rank = (t > t_at).sum(-1) + ((t == t_at)
                                 & (np.arange(t.shape[-1]) < s1[..., None])
                                 ).sum(-1)
    agreek = (rank < k).astype(np.float64)
    out = {}
    for name, m in (("all", all_m), ("speech", speech_m)):
        out[f"n_{name}"] = m.sum()
        out[f"kl_{name}"] = (kl * m).sum()
        out[f"agree1_{name}"] = (agree1 * m).sum()
        out[f"agreek_{name}"] = (agreek * m).sum()
        lm = m * label_m
        out[f"n_label_{name}"] = lm.sum()
        out[f"ce_s_{name}"] = (ce_s * lm).sum()
        out[f"ce_t_{name}"] = (ce_t * lm).sum()
    return out


def test_dense_agreement_matches_numpy_oracle():
    cfg, s_params, t_params, batch = _setup()
    step = ev.make_agreement_step(cfg, cfg, k=5, chunk=4)  # multi-chunk scan
    sums = jax.device_get(step(s_params, t_params, batch))
    s_logits = qwen3.forward(s_params, batch["input_ids"], cfg,
                             attention_mask=batch["attention_mask"])
    t_logits = qwen3.forward(t_params, batch["input_ids"], cfg,
                             attention_mask=batch["attention_mask"])
    oracle = _oracle_sums(s_logits, t_logits, batch, k=5)
    assert set(oracle) == set(sums)
    for k_ in oracle:
        np.testing.assert_allclose(float(sums[k_]), oracle[k_],
                                   rtol=2e-4, atol=2e-4, err_msg=k_)


def test_identical_models_agree_perfectly():
    cfg, s_params, _, batch = _setup()
    step = ev.make_agreement_step(cfg, cfg, k=5)
    m = ev.finalize_metrics(jax.device_get(step(s_params, s_params, batch)),
                            k=5)
    for sl in ("all", "speech"):
        assert m[sl]["top1_agreement"] == 1.0
        assert m[sl]["top5_agreement"] == 1.0
        assert abs(m[sl]["kl_t1"]) < 1e-5
        # identical models: student CE == teacher CE
        np.testing.assert_allclose(m[sl]["student_ce"], m[sl]["teacher_ce"],
                                   rtol=1e-6)


def test_sparse_matches_dense_at_k_equals_vocab():
    """Stored top-K artifacts at K=V carry the whole teacher distribution:
    agreement/KL/CE from the sparse step must equal the dense step."""
    cfg, s_params, t_params, batch = _setup(vocab=48, T=10)
    t_logits = qwen3.forward(t_params, batch["input_ids"], cfg,
                             attention_mask=batch["attention_mask"])
    lsm = jax.nn.log_softmax(t_logits.astype(jnp.float32), axis=-1)
    v, i = jax.lax.top_k(lsm, cfg.vocab_size)       # fp32 exact artifacts
    sb = dict(batch, teacher_top_k_v=v, teacher_top_k_i=i)
    k = 7
    dense = jax.device_get(
        ev.make_agreement_step(cfg, cfg, k=k)(s_params, t_params, batch))
    sparse = jax.device_get(
        ev.make_sparse_agreement_step(cfg, k=k)(s_params, sb))
    md, ms = ev.finalize_metrics(dense, k), ev.finalize_metrics(sparse, k)
    for sl in ("all", "speech"):
        for key in ("top1_agreement", f"top{k}_agreement", "kl_t1",
                    "student_ce", "teacher_ce"):
            np.testing.assert_allclose(ms[sl][key], md[sl][key],
                                       rtol=5e-3, atol=5e-4,
                                       err_msg=f"{sl}.{key}")


def test_finalize_empty_slice():
    sums = {f"{m}_{sl}": 0.0 for sl in ("all", "speech")
            for m in ("n", "kl", "agree1", "agreek", "n_label",
                      "ce_s", "ce_t")}
    sums["n_all"] = 2.0
    sums["agree1_all"] = 1.0
    m = ev.finalize_metrics(sums, k=10)
    assert m["speech"]["top1_agreement"] is None
    assert m["all"]["top1_agreement"] == 0.5
    assert m["all"]["student_ce"] is None        # no label positions


@pytest.mark.slow
def test_evaluate_cli_end_to_end(tmp_path):
    """CLI on tiny artifacts: online mode (student vs teacher dirs), sparse
    mode (stored top-K), and the audio smoke — one JSON artifact each."""
    datasets = pytest.importorskip("datasets")
    from tests.test_pipelines import make_tiny_model_dir

    student_dir = str(tmp_path / "student")
    teacher_dir = str(tmp_path / "teacher")
    make_tiny_model_dir(student_dir, vocab_size=96, seed=0)
    make_tiny_model_dir(teacher_dir, vocab_size=96, seed=1)

    rng = np.random.default_rng(0)
    rows = {
        "codes": [rng.integers(0, 50, rng.integers(3, 8)).tolist()
                  for _ in range(14)],
        "text": ["hello", "abc", "good day", "xyz"] * 3 + ["hi", "yo"],
        "lang": ["en", "zh", "yue", "en"] * 3 + ["en", "en"],
    }
    raw_dir = str(tmp_path / "raw")
    datasets.Dataset.from_dict(rows).save_to_disk(raw_dir)

    from speech_distill_tpu.pipelines.evaluate import main
    out = str(tmp_path / "quality.json")
    main(["--student_model", student_dir, "--teacher_model", teacher_dir,
          "--dataset_path", raw_dir, "--batch_size", "2", "--dp", "2",
          "--test_size", "4", "--agree_k", "5", "--pad_to_multiple_of",
          "16", "--max_length", "64", "--output", out,
          "--smoke", "--smoke_tiny", "--smoke_max_tokens", "6"])
    rep = json.load(open(out))
    assert rep["mode"] == "online"
    for sl in ("all", "speech"):
        d = rep["metrics"][sl]
        assert d["positions"] > 0
        assert 0.0 <= d["top1_agreement"] <= 1.0
        assert d["top1_agreement"] <= d["top5_agreement"]
        assert d["kl_t1"] > 0          # different random models
    sm = rep["smoke"]
    assert sm["status"] in ("ok", "no_speech_tokens")
    if sm["status"] == "ok":
        assert sm["duration_exact"] and sm["finite"]

    # sparse mode: enrich the processed dataset with stored top-K via the
    # extract CLI, then evaluate without a teacher
    from speech_distill_tpu.pipelines.prepare_dataset import (
        main as prep_main)
    from speech_distill_tpu.pipelines.extract_logits import (
        main as extract_main)
    proc_dir = str(tmp_path / "proc")
    prep_main(["--student_model", student_dir, "--dataset_path", raw_dir,
               "--output_path", proc_dir, "--max_length", "64"])
    enriched_dir = str(tmp_path / "enriched")
    extract_main(["--teacher_model_path", teacher_dir, "--dataset_path",
                  proc_dir, "--output_path", enriched_dir, "--top_k", "8",
                  "--batch_size", "2", "--max_length", "64",
                  "--pad_to_multiple_of", "16"])
    out2 = str(tmp_path / "quality_sparse.json")
    main(["--student_model", student_dir, "--dataset_path", enriched_dir,
          "--batch_size", "2", "--dp", "1", "--test_size", "4",
          "--agree_k", "5", "--pad_to_multiple_of", "16",
          "--max_length", "64", "--output", out2])
    rep2 = json.load(open(out2))
    assert rep2["mode"] == "precomputed"
    assert rep2["metrics"]["all"]["positions"] > 0
