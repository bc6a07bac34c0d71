"""Data layer: template grammar, prefix alignment, collator, tokenizer."""
import numpy as np
import pytest

from speech_distill_tpu.data import template
from speech_distill_tpu.data.collator import (
    IGNORE_INDEX, DistillCollator, pad_sequences, speech_token_mask)
from speech_distill_tpu.data.processor import DualProcessor, SpeechDistillProcessor
from speech_distill_tpu.tokenizer.speech_text import SpeechTextTokenizer


class CharTokenizer:
    """Trivial base tokenizer: one id per character (ascii)."""

    pad_token = "#"
    eos_token = "$"

    def encode(self, text, add_special_tokens=False, **kw):
        return [ord(c) % 128 for c in text]

    def decode(self, ids, **kw):
        return "".join(chr(i) for i in ids)


def make_tokenizer(text_vocab=128, n_speech=100):
    return SpeechTextTokenizer(CharTokenizer(), text_vocab_size=text_vocab,
                               num_speech_tokens=n_speech)


# -- template ---------------------------------------------------------------


def test_parse_prefix():
    assert template.parse_prefix("") == ""
    assert template.parse_prefix(None) == ""
    assert template.parse_prefix("abc") == "abc"
    assert template.parse_prefix('{"en": "x"}') == {"en": "x"}


def test_assemble_prompt_grammar():
    s = template.assemble_prompt(" hi ", [3, 14, 0], prefix="P",
                                 text_prefix="Q")
    assert s == ("P<|text_start|>Qhi<|text_end|>"
                 "<|semantic_token_start|><|3|><|14|><|0|>"
                 "<|semantic_token_end|>")


def test_resolve_prefix_forms():
    assert template.resolve_prefix("x") == "x"
    assert template.resolve_prefix({"yue": "Y", "default": "D"}, lang="yue") == "Y"
    assert template.resolve_prefix({"yue": "Y", "default": "D"}, lang="en") == "D"
    assert template.resolve_prefix(lambda t, l: t + l, "a", "b") == "ab"


def test_align_prefixes_string():
    tok = make_tokenizer()
    t, s = template.align_prefixes("abcd", "ab", tok)
    assert len(tok.encode(t)) == len(tok.encode(s))
    assert t == "abcd" and s.endswith("ab") and s.startswith(tok.pad_token)


def test_align_prefixes_dict():
    tok = make_tokenizer()
    t, s = template.align_prefixes({"en": "abc", "zh": "a"}, "xy", tok)
    for k in t:
        assert len(tok.encode(t[k])) == len(tok.encode(s[k]))


# -- tokenizer --------------------------------------------------------------


def test_speech_text_tokenizer_roundtrip():
    tok = make_tokenizer()
    text = "ab<|text_start|>cd<|text_end|><|semantic_token_start|><|5|><|99|><|semantic_token_end|>"
    ids = tok.encode(text)
    assert ids[:2] == [ord("a"), ord("b")]
    assert ids[2] == tok.sos_token_id
    # <|text_end|> is not in the default map -> goes through base tokenizer
    assert tok.speech_token_offset + 5 in ids
    assert tok.speech_token_offset + 99 in ids
    assert ids[-1] == tok.speech_eos_id


def test_speech_text_tokenizer_batch_padding():
    tok = make_tokenizer()
    out = tok(["ab", "abcdef"], padding=True)
    assert len(out["input_ids"][0]) == len(out["input_ids"][1])
    assert out["attention_mask"][0] == [1, 1, 0, 0, 0, 0]


def test_decode_speech_tokens():
    tok = make_tokenizer()
    text = "hi<|semantic_token_start|><|7|><|semantic_token_end|>"
    assert tok.decode(tok.encode(text)) == text


# -- collator ---------------------------------------------------------------


def test_pad_sequences_multiple():
    ids, mask = pad_sequences([[1, 2, 3], [4]], None, pad_token_id=0,
                              pad_to_multiple_of=8)
    assert ids.shape == (2, 8)
    assert list(ids[1]) == [4, 0, 0, 0, 0, 0, 0, 0]
    assert mask.sum() == 4


def test_speech_token_mask_vectorized():
    ids = np.array([[1, 2, 9, 3, 4], [9, 1, 2, 3, 4], [1, 2, 3, 4, 5]])
    m = speech_token_mask(ids, speech_bos_id=9)
    np.testing.assert_array_equal(m, [[0, 0, 1, 1, 1],
                                      [1, 1, 1, 1, 1],
                                      [0, 0, 0, 0, 0]])


def test_collator_labels_and_masks():
    tok = make_tokenizer()
    bos = tok.task_token_id       # <|semantic_token_start|>
    eos = tok.speech_eos_id       # <|semantic_token_end|> == pad token
    feats = [
        {"student_input_ids": [10, 11, bos, 200, 201, eos],
         "student_attention_mask": [1] * 6,
         "teacher_input_ids": [12, 13, bos, 200, 201, eos],
         "teacher_attention_mask": [1] * 6},
        {"student_input_ids": [10, bos, 200, eos],
         "student_attention_mask": [1] * 4,
         "teacher_input_ids": [12, bos, 200, eos],
         "teacher_attention_mask": [1] * 4},
    ]
    col = DistillCollator(pad_token_id=eos, speech_bos_id=bos,
                          pad_to_multiple_of=8)
    batch = col(feats)
    assert batch["input_ids"].shape == (2, 8)
    assert batch["teacher_input_ids"].shape == (2, 8)
    # labels: text positions masked, pad (==speech_eos) masked
    row0 = batch["labels"][0]
    assert list(row0[:2]) == [IGNORE_INDEX, IGNORE_INDEX]      # text
    assert row0[2] == bos
    assert list(row0[3:5]) == [200, 201]
    assert row0[5] == IGNORE_INDEX                              # speech_eos==pad
    assert all(x == IGNORE_INDEX for x in row0[6:])             # padding


def test_collator_teacher_longer_than_student_not_truncated():
    """Teacher rows longer than the student bucket must be preserved
    (reference pads teacher to its own max, data.py:280-328)."""
    tok = make_tokenizer()
    bos = tok.task_token_id
    pad = tok.speech_eos_id
    s = [10, 11, bos, 200, 201, 202, 203, 150]          # exactly bucket=8
    t = s + [204, 205, 206]                              # 3 tokens longer
    feats = [{"student_input_ids": s, "student_attention_mask": [1] * len(s),
              "teacher_input_ids": t, "teacher_attention_mask": [1] * len(t)}]
    col = DistillCollator(pad_token_id=pad, speech_bos_id=bos,
                          pad_to_multiple_of=8)
    batch = col(feats)
    assert batch["input_ids"].shape == (1, 8)
    assert batch["teacher_input_ids"].shape == (1, 16)   # own bucket, no chop
    assert list(batch["teacher_input_ids"][0, :11]) == t
    assert batch["teacher_attention_mask"][0, :11].sum() == 11
    # same-bucket case keeps equal shapes (static-shape fast path)
    feats2 = [{"student_input_ids": s[:5],
               "student_attention_mask": [1] * 5,
               "teacher_input_ids": s[:7],
               "teacher_attention_mask": [1] * 7}]
    b2 = col(feats2)
    assert b2["input_ids"].shape == b2["teacher_input_ids"].shape == (1, 8)


def test_collator_top_k_padding():
    feats = [
        {"student_input_ids": [1, 9, 5], "student_attention_mask": [1, 1, 1],
         "teacher_top_k_v": np.ones((3, 4), np.float16),
         "teacher_top_k_i": np.ones((3, 4), np.int32)},
        {"student_input_ids": [1, 9], "student_attention_mask": [1, 1],
         "teacher_top_k_v": np.ones((2, 4), np.float16) * 2,
         "teacher_top_k_i": np.ones((2, 4), np.int32) * 2},
    ]
    col = DistillCollator(pad_token_id=0, speech_bos_id=9, pad_to_multiple_of=4)
    batch = col(feats)
    assert batch["teacher_top_k_v"].shape == (2, 4, 4)
    assert batch["teacher_top_k_v"][1, 2].sum() == 0            # padded rows
    assert batch["teacher_top_k_i"][0, 3].sum() == 0


# -- processor --------------------------------------------------------------


def fake_speech_fn(audio):
    """Pretend the S3 tokenizer returned one code per 'sample'."""
    return [int(x) % 100 for x in audio]


def test_processor_end_to_end():
    tok = make_tokenizer()
    proc = SpeechDistillProcessor(
        tok, speech_tokens_fn=fake_speech_fn, prefix="p",
        text_prefix={"yue": "<|1|>", "default": ""})
    ex = {"audio": [5, 6], "text": " hey ", "lang": "en"}
    out = proc.process_example(ex)
    expected_text = ("p<|text_start|>hey<|text_end|>"
                     "<|semantic_token_start|><|5|><|6|><|semantic_token_end|>")
    assert out["input_ids"] == tok.encode(expected_text)
    assert out["attention_mask"] == [1] * len(out["input_ids"])


def test_processor_codes_column_bypasses_audio():
    tok = make_tokenizer()
    proc = SpeechDistillProcessor(tok, speech_tokens_fn=None)
    out = proc.process_example({"codes": [1, 2, 3], "text": "a", "lang": ""})
    assert tok.speech_token_offset + 2 in out["input_ids"]


def test_dual_processor_batched():
    tok = make_tokenizer()
    student = SpeechDistillProcessor(tok, fake_speech_fn, prefix="")
    teacher = SpeechDistillProcessor(tok, fake_speech_fn, prefix="T")
    dual = DualProcessor(student, teacher)
    out = dual({"audio": [[1], [2, 3]], "text": ["a", "b"], "lang": ["", ""]})
    assert len(out["student_input_ids"]) == 2
    # teacher has a 1-char prefix -> exactly one token longer
    assert len(out["teacher_input_ids"][0]) == len(out["student_input_ids"][0]) + 1


def test_processor_max_length_truncation():
    tok = make_tokenizer()
    proc = SpeechDistillProcessor(tok, fake_speech_fn, max_length=5)
    out = proc.process_example({"audio": list(range(50)), "text": "abc", "lang": ""})
    assert len(out["input_ids"]) == 5
