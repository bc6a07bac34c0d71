"""utils/{text,parser}.py vs the actual reference modules as oracles
(soulxpodcast/utils/{text,parser}.py are dependency-free and importable
straight from /root/reference)."""
import importlib.util
import os

import pytest

from speech_distill_tpu.utils import parser as our_parser
from speech_distill_tpu.utils import text as our_text

REF = "/root/reference/soulxpodcast/utils"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_text = _load("ref_text", f"{REF}/text.py") \
    if os.path.exists(f"{REF}/text.py") else None
ref_parser = _load("ref_parser", f"{REF}/parser.py") \
    if os.path.exists(f"{REF}/parser.py") else None

CASES = [
    "hello world",
    "你好 世界",
    "mixed 中文 and english 词",
    "ends with english",
    "以中文结尾",
    "trailing punct!",
    "句号。",
    "half , comma，",
    "",
    "   spaced   out   ",
    "<|Yue|>粤语前缀文本",
    "[S1]tagged",
    "a中b文c",
]


@pytest.mark.skipif(not ref_text, reason="reference not on disk")
def test_text_normalization_matches_reference():
    for s in CASES:
        assert our_text.remove_space_between_chinese(s) == \
            ref_text.remove_space_between_chinese(s), s
        assert our_text.normalize_text(s) == ref_text.normalize_text(s), s


@pytest.mark.skipif(not ref_text, reason="reference not on disk")
def test_text_validators_match_reference():
    for s in CASES:
        assert our_text.check_monologue_text(s) == \
            ref_text.check_monologue_text(s), s
        if hasattr(ref_text, "check_dialect_prompt_text"):
            assert our_text.check_dialect_prompt_text(s) == \
                ref_text.check_dialect_prompt_text(s), s
    lists = [["[S1]a", "[S2]b"], ["no tag"], [], ["[S1]只有一个"]]
    for tl in lists:
        assert our_text.check_dialogue_text(tl) == \
            ref_text.check_dialogue_text(tl), tl


@pytest.mark.skipif(ref_parser is None, reason="reference not on disk")
def test_podcast_parser_matches_reference():
    data = {
        "speakers": {
            "S1": {"prompt_text": "hello there",
                   "prompt_audio": "/tmp/a.wav"},
            "S2": {"prompt_text": "<|Yue|>你好",
                   "prompt_audio": "/tmp/b.wav",
                   "dialect_prompt": "<|Yue|>方言提示"},
        },
        "text": [["S1", "first turn"], ["S2", "second turn"],
                 ["S1", "third"], ["S3", "unknown speaker"]],
    }
    ours = our_parser.podcast_format_parser(dict(data), output_dir="outs")
    refs = ref_parser.podcast_format_parser(dict(data), output_dir="outs")
    # "key" is time-based and "wav" embeds it; compare everything else
    for d in (ours, refs):
        d.pop("key")
        d.pop("wav")
    assert ours == refs


@pytest.mark.skipif(ref_parser is None, reason="reference not on disk")
def test_check_prefix_matches_reference():
    for s in ["<|Yue|>x", "<|Henan|>y", "<|Sichuan|>z", "plain", "<|Nope|>q"]:
        assert our_parser.check_prefix(s) == ref_parser.check_prefix(s), s
