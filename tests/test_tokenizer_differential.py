"""Differential fuzz: our PriberamTokenizer vs the reference's, imported
directly from /root/reference (stdlib-only, runnable in-process).

The tokenizer's sentence-split rules are load-bearing — the entity-recall
scorer consumes only the FIRST sentence of each transcript
(reference src/scorer.py:48-49) — so this pins every field of every token
over randomized multilingual text (latin, CJK, punctuation runs, newlines,
zero-width and control characters, surrogate-adjacent codepoints).
"""

import importlib.util
import random
import sys

import pytest

from enhance_cb_whisper_tpu.metrics.tokenizer import PriberamTokenizer

REF_PATH = "/root/reference/src/priberam_tokenizer.py"


@pytest.fixture(scope="module")
def ref_tokenizer():
    spec = importlib.util.spec_from_file_location("ref_priberam_tokenizer", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_priberam_tokenizer"] = mod
    spec.loader.exec_module(mod)
    return mod.PriberamTokenizer()


ours = PriberamTokenizer()


def _assert_same(text, ref_tok, check_sentences=True):
    got = ours.tokenize(text)
    want = ref_tok.tokenize(text)
    assert len(got) == len(want), (
        f"sentence count {len(got)} != {len(want)} for {text!r}"
    )
    for si, (gs, ws) in enumerate(zip(got, want)):
        gt = [(t.index, t.start, t.end, t.text, t.type) for t in gs]
        wt = [(t.index, t.start, t.end, t.text, t.type) for t in ws]
        assert gt == wt, f"sentence {si} for {text!r}:\nours: {gt}\nref:  {wt}"
    if check_sentences:
        got_s = [[t.text for t in s] for s in ours.just_split_sentences(text)]
        want_s = [[t.text for t in s] for s in ref_tok.just_split_sentences(text)]
        assert got_s == want_s, f"{text!r}: {got_s} != {want_s}"


HAND_CASES = [
    "",
    " ",
    "hello world",
    "Hello world. Second sentence!",
    "Dr. Smith went to Washington.",
    "E. U. A. are initials",
    "中文句子。第二句话。",
    "mixed 中文 and English. 句子。",
    "ends with period.",
    "period. ",
    "no trailing stop",
    "newline\nsplits\n\nsentences",
    "\r\n windows \r\n",
    "tabs\tand nbsp spaces",
    "punct!!! runs??? here...",
    "(parens) [brackets] {braces}",
    "emoji 😀 and symbols ©®",
    "ethiopic stop ሀሁ። next",
    "zero​width‍joins",
    "a.b.c.d",
    "1. numbered item",
    "word.",  # stop with no trailing space: punctuation, not full_stop
    "über café naïve",
    "русский текст. второй.",
    "العربية هنا. جملة ثانية.",
    "ひらがな。カタカナ。漢字。",
    "quote \"inside\" and 'single'",
    "dash-joined words - standalone",
    "a" * 300,
    "。",
    "。。。",
    ". ",
    " . ",
]


@pytest.mark.parametrize("idx", range(len(HAND_CASES)))
def test_hand_cases_match_reference(ref_tokenizer, idx):
    _assert_same(HAND_CASES[idx], ref_tokenizer)


def _random_text(rng: random.Random) -> str:
    pools = [
        "abcdefghijklmnop XYZ ",
        "中文字符句子话语",
        "。፡።.!?,;:()[]{}\"'-",
        " \t\n\r ",
        "​‍⁠",  # zero-width
        "éüñßøå",
        "русскийтекст",
        "0123456789",
        "😀🎉🚀",
        "\x00\x07\x1b",  # control chars (UNK path)
        "ـــ٫٬",  # arabic tatweel + separators
    ]
    n = rng.randint(0, 60)
    out = []
    for _ in range(n):
        pool = rng.choice(pools)
        out.append(rng.choice(pool))
    return "".join(out)


def test_random_fuzz_matches_reference(ref_tokenizer):
    rng = random.Random(1234)
    for i in range(1500):
        text = _random_text(rng)
        _assert_same(text, ref_tokenizer)
