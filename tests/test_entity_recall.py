"""Tests for the Priberam tokenizer, NW alignment, and entity recall
(reference semantics: src/priberam_tokenizer.py, src/scorer.py)."""

import pytest

from enhance_cb_whisper_tpu.metrics import (
    PriberamTokenizer,
    entity_recall,
    needleman_wunsch,
)
from enhance_cb_whisper_tpu.metrics.nw_align import GAP


class TestTokenizer:
    def setup_method(self):
        self.tok = PriberamTokenizer()

    def test_basic_words_and_spaces(self):
        sents = self.tok.tokenize("hello world")
        assert len(sents) == 1
        texts = [t.text for t in sents[0]]
        types = [t.type for t in sents[0]]
        assert texts == ["hello", " ", "world"]
        assert types == ["text", "space", "text"]

    def test_offsets(self):
        sents = self.tok.tokenize("ab cd")
        toks = sents[0]
        assert (toks[0].start, toks[0].end) == (0, 2)
        assert (toks[2].start, toks[2].end) == (3, 5)

    def test_full_stop_splits_long_sentence(self):
        sents = self.tok.tokenize("the meeting started late. next item")
        assert len(sents) == 2
        assert sents[0][-1].type == "full_stop"

    def test_short_token_before_stop_does_not_split(self):
        # abbreviation heuristic: token before '. ' has <= 2 chars
        sents = self.tok.tokenize("meet dr. smith today")
        assert len(sents) == 1

    def test_nonlatin_full_stop_always_splits(self):
        sents = self.tok.tokenize("你好。再见")
        assert len(sents) == 2

    def test_punctuation_tokens(self):
        sents = self.tok.tokenize("a,b")
        assert [t.type for t in sents[0]] == ["text", "punctuation", "text"]

    def test_newline_splits(self):
        sents = self.tok.tokenize("one\ntwo")
        assert len(sents) == 2


class TestNW:
    def test_identical(self):
        a, b = needleman_wunsch(list("abc"), list("abc"))
        assert a == b == list("abc")

    def test_gap_placement(self):
        a, b = needleman_wunsch(list("abc"), list("ac"))
        assert a == ["a", "b", "c"]
        assert b == ["a", GAP, "c"]

    def test_mismatch(self):
        a, b = needleman_wunsch(list("axc"), list("abc"))
        assert a == ["a", "x", "c"]
        assert b == ["a", "b", "c"]

    def test_empty(self):
        a, b = needleman_wunsch([], list("ab"))
        assert a == [GAP, GAP]
        assert b == ["a", "b"]


def _mention(text, ref, tag="UNK"):
    start = ref.index(text)
    return {"mention": text, "total_offset": start, "end_offset": start + len(text), "ner_tag": tag}


class TestEntityRecall:
    def test_perfect_prediction(self):
        ref = "the neural network model works"
        mentions = [[_mention("neural network", ref)]]
        out = entity_recall([ref], [ref], mentions, "ALL")
        assert out["ALL"] == 1.0

    def test_missed_mention(self):
        ref = "the neural network model works"
        pred = "the model works"
        mentions = [[_mention("neural network", ref)]]
        out = entity_recall([pred], [ref], mentions, "ALL")
        assert out["ALL"] == 0.0

    def test_partial_mention_is_fn(self):
        # every aligned token must match (src/scorer.py:139-144)
        ref = "the neural network model works"
        pred = "the neural blob model works"
        mentions = [[_mention("neural network", ref)]]
        out = entity_recall([pred], [ref], mentions, "ALL")
        assert out["ALL"] == 0.0

    def test_empty_prediction_counts_fn(self):
        ref = "keyword here"
        mentions = [[_mention("keyword", ref)]]
        out = entity_recall([""], [ref], mentions, "ALL")
        assert out["ALL"] == 0.0

    def test_char_split_chinese(self):
        ref = "我喜欢深度学习模型"
        pred = "我喜欢深度学习模型"
        mentions = [[_mention("深度学习", ref)]]
        out = entity_recall([pred], [ref], mentions, "ALL", char_split=True)
        assert out["ALL"] == 1.0

    def test_char_split_chinese_miss(self):
        ref = "我喜欢深度学习模型"
        pred = "我喜欢深度xx模型"
        mentions = [[_mention("深度学习", ref)]]
        out = entity_recall([pred], [ref], mentions, "ALL", char_split=True)
        assert out["ALL"] == 0.0

    def test_two_mentions_one_recalled(self):
        ref = "alpha beta gamma delta"
        pred = "alpha beta gamma wrong"
        mentions = [[_mention("beta", ref), _mention("delta", ref)]]
        out = entity_recall([pred], [ref], mentions, "ALL")
        assert out["ALL"] == pytest.approx(0.5)

    def test_per_tag_counts(self):
        ref = "alpha beta"
        mentions = [[_mention("alpha", ref, tag="ORG"), _mention("beta", ref, tag="LOC")]]
        out = entity_recall([ref], [ref], mentions, "ALL")
        assert out["ORG"] == 1.0 and out["LOC"] == 1.0 and out["ALL"] == 1.0
