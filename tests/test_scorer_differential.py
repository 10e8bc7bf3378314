"""Differential fuzz: our entity_recall vs the reference's scorer.py, run
VERBATIM (imported from /root/reference with only its `string2string`
dependency shimmed).

The shim's NeedlemanWunsch wraps OUR `metrics.nw_align.needleman_wunsch`
and re-encodes the alignment in string2string's ' | '-joined string format
(gap char '[SKIP]'), so both sides consume the IDENTICAL alignment and the
fuzz isolates everything downstream: first-sentence tokenization, the
'|'-split re-parsing, mention offset mapping
((end_offset - tk.start) * (total_offset - tk.end) < 0, scorer.py:111),
gap-position mention extension (scorer.py:113-117), contiguous grouping,
the all-token TP rule (scorer.py:139-144), per-tag counting, and the
empty-prediction FN path (scorer.py:33-44).

Alignment-preference differences between our NW and the real string2string
are out of scope here (the NW scoring scheme itself is pinned by
tests/test_entity_recall.py); this fuzz pins the SCORER.
"""

import importlib.util
import random
import sys
import types

import pytest

from enhance_cb_whisper_tpu.metrics import entity_recall
from enhance_cb_whisper_tpu.metrics.nw_align import needleman_wunsch

REF_DIR = "/root/reference/src"


@pytest.fixture(scope="module")
def ref_entity_recall():
    class _NW:
        def __init__(self, match_weight=1.0, mismatch_weight=-1.0,
                     gap_weight=-1.0, gap_char="-"):
            self.gap_char = gap_char

        def get_alignment(self, seq1, seq2, return_score_matrix=False):
            a, b = needleman_wunsch(list(seq1), list(seq2), gap=self.gap_char)
            return " | ".join(a), " | ".join(b)

    s2s = types.ModuleType("string2string")
    s2s_al = types.ModuleType("string2string.alignment")
    s2s_al.NeedlemanWunsch = _NW
    s2s.alignment = s2s_al

    saved = {k: sys.modules.get(k) for k in
             ("string2string", "string2string.alignment", "priberam_tokenizer")}
    sys.modules["string2string"] = s2s
    sys.modules["string2string.alignment"] = s2s_al
    try:
        spec = importlib.util.spec_from_file_location(
            "priberam_tokenizer", f"{REF_DIR}/priberam_tokenizer.py")
        tok_mod = importlib.util.module_from_spec(spec)
        sys.modules["priberam_tokenizer"] = tok_mod
        spec.loader.exec_module(tok_mod)

        spec = importlib.util.spec_from_file_location(
            "ref_scorer", f"{REF_DIR}/scorer.py")
        scorer = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(scorer)
        yield scorer.entity_recall
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


LATIN = ["the", "meeting", "started", "priberam", "whisper", "keyword",
         "lisbon", "model", "entity", "recall", "a", "of", "x9", "zh"]
CJK = list("你好再见北京模型语音关键词")
PUNCT = [",", ";", ":", "?", "!", "(", ")", '"']


def _make_ref(rng: random.Random):
    """A reference transcript (word list + the rendered string), sometimes
    with a sentence break so the first-sentence rule is load-bearing."""
    n = rng.randint(3, 14)
    words = []
    for _ in range(n):
        r = rng.random()
        if r < 0.55:
            words.append(rng.choice(LATIN))
        elif r < 0.85:
            words.append("".join(rng.choices(CJK, k=rng.randint(1, 3))))
        else:
            words.append(rng.choice(PUNCT))
    text = " ".join(words)
    if rng.random() < 0.3:
        text += rng.choice([". and then more", "。后面还有", "\nnew line tail"])
    return words, text


def _make_mentions(rng: random.Random, words, text: str):
    """Random word-span mentions with char offsets into the rendered text
    (total_offset = span start, end_offset = span end — the fixture
    convention of tests/test_entity_recall.py and the ACL metadata)."""
    mentions = []
    for _ in range(rng.randint(0, 3)):
        i = rng.randrange(len(words))
        j = min(len(words), i + rng.randint(1, 2))
        start = len(" ".join(words[:i])) + (1 if i else 0)
        span = " ".join(words[i:j])
        mentions.append({
            "mention": span,
            "total_offset": start,
            "end_offset": start + len(span),
            "ner_tag": rng.choice(["PER", "LOC", "ORG", "UNK"]),
        })
    return mentions


def _make_pred(rng: random.Random, words):
    r = rng.random()
    if r < 0.08:
        return rng.choice(["", "   "])
    out = []
    for w in words:
        q = rng.random()
        if q < 0.12:
            continue  # deletion
        if q < 0.24:
            out.append(rng.choice(LATIN + CJK))  # substitution
        else:
            out.append(w)
        if rng.random() < 0.10:
            out.append(rng.choice(LATIN))  # insertion
    return " ".join(out)


@pytest.mark.parametrize("seed", range(6))
def test_entity_recall_matches_reference(ref_entity_recall, seed):
    rng = random.Random(1000 + seed)
    for case in range(150):
        batch = rng.randint(1, 3)
        preds, refs, mentions = [], [], []
        for _ in range(batch):
            words, text = _make_ref(rng)
            refs.append(text)
            mentions.append(_make_mentions(rng, words, text))
            preds.append(_make_pred(rng, words))
        char_split = rng.random() < 0.4
        if rng.random() < 0.7:
            ner_tags = "ALL"
        else:
            ner_tags = rng.sample(["PER", "LOC", "ORG", "UNK"],
                                  rng.randint(1, 3))
        want = ref_entity_recall(preds, refs, mentions, ner_tags, char_split)
        got = entity_recall(preds, refs, mentions, ner_tags, char_split)
        assert got == want, (
            f"seed={seed} case={case} char_split={char_split} "
            f"ner_tags={ner_tags}\npreds={preds}\nrefs={refs}\n"
            f"mentions={mentions}\nours={got}\nref={want}"
        )


def test_entity_recall_pipe_tokens(ref_entity_recall):
    """'|' in the transcript stresses the reference's '|'-split re-parsing
    of the aligned strings (scorer.py:73-99) — our list-based alignment
    must still agree on the final recall."""
    rng = random.Random(7)
    for case in range(60):
        words = ["alpha", "|", "beta", "gamma"]
        rng.shuffle(words)
        if rng.random() < 0.5:
            words.append("|")
        text = " ".join(words)
        mentions = [_m for _m in [_make_mentions(rng, words, text)] for _m in _m]
        pred = _make_pred(rng, words)
        want = ref_entity_recall([pred], [text], [mentions], "ALL", False)
        got = entity_recall([pred], [text], [mentions], "ALL", False)
        assert got == want, (
            f"case={case}\npred={pred!r}\nref={text!r}\nmentions={mentions}\n"
            f"ours={got}\nref={want}"
        )
