"""Differential fuzz of the biased-prompt budget math vs the REFERENCE's
own `_prepare_decoder_input_ids` (pba_whisper.py:479-545), imported and run
verbatim.

The reference binds `_pad_to_max_length` from the installed transformers,
whose signature moved since the reference's 4.37 pin (``padding="left"``
meant the SIDE there); a thin shim maps the old kwargs onto the new
signature — with ``skip_ending_double_timestamps=True``, the modern
segment-trim semantics this repo targets (PR #35750, docs/PARITY.md #12).
The reference's budget arithmetic (cut-off lengths, keyword/prev ordering,
`<|startofprev|>` insertion, attention-mask rule, the row-0 conditioning
gate) runs unmodified.

Known deliberate deviation excluded from the comparison (docs/PARITY.md
#4): with NO keywords, the reference trims prev context to
``cut_off_length - 1`` (an artifact of its keyword plumbing) while we
follow plain HF (``cut_off_length``); the fuzz therefore always includes
at least one keyword list when prev truncation can bind, and the
no-keyword regime is pinned token-exact against HF itself in
tests/test_decoding_parity.py.
"""

import sys
import types

import numpy as np
import pytest
import torch

transformers = pytest.importorskip("transformers")

sys.path.insert(0, "/root/reference/src")
ref_pba = pytest.importorskip("model.pba_whisper")

from transformers.models.whisper.generation_whisper import (  # noqa: E402
    _pad_to_max_length as hf_pad,
)

from enhance_cb_whisper_tpu.decoding.prompt import (  # noqa: E402
    prepare_decoder_input_ids,
    segment_prev_tokens,
)

TB = 100  # timestamp_begin
PAD = 0
PREV_SOT = 99
MTP = 44  # max_target_positions -> cut_off_length = 21


def _shim(current_segments, pad_token_id, padding="right",
          bos_token_tensor=None, cut_off_length=None):
    return hf_pad(
        current_segments, pad_token_id, device=torch.device("cpu"),
        padding_side=padding, padding="longest",
        bos_token_tensor=bos_token_tensor, cut_off_length=cut_off_length,
        skip_ending_double_timestamps=True, timestamp_begin=TB,
    )


def _ref(init_tokens, keywords_tokens, current_segments, flags, monkeypatch):
    monkeypatch.setattr(ref_pba, "_pad_to_max_length", _shim)
    gc = types.SimpleNamespace(pad_token_id=PAD, prev_sot_token_id=PREV_SOT)
    cfg = types.SimpleNamespace(max_target_positions=MTP)
    B = len(keywords_tokens)
    ids, kwargs = ref_pba.PBAWhisper._prepare_decoder_input_ids(
        cur_bsz=B,
        init_tokens=init_tokens,
        keywords_tokens=keywords_tokens,
        current_segments=current_segments,
        batch_idx_map=list(range(B)),
        do_condition_on_prev_tokens=flags,
        generation_config=gc,
        config=cfg,
        device="cpu",
        suppress_tokens=None,
        kwargs={},
    )
    mask = kwargs.get("decoder_attention_mask")
    return (
        ids.numpy().astype(np.int64),
        None if mask is None else mask.numpy().astype(np.int64),
    )


def _ours(init_tokens, keywords_tokens, current_segments, flags):
    # replicate the longform caller (decoding/generate.py): per-row segment
    # trim + concat, row-0 conditioning gate
    B = len(keywords_tokens)
    prev = [
        (
            [t for s in current_segments[i] for t in segment_prev_tokens(s, TB)]
            if flags[i]
            else None
        )
        for i in range(B)
    ]
    use_prev = len(current_segments[0]) > 0 and any(
        p is not None and len(p) > 0 for p in prev
    )
    return prepare_decoder_input_ids(
        init_tokens=init_tokens,
        keywords_tokens=keywords_tokens,
        prev_tokens_per_batch=prev if use_prev else None,
        condition_on_prev=any(flags),
        max_target_positions=MTP,
        pad_token_id=PAD,
        prev_sot_token_id=PREV_SOT,
    )


def _segments(rng, n_segments, allow_double_ts=True):
    segs = []
    for _ in range(n_segments):
        n = int(rng.integers(1, 9))
        toks = [TB + int(rng.integers(0, 10))]
        toks += rng.integers(5, 50, n).tolist()
        toks.append(TB + int(rng.integers(10, 30)))
        if allow_double_ts and rng.random() < 0.5:
            toks.append(toks[-1])  # double-timestamp ending -> trim rule
        segs.append({"tokens": torch.tensor(toks, dtype=torch.long)})
    return segs


def _compare(init_tokens, keywords_tokens, current_segments, flags, monkeypatch):
    # reference consumes torch tensors in segments; ours consumes lists
    ours_segments = [
        [{"tokens": [int(t) for t in s["tokens"]]} for s in row]
        for row in current_segments
    ]
    want_ids, want_mask = _ref(
        init_tokens, keywords_tokens, current_segments, flags, monkeypatch
    )
    got_ids, got_mask = _ours(init_tokens, keywords_tokens, ours_segments, flags)
    np.testing.assert_array_equal(got_ids, want_ids)
    if want_mask is None:
        assert got_mask is None
    else:
        np.testing.assert_array_equal(got_mask, want_mask)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_prompt_budget_matches_reference_fuzz(seed, monkeypatch):
    rng = np.random.default_rng(seed)
    init_tokens = [3, 50, 51]
    for _ in range(60):
        B = int(rng.integers(1, 4))
        keywords_tokens = [
            rng.integers(5, 50, int(rng.integers(0, 25))).tolist() for _ in range(B)
        ]
        if all(len(k) == 0 for k in keywords_tokens):
            keywords_tokens[0] = [7, 8, 9]  # PARITY #4 regime excluded
        n_per_row = [int(rng.integers(0, 4)) for _ in range(B)]
        if rng.random() < 0.85 and n_per_row[0] == 0:
            n_per_row[0] = 1  # mostly exercise the conditioned path
        current_segments = [_segments(rng, n) for n in n_per_row]
        flags = [bool(rng.random() < 0.8) for _ in range(B)]
        _compare(init_tokens, keywords_tokens, current_segments, flags, monkeypatch)


def test_row0_conditioning_gate(monkeypatch):
    """HF/reference skip conditioning for EVERY row when utterance 0 has no
    history yet — replicated (generate.py longform caller)."""
    rng = np.random.default_rng(7)
    keywords_tokens = [[7, 8], [9, 10, 11]]
    current_segments = [[], _segments(rng, 2)]  # row 0 empty, row 1 not
    _compare([3, 50], keywords_tokens, current_segments, [True, True], monkeypatch)


def test_no_keywords_no_prev_plain_prompt(monkeypatch):
    _compare([3, 50], [[], []], [[], []], [True, True], monkeypatch)


def test_keyword_truncation_budgets(monkeypatch):
    """Long keyword lists: conditioned (3/4 budget) and unconditioned
    (full-1) cut-offs, with and without prev context."""
    rng = np.random.default_rng(11)
    long_kw = rng.integers(5, 50, 40).tolist()
    segs = _segments(rng, 3)
    _compare([3], [long_kw, [5, 6]], [segs, segs], [True, True], monkeypatch)
    _compare([3], [long_kw, [5, 6]], [[], []], [False, False], monkeypatch)
