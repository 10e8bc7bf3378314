"""Exact budget math of the biased-prompt assembly
(reference src/model/pba_whisper.py:478-548)."""

import numpy as np

from enhance_cb_whisper_tpu.decoding.prompt import (
    pad_to_max_length,
    prepare_decoder_input_ids,
    strip_prompt,
)

INIT = [50258, 50259, 50359]  # sot, lang, task
PAD = 50257
PREV = 50361
MAX_TGT = 448  # cut_off_length = 223


def test_no_context_returns_init_only():
    ids, mask = prepare_decoder_input_ids(
        INIT, [[]], None, True, MAX_TGT, PAD, PREV
    )
    assert ids.tolist() == [INIT]
    assert mask is None


def test_keywords_only_budget_is_cutoff_minus_one():
    # without prev conditioning: keywords keep their LAST 222 tokens
    kw = list(range(1000, 1000 + 300))
    ids, mask = prepare_decoder_input_ids(
        INIT, [kw], None, False, MAX_TGT, PAD, PREV
    )
    cut = MAX_TGT // 2 - 1 - 1  # 222
    assert ids.shape[1] == 1 + cut + len(INIT)
    assert ids[0, 0] == PREV
    assert ids[0, 1 : 1 + cut].tolist() == kw[-cut:]
    assert mask.all()


def test_keywords_share_budget_with_prev():
    # conditioning: keywords capped at (223*3)//4 - 1 = 166, prev gets
    # 223 - len(kw) - 1 of the remainder, both keep their LAST tokens
    kw = list(range(2000, 2000 + 200))
    prev = list(range(3000, 3000 + 500))
    ids, mask = prepare_decoder_input_ids(
        INIT, [kw], [prev], True, MAX_TGT, PAD, PREV
    )
    kw_cut = (223 * 3) // 4 - 1  # 166
    prev_cut = 223 - kw_cut - 1  # 56
    assert ids.shape[1] == 1 + kw_cut + prev_cut + len(INIT)
    assert ids[0, 1 : 1 + kw_cut].tolist() == kw[-kw_cut:]
    assert ids[0, 1 + kw_cut : 1 + kw_cut + prev_cut].tolist() == prev[-prev_cut:]


def test_left_padding_and_mask():
    # two rows, different keyword lengths: shorter row left-padded, masked
    ids, mask = prepare_decoder_input_ids(
        INIT, [[7, 8, 9], [5]], None, False, MAX_TGT, PAD, PREV
    )
    assert ids.shape[0] == 2
    row1 = ids[1].tolist()
    assert row1[:3] == [PREV, PAD, PAD]
    assert mask[1].tolist() == [1, 0, 0, 1, 1, 1, 1]


def test_pad_to_max_length_right():
    out = pad_to_max_length([[1, 2], [3]], PAD, padding="right")
    assert out.tolist() == [[1, 2], [3, PAD]]


def test_strip_prompt():
    seqs = np.array([[9, 9, 1, 2, 3]])
    np.testing.assert_array_equal(strip_prompt(seqs, 2), [[1, 2, 3]])
