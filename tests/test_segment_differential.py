"""Differential fuzz of timestamp segmentation vs the installed HF code.

`_retrieve_segment` drives the longform seek loop (segment boundaries AND
how far `seek` advances — reference pba_whisper.py:452-465); a divergence
here silently shifts every later segment.  HF's implementation is a
runnable staticmethod, so fuzz ours against it directly over random token
streams covering every branch: consecutive-timestamp pairs, single-
timestamp endings, trailing text, timestamp-free sequences, and lone
timestamps (incl. the `== timestamp_begin` special case).
"""

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.decoding.generate import WhisperGenerator

transformers = pytest.importorskip("transformers")
from transformers.models.whisper.generation_whisper import (  # noqa: E402
    WhisperGenerationMixin,
)

TB = 100  # timestamp_begin
TIME_PRECISION = 0.02
INPUT_STRIDE = 2


def _hf(seq, time_offset, seek_num_frames):
    segments, offset = WhisperGenerationMixin._retrieve_segment(
        seek_sequence=torch.tensor(seq, dtype=torch.long),
        seek_outputs=[{}],
        time_offset=torch.tensor([time_offset], dtype=torch.float64),
        timestamp_begin=TB,
        seek_num_frames=torch.tensor([seek_num_frames]),
        time_precision=TIME_PRECISION,
        time_precision_features=TIME_PRECISION / INPUT_STRIDE,
        input_stride=INPUT_STRIDE,
        prev_idx=0,
        idx=0,
        return_token_timestamps=False,
        decoder_input_ids=torch.zeros((1, 3), dtype=torch.long),
    )
    out = [
        {
            "start": float(s["start"]),
            "end": float(s["end"]),
            "tokens": [int(t) for t in s["tokens"]],
        }
        for s in segments
    ]
    return out, int(offset)


def _ours(seq, time_offset, seek_num_frames):
    return WhisperGenerator._retrieve_segment(
        list(seq), float(time_offset), TB, int(seek_num_frames)
    )


def _case(rng):
    n = int(rng.integers(1, 40))
    kind = rng.integers(0, 5)
    if kind == 0:  # pure text, no timestamps
        seq = rng.integers(5, 50, n).tolist()
    elif kind == 1:  # realistic: ts text... ts ts text ... ts
        seq = [TB + int(rng.integers(0, 8))]
        t = seq[0]
        while len(seq) < n:
            seq += rng.integers(5, 50, int(rng.integers(1, 5))).tolist()
            t += int(rng.integers(0, 6))
            seq.append(TB + min(t - TB, 30))
            if rng.random() < 0.5:
                seq.append(TB + min(t - TB, 30))
        seq = seq[:n]
    elif kind == 2:  # random soup of text and timestamps
        seq = [
            int(rng.integers(5, 50)) if rng.random() < 0.6
            else TB + int(rng.integers(0, 30))
            for _ in range(n)
        ]
    elif kind == 3:  # single-timestamp ending
        seq = rng.integers(5, 50, max(n - 1, 1)).tolist() + [TB + int(rng.integers(0, 30))]
    else:  # lone timestamp_begin (the `== timestamp_begin` special case)
        seq = rng.integers(5, 50, max(n - 1, 1)).tolist() + [TB]
        rng.shuffle(seq)
    return seq


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_retrieve_segment_matches_hf_fuzz(seed):
    rng = np.random.default_rng(seed)
    for _ in range(150):
        seq = _case(rng)
        time_offset = float(rng.integers(0, 10)) * 0.5
        snf = int(rng.integers(10, 3001))
        want_segs, want_off = _hf(seq, time_offset, snf)
        got_segs, got_off = _ours(seq, time_offset, snf)
        if want_off <= 0:
            # docs/PARITY.md #19: HF would stall the seek loop forever on a
            # position-0 closing pair; we advance the full window instead
            assert got_off == snf, (seq, snf)
        else:
            assert got_off == want_off, (seq, snf)
        assert len(got_segs) == len(want_segs), (seq, snf)
        for g, w in zip(got_segs, want_segs):
            assert g["tokens"] == w["tokens"], (seq, snf)
            assert g["start"] == pytest.approx(w["start"], abs=1e-9)
            assert g["end"] == pytest.approx(w["end"], abs=1e-9)


def test_retrieve_segment_hand_cases():
    # two complete segments closed by a consecutive pair, unfinished tail
    seq = [TB, 7, 8, TB + 5, TB + 5, 9, TB + 9, TB + 9, 11, 12]
    want, woff = _hf(seq, 0.0, 3000)
    got, goff = _ours(seq, 0.0, 3000)
    assert goff == woff == 9 * INPUT_STRIDE  # seek to the last closed ts
    assert [s["tokens"] for s in got] == [s["tokens"] for s in want]

    # single-timestamp ending consumes the whole window
    seq = [TB, 7, 8, TB + 5]
    _, woff = _hf(seq, 0.0, 2222)
    _, goff = _ours(seq, 0.0, 2222)
    assert goff == woff == 2222
