"""Golden-parity tests of the matmul-based bilinear resize vs torch.

torchvision's `resize(..., antialias=...)` on float tensors lowers to
`torch.nn.functional.interpolate(mode='bilinear', align_corners=False)`,
so torch (CPU) is the parity oracle here (reference call sites:
src/data/dataset.py:314, src/data/data_collator.py:44, src/model/cb_whisper.py:208).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from enhance_cb_whisper_tpu.ops import resize_bilinear


CASES = [
    # (in_h, in_w, out_h, out_w)
    ((7, 53), (150, 750)),     # upsample both (typical keyword x utterance)
    ((40, 1500), (150, 750)),  # upsample h, downsample w
    ((300, 900), (150, 750)),  # downsample both
    ((32, 32), (32, 64)),      # identity h
    ((5, 5), (3, 3)),          # tiny downsample
    ((1, 10), (32, 32)),       # single-row keyword
]


@pytest.mark.parametrize("in_size,out_size", CASES)
@pytest.mark.parametrize("antialias", [False, True])
def test_resize_matches_torch(in_size, out_size, antialias):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, *in_size), dtype=np.float32)

    got = np.asarray(resize_bilinear(x, out_size, antialias=antialias))

    want = F.interpolate(
        torch.from_numpy(x)[None],
        size=out_size,
        mode="bilinear",
        align_corners=False,
        antialias=antialias,
    )[0].numpy()

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_identity():
    x = np.random.default_rng(1).standard_normal((2, 8, 8), dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(resize_bilinear(x, (8, 8))), x)
