"""Differential: our `EfficientKWSDataMod` vs the reference's paper-2
`efficient_kws/data_module.py` run VERBATIM (LightningDataModule stub; the
dataset/collator/sampler chain is untouched reference code, each pinned by
its own differential).

Pins the paper-2 wiring:

* fit builds the MLS training dataset over the HARD-CODED six-language
  list (data_module.py:223-230) with the sampler over `datasets[0]` for
  kw_type='all';
* the val_dataset sequence — one `MLSEvaluationDataset` per val_info entry
  in config order, same lengths and `is_expanded()` flags (key STRINGS
  differ by design: the reference uses `name/language/kw_type` and
  silently OVERWRITES duplicate keys; ours disambiguates — the engine
  consumes values() in order either way);
* the utterance-examples batch size is NOT rewritten for MLS training
  (the /4 rewrite is aishell-only, data_module.py:108-109);
* the load_embeddings/learn_features/kws_whisper_ckpt constructor contract
  (data_module.py:72-77).
"""

import os

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.efficient_kws.data import EfficientKWSDataMod
from ref_shims import (
    lightning_shim,
    load_reference_package_module,
    restore_modules,
    torchaudio_shim,
    torchvision_shim,
    whisper_audio_shim,
)

LANGS = ["English", "German", "French", "Spanish", "Polish", "Portuguese"]
N_CH, DIM = 3, 6
SIZE = (32, 64)


@pytest.fixture(scope="module")
def ref_dm_mod():
    shims = {
        **lightning_shim(),
        **torchvision_shim(),
        **torchaudio_shim(),
        **whisper_audio_shim(),
    }
    mod, saved = load_reference_package_module("efficient_kws.data_module", shims)
    yield mod
    restore_modules(saved)


def _save_bin(path, arr):
    with open(path, "wb") as f:
        torch.save(torch.from_numpy(np.ascontiguousarray(arr)), f)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    """Reference-format MLS tree for ALL SIX hard-coded languages: train
    (both kw_types) + dev eval metadata."""
    root = tmp_path_factory.mktemp("p2_mls6")
    rng = np.random.default_rng(3)
    for lang in LANGS:
        keywords = [f"{lang[:2].lower()}kw{i}" for i in range(4)]
        kw_rev = sorted(keywords, key=lambda x: x[::-1])
        for split, n_utts in (("train", 3), ("dev", 2)):
            base = os.path.join(str(root), f"mls_{lang.lower()}_opus", split)
            os.makedirs(os.path.join(base, "hs"))
            with open(os.path.join(base, "keywords.txt"), "w") as f:
                f.write("\n".join(keywords) + "\n")
            for kw_type in ("tts", "natural"):
                d = os.path.join(base, "keywords-hs", kw_type)
                os.makedirs(d)
                for i in range(len(keywords)):
                    t = int(rng.integers(8, 48))
                    _save_bin(os.path.join(d, f"{i}.bin"),
                              rng.standard_normal((N_CH, t, DIM)).astype(np.float32))
            codes, tlines, plines, poslines = [], [], [], []
            for u in range(n_utts):
                code = f"{10 + u}_{20 + u}_{u:06d}"
                codes.append(code)
                t = int(rng.integers(20, 100))
                _save_bin(os.path.join(base, "hs", code + ".bin"),
                          rng.standard_normal((N_CH, t, DIM)).astype(np.float32))
                kw = keywords[u % len(keywords)]
                transcript = f"the {kw} appears"
                tlines.append(f"{code}\t{transcript}")
                start = transcript.index(kw)
                plines.append("\t".join([code, kw, str(start), str(start + len(kw))]))
                p = u % len(keywords)
                poslines.append("\t".join(
                    [code, keywords[p], str(p), str(kw_rev.index(keywords[p]))]
                ))
            if split == "train":
                with open(os.path.join(base, "positives.tsv"), "w") as f:
                    f.write("\n".join(poslines) + "\n")
            else:
                with open(os.path.join(base, "uttid"), "w") as f:
                    f.write("\n".join(codes) + "\n")
                with open(os.path.join(base, "transcripts.txt"), "w") as f:
                    f.write("\n".join(tlines) + "\n")
                with open(os.path.join(base, "positives.tsv"), "w") as f:
                    f.write("\n".join(plines) + "\n")
    return str(root)


def _pair(ref_dm_mod, root, kw_type="natural", **over):
    val = [dict(name="mls", root=root, kw_type="natural", language="english"),
           dict(name="mls", root=root, kw_type="tts", language="german")]
    kwargs = dict(
        batch_size=8, sampling="utterance-examples",
        hotwords_per_group=2, features_size=SIZE,
        resample_every_epoch=False, n_layers=2,
        pad_long_before_resize=True, **over,
    )
    ref = ref_dm_mod.KWSDataMod(
        num_workers=0,
        train_info=[ref_dm_mod.DatasetInfo(name="mls", root=root, kw_type=kw_type)],
        val_info=[ref_dm_mod.DatasetInfo(**v) for v in val],
        test_info=ref_dm_mod.DatasetInfo(name="aishell", root=root, kw_type="natural"),
        **kwargs,
    )
    ours = EfficientKWSDataMod(
        train_info=[dict(name="mls", root=root, kw_type=kw_type)],
        val_info=val,
        test_info=dict(name="aishell", root=root, kw_type="natural"),
        keywords_per_group=2,
        **kwargs,
    )
    return ref, ours


def test_constructor_contract_matches(ref_dm_mod, root):
    ref, ours = _pair(ref_dm_mod, root)
    # MLS training: utterance-examples batch size NOT divided (aishell-only)
    assert ref.batch_size == ours.batch_size == 8

    for bad in (
        dict(load_embeddings=False, learn_features=False),
        dict(load_embeddings=False, learn_features=True, kws_whisper_ckpt=None),
    ):
        with pytest.raises(AssertionError):
            _pair(ref_dm_mod, root, **bad)
        with pytest.raises(AssertionError):
            EfficientKWSDataMod(batch_size=8, train_info=[], val_info=[],
                                test_info=None, **bad)


@pytest.mark.parametrize("kw_type", ["natural", "all"])
def test_fit_wiring_matches(ref_dm_mod, root, kw_type):
    ref, ours = _pair(ref_dm_mod, root, kw_type=kw_type)
    ref.setup("fit")
    ours.setup("fit")

    assert len(ref.fit_dataset) == len(ours.fit_dataset)
    assert len(ref.sampler) == len(ours.sampler)

    # val sequence: same (length, is_expanded) per entry in config order
    ref_vals = list(ref.val_dataset.values())
    our_vals = list(ours.val_dataset.values())
    assert len(ref_vals) == len(our_vals) == 2
    for rv, ov in zip(ref_vals, our_vals):
        assert len(rv) == len(ov)
        assert rv.is_expanded() == ov.is_expanded() is False
        assert rv.keywords == ov.keywords

    if kw_type == "all":
        r, o = ref.fit_dataset[1], ours.fit_dataset[1]
        assert isinstance(r, tuple) and isinstance(o, tuple)
        for rv, ov in zip(r, o):
            assert int(rv["label"]) == int(ov["label"])
            np.testing.assert_array_equal(
                np.asarray(ov["utt_features"]), rv["utt_features"].numpy()
            )
