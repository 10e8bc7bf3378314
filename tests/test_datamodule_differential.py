"""Differential: our `KWSDataMod` vs the reference's `data_module.py` run
VERBATIM (LightningDataModule stub; the dataset/collator/sampler chain it
wires together is the untouched reference code, each already pinned by its
own differential).

Pins the module-level wiring the other differentials cannot see:

* the utterance-examples batch-size rewrite is AISHELL-ONLY — batch/4 for
  aishell, untouched for mls (data_module.py:58-62);
* `setup('fit')` builds the SAME val_dataset dict keys (`name/kw_type`) as
  `setup('validate')` (data_module.py:87-110,161-180);
* kw_type='all' trains on a ConcatDataset of (tts, natural) whose items
  are TUPLES, with the sampler built over datasets[0]
  (data_module.py:121-133, dataset.py:15-23);
* dataloader shapes: train batches collated by KWSDataCollator at the
  (possibly rewritten) batch size; val loaders one per val_info at
  batch_size=1 with the identity HotwordDataCollator.
"""

import os

import numpy as np
import pytest

from enhance_cb_whisper_tpu.data.datamodule import KWSDataMod
from fixtures import make_aishell_hotword, make_aishell_kws
from ref_shims import (
    lightning_shim,
    load_reference_package_module,
    restore_modules,
    torchaudio_shim,
    torchvision_shim,
    whisper_audio_shim,
)


@pytest.fixture(scope="module")
def ref_dm_mod():
    shims = {
        **lightning_shim(),
        **torchvision_shim(),
        **torchaudio_shim(),
        **whisper_audio_shim(),
    }
    mod, saved = load_reference_package_module("data.data_module", shims)
    yield mod
    restore_modules(saved)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dm_aishell")
    make_aishell_kws(str(root), n_keywords=6, n_utts=4, ghost=(4,), fmt="bin")
    make_aishell_hotword(str(root), n_hotwords=5, n_utts=3, ghost=(3,), fmt="bin")
    return str(root)


def _pair(ref_dm_mod, root, kw_type="natural", sampling="utterance-examples",
          batch_size=8, name="aishell"):
    info = dict(name=name, root=root, kw_type=kw_type)
    # val/test always use a concrete kw_type: the eval datasets raise
    # NotImplementedError on 'all' in BOTH implementations (dataset.py:248)
    vinfo = dict(name=name, root=root, kw_type="natural")
    kwargs = dict(
        batch_size=batch_size,
        sampling=sampling,
        train_info=[ref_dm_mod.DatasetInfo(**info)],
        val_info=[ref_dm_mod.DatasetInfo(**vinfo)],
        test_info=ref_dm_mod.DatasetInfo(**vinfo),
        hotwords_per_group=2,
        features_size=(32, 48),
        resample_every_epoch=False,
    )
    ref = ref_dm_mod.KWSDataMod(num_workers=0, **kwargs)
    ours = KWSDataMod(num_workers=0, **{**kwargs, "train_info": [info],
                                        "val_info": [vinfo], "test_info": vinfo})
    return ref, ours


def test_batch_rewrite_is_aishell_only(ref_dm_mod, root):
    ref, ours = _pair(ref_dm_mod, root, batch_size=8)
    assert ref.batch_size == ours.batch_size == 2  # aishell: 8 // 4

    # mls: NOT rewritten (data_module.py:59-60 gates on train_info[0].name)
    info = dict(name="mls", root=root, kw_type="natural")
    ref_mls = ref_dm_mod.KWSDataMod(
        batch_size=8, sampling="utterance-examples", num_workers=0,
        train_info=[ref_dm_mod.DatasetInfo(**info)],
        val_info=[], test_info=ref_dm_mod.DatasetInfo(name="aishell", root=root,
                                                      kw_type="natural"),
        hotwords_per_group=2,
    )
    ours_mls = KWSDataMod(
        batch_size=8, sampling="utterance-examples",
        train_info=[info], val_info=[],
        test_info=dict(name="aishell", root=root, kw_type="natural"),
        hotwords_per_group=2,
    )
    assert ref_mls.batch_size == ours_mls.batch_size == 8

    # non-multiple-of-4 rejection: the reference's assert MESSAGE has a
    # typo (`{self.batch:size}`, data_module.py:60) so the failing assert
    # surfaces as AttributeError; ours raises a plain AssertionError
    with pytest.raises(AttributeError):
        _pair(ref_dm_mod, root, batch_size=6)
    with pytest.raises(AssertionError):
        KWSDataMod(batch_size=6, sampling="utterance-examples",
                   train_info=[dict(name="aishell", root=root, kw_type="natural")],
                   val_info=[], test_info=None, hotwords_per_group=2)


def test_setup_fit_wiring_matches(ref_dm_mod, root):
    ref, ours = _pair(ref_dm_mod, root)
    ref.setup("fit")
    ours.setup("fit")
    assert list(ref.val_dataset.keys()) == list(ours.val_dataset.keys()) == [
        "aishell/natural"
    ]
    assert len(ref.fit_dataset) == len(ours.fit_dataset)
    assert len(ref.sampler) == len(ours.sampler)
    assert len(ref.val_dataloader()) == len(ours.val_dataloader()) == 1

    # the identity HotwordDataCollator at batch_size=1: each val batch IS
    # the dataset item (data_collator.py:60-64) — item parity is pinned by
    # test_eval_dataset_differential; here check the loader passthrough
    ref_batch = next(iter(ref.val_dataloader()[0]))
    our_batch = next(iter(ours.val_dataloader()[0]))
    assert ref_batch["transcript"] == our_batch["transcript"]
    np.testing.assert_array_equal(
        np.concatenate([t.numpy() for t in ref_batch["hotword_labels"]]),
        np.asarray(our_batch["hotword_labels"]),
    )


def test_train_loader_shapes_match(ref_dm_mod, root):
    ref, ours = _pair(ref_dm_mod, root)
    ref.setup("fit")
    ours.setup("fit")
    ref_batches = list(ref.train_dataloader())
    our_batches = list(ours.train_dataloader())
    assert len(ref_batches) == len(our_batches)
    for rb, ob in zip(ref_batches, our_batches):
        assert tuple(rb["features"].shape) == tuple(np.asarray(ob["features"]).shape)
        assert tuple(rb["labels"].shape) == tuple(np.asarray(ob["labels"]).shape)


def test_kw_type_all_concat_items_match(ref_dm_mod, root):
    ref, ours = _pair(ref_dm_mod, root, kw_type="all")
    ref.setup("fit")
    ours.setup("fit")
    assert len(ref.fit_dataset) == len(ours.fit_dataset)
    # sampler over datasets[0] (the tts member), not the concat
    assert len(ref.sampler) == len(ours.sampler)
    for idx in [0, 3, len(ref.fit_dataset) - 1]:
        r = ref.fit_dataset[idx]
        o = ours.fit_dataset[idx]
        assert isinstance(r, tuple) and isinstance(o, tuple) and len(r) == len(o) == 2
        for rv, ov in zip(r, o):
            assert int(rv["label"]) == int(ov["label"])
            assert int(rv["mask"]) == int(ov["mask"])
            np.testing.assert_allclose(
                np.asarray(ov["features"]), rv["features"].numpy(),
                rtol=1e-5, atol=1e-6,
            )
