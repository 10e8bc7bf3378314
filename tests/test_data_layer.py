"""Tests for the torch-free data layer over the reference's on-disk layout
(src/data/{dataset,sampler,data_collator,data_module}.py semantics)."""

import numpy as np
import pytest

from enhance_cb_whisper_tpu.data import (
    AishellHotwordDataset,
    AishellKWSDataset,
    ConcatDataset,
    KWSDataCollator,
    KWSDataMod,
    KWSSampler,
)
from fixtures import make_aishell_hotword, make_aishell_kws


@pytest.fixture(scope="module")
def aishell_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("aishell")
    keywords, positives = make_aishell_kws(str(root))
    make_aishell_hotword(str(root))
    return str(root), keywords, positives


class TestTrainDataset:
    def test_index_space_and_labels(self, aishell_root):
        root, keywords, positives = aishell_root
        ds = AishellKWSDataset(root, kw_type="natural")
        assert len(ds) == len(positives) * len(keywords)
        code0 = ds.metadata[0]["code"]
        pos0 = positives[code0]
        item = ds[pos0[0]]  # utterance 0, a positive keyword
        assert item["label"] == 1
        neg_idx = next(i for i in range(len(keywords)) if i not in pos0 and i != 4)
        assert ds[neg_idx]["label"] == 0

    def test_ghost_keyword_mask(self, aishell_root):
        root, keywords, _ = aishell_root
        ds = AishellKWSDataset(root, kw_type="natural")
        assert ds.ghost_keyword_indices == [4]
        item = ds[4]
        assert item["mask"] == 0
        assert item["features"].shape[1] == 1  # zero stand-in, 1 frame

    def test_features_are_cosine_similarities(self, aishell_root):
        root, keywords, _ = aishell_root
        ds = AishellKWSDataset(root, kw_type="natural")
        item = ds[0]
        feats = item["features"]
        assert feats.ndim == 3
        assert np.abs(feats).max() <= 1.0 + 1e-5

    def test_domain_ids(self, aishell_root):
        root, _, _ = aishell_root
        assert AishellKWSDataset(root, "tts")[0]["domain"] == 0
        assert AishellKWSDataset(root, "natural")[0]["domain"] == 1


class TestSampler:
    def test_counts_and_ranges(self, aishell_root):
        root, keywords, positives = aishell_root
        ds = AishellKWSDataset(root, kw_type="natural")
        sampler = KWSSampler(ds, sampling="random", resample_every_epoch=False)
        idxs = list(sampler)
        assert len(idxs) == len(sampler) == len(positives) * 4
        assert all(0 <= i < len(ds) for i in idxs)

    def test_one_positive_three_negatives_per_utterance(self, aishell_root):
        root, keywords, positives = aishell_root
        ds = AishellKWSDataset(root, kw_type="natural")
        sampler = KWSSampler(ds, sampling="utterance-examples", resample_every_epoch=False)
        idxs = list(sampler)
        n = len(keywords)
        for block_start in range(0, len(idxs), 4):
            block = idxs[block_start : block_start + 4]
            utt = block[0] // n
            assert all(i // n == utt for i in block), "examples of one utterance stay adjacent"
            code = ds.metadata[utt]["code"]
            labels = [1 if (i % n) in positives[code] else 0 for i in block]
            assert labels[0] == 1 and sum(labels) == 1

    def test_seeded_sampler_is_deterministic(self, aishell_root):
        root, _, _ = aishell_root
        ds = AishellKWSDataset(root, kw_type="natural")
        s = KWSSampler(ds, resample_every_epoch=False)
        assert list(s) == list(s)
        s2 = KWSSampler(ds, resample_every_epoch=True)
        assert list(s2) != list(s2)  # fresh randomness per epoch


class TestCollator:
    def test_fixed_size_and_ignore_labels(self, aishell_root):
        root, _, _ = aishell_root
        ds = AishellKWSDataset(root, kw_type="natural")
        collator = KWSDataCollator(size=(32, 48))
        batch = collator([ds[0], ds[4]])  # index 4 = ghost keyword
        assert batch["features"].shape == (2, 3, 32, 48)
        # the flat path takes labels VERBATIM (reference data_collator.py:53
        # never consults the mask there); the ghost keeps its dataset label
        assert batch["labels"][1] == 0
        assert batch["domain"].tolist() == [1, 1]

    def test_list_flatten_branch_relabels_ghosts(self, aishell_root):
        """Multi-keyword items (list-valued features) flatten per keyword
        with mask 0 -> label -100 (reference data_collator.py:23-27)."""
        root, _, _ = aishell_root
        collator = KWSDataCollator(size=(32, 48))
        rng = np.random.default_rng(0)
        item = {
            "features": [rng.standard_normal((3, 4, 20)).astype(np.float32)
                         for _ in range(3)],
            "label": [1, 0, 1],
            "mask": [1, 1, 0],
        }
        batch = collator([item])
        assert batch["features"].shape == (3, 3, 32, 48)
        assert batch["labels"].tolist() == [1, 0, -100]
        assert "domain" not in batch

    def test_dynamic_size_pads_long_edge(self, aishell_root):
        root, _, _ = aishell_root
        ds = AishellKWSDataset(root, kw_type="natural")
        items = [ds[0], ds[1]]
        collator = KWSDataCollator(size=None)
        batch = collator(items)
        assert batch["features"].shape[2] == 32  # short edge >= 32
        long_max = max(max(i["features"].shape[2] for i in items), 32)
        assert batch["features"].shape[3] == long_max

    def test_tuple_flattening(self, aishell_root):
        root, _, _ = aishell_root
        ds = ConcatDataset(
            [AishellKWSDataset(root, "tts"), AishellKWSDataset(root, "natural")]
        )
        collator = KWSDataCollator(size=(32, 32))
        batch = collator([ds[0], ds[1]])
        assert batch["features"].shape[0] == 4  # 2 items x (tts, natural)
        assert batch["domain"].tolist() == [0, 1, 0, 1]


class TestEvalDataset:
    def test_hotword_dataset(self, aishell_root):
        root, _, _ = aishell_root
        ds = AishellHotwordDataset(
            root=f"{root}/hotword", split="dev", size=(32, 48), hotwords_per_group=2
        )
        assert len(ds) == 3
        item = ds[0]
        assert item["hotword_labels"].sum() == 1
        assert item["utt_hs"].ndim == 3
        assert item["hotword_mask"][3] == 0  # ghost
        assert item["speaker"] == "0000"
        assert ds.catalog.num_groups() == 3

    def test_item_features_parity_shape(self, aishell_root):
        root, _, _ = aishell_root
        ds = AishellHotwordDataset(
            root=f"{root}/hotword", split="dev", size=(32, 48), hotwords_per_group=2
        )
        feats = ds.item_features(0, 0)
        assert feats.shape == (2, 3, 32, 48)


class TestDataModule:
    def test_fit_setup_and_batches(self, aishell_root):
        root, keywords, _ = aishell_root
        dm = KWSDataMod(
            batch_size=8,
            sampling="utterance-examples",
            train_info=[{"name": "aishell", "root": root, "kw_type": "natural"}],
            val_info=[],
            hotwords_per_group=2,
            features_size=(32, 48),
        )
        assert dm.batch_size == 2  # /4 rewrite for utterance-examples
        dm.setup("fit")
        batch = next(iter(dm.train_dataloader()))
        # torch DataLoader semantics: batch_size items per batch (the /4
        # rewrite trades batch items for the sampler's 4-example blocks)
        assert batch["features"].shape == (2, 3, 32, 48)
        assert set(batch["labels"].tolist()) <= {0, 1, -100}
