"""End-to-end paper-2 pipeline: MLS train dataset → collator → engine fit →
per-language validation with best-F search + recall@k + JSON dumps → test at
the configured threshold (reference src/efficient_kws/*)."""

import json
import os

import numpy as np
import pytest

from enhance_cb_whisper_tpu.efficient_kws import EfficientKWSConfig
from enhance_cb_whisper_tpu.efficient_kws.data import (
    EfficientKWSDataCollator,
    EfficientKWSDataMod,
    EfficientMLSKWSDataset,
    MLSEvaluationDataset,
)
from enhance_cb_whisper_tpu.efficient_kws.engine import (
    EfficientKWSEngine,
    EfficientTrainConfig,
)
from fixtures import make_mls

LANGS = ("English", "German")
FS = (32, 64)  # tiny features_size


@pytest.fixture(scope="module")
def mls_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mls")
    make_mls(str(root), languages=LANGS)
    return str(root)


def test_train_dataset_items(mls_root):
    ds = EfficientMLSKWSDataset(
        mls_root, languages=LANGS, kw_type="natural", features_size=FS,
        n_layers=2, n_channels=3, hidden_dim=8,
    )
    item = ds[0]
    assert item["utt_features"].shape == (2, 64, 8)
    assert item["kwd_features"].shape == (2, 32, 8)
    assert item["utt_mask"].shape == (2, 64)
    assert item["kwd_mask"].shape == (2, 32)
    assert set(np.unique(item["kwd_mask"])) <= {0.0, 1.0}
    # ghost keyword
    ghost = ds[3]  # keyword idx 3 of English is ghost
    assert ghost["mask"] == 0


def test_collator_stacks(mls_root):
    ds = EfficientMLSKWSDataset(
        mls_root, languages=LANGS, kw_type="natural", features_size=FS,
        n_layers=2, n_channels=3, hidden_dim=8,
    )
    batch = EfficientKWSDataCollator()([ds[0], ds[3]])
    assert batch["utt_features"].shape == (2, 2, 64, 8)
    # labels verbatim — the reference collator never applies the mask
    # (efficient_kws/data_collator.py:35-43); ghosts keep their label
    assert batch["labels"][1] == 0


def test_eval_dataset_groups(mls_root):
    ds = MLSEvaluationDataset(
        mls_root, language="English", kw_type="natural", size=FS,
        keywords_per_group=2, n_layers=2,
    )
    assert not ds.is_expanded()
    item = ds[0]
    assert item["utt"].shape == (2, 64, 8)
    assert len(item["groups"]) == 3
    assert item["groups"][0]["kwd"].shape == (2, 2, 32, 8)
    assert item["hotword_labels"].sum() >= 1
    assert item["hotword_mask"][3] == 0.0


@pytest.mark.parametrize("variant", ["L", "LE"])
def test_engine_fit_validate_test(tmp_path, mls_root, variant):
    model_config = EfficientKWSConfig(
        n_layers=2,
        embedding_dim=8,
        learn_features=variant != "L",
        proj_mlp=variant != "L",
        proj_mlp_units=4,
        resnet_version="resnet-18",
        threshold=0.5,
    )
    dm = EfficientKWSDataMod(
        batch_size=4,
        sampling="random",
        train_info=[{"name": "mls", "root": mls_root, "kw_type": "natural"}],
        val_info=[
            {"language": lang, "root": mls_root, "kw_type": "natural"}
            for lang in LANGS
        ],
        features_size=FS,
        n_layers=2,
        keywords_per_group=2,
        languages=list(LANGS),
    )
    engine = EfficientKWSEngine(
        model_config,
        EfficientTrainConfig(max_epochs=2),
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    params, batch_stats = engine.fit(dm, max_epochs=1, limit_train_batches=2)

    val = engine.validate(engine.variables(params, batch_stats), dm,
                          dump_dir=str(tmp_path / "dumps"))
    assert "metrics/f1" in val
    assert "metrics/f1_l0" in val
    assert "val/recall_at_20_0" in val
    assert os.path.exists(tmp_path / "dumps" / "prcurve_0.json")
    thres = json.load(open(tmp_path / "dumps" / "thresdict.json"))
    assert len(thres) == 2


def test_lef_train_step_with_batchstats(mls_root):
    model_config = EfficientKWSConfig(
        n_layers=2, embedding_dim=8, learn_features=True, proj_mlp=True,
        proj_mlp_units=4, frames_conv=True, resnet_version="resnet-18",
    )
    ds = EfficientMLSKWSDataset(
        mls_root, languages=LANGS, kw_type="natural", features_size=(64, 64),
        n_layers=2, n_channels=3, hidden_dim=8,
    )
    batch = EfficientKWSDataCollator()([ds[0], ds[1], ds[5], ds[6]])
    engine = EfficientKWSEngine(model_config, EfficientTrainConfig())
    params, stats, opt_state = engine.init_state(batch)
    assert stats  # BatchNorm stats exist for LEF
    step = engine.make_train_step()
    import jax
    import jax.numpy as jnp

    params, stats, opt_state, metrics = step(
        params, stats, opt_state,
        {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(metrics["loss"]))


def test_chunk_stride_time_and_embeddings():
    from enhance_cb_whisper_tpu.efficient_kws.data import chunk_stride

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 30, 16), dtype=np.float32)
    mask = np.ones((2, 30), np.float32)

    out = chunk_stride(feats, mask, ctx_window=40, chunk_size=10, condensed_dimension="time")
    assert out["strided"].shape == (2, 4, 10, 16)
    assert out["mask_strided"].shape == (2, 4, 10)
    assert out["mask_strided"][:, 3].sum() == 0  # padded tail chunk
    np.testing.assert_array_equal(out["strided"][:, 0], feats[:, :10])

    out = chunk_stride(feats, mask, ctx_window=20, chunk_size=4,
                       condensed_dimension="embeddings")
    assert out["strided"].shape == (2, 4, 4, 20)
    assert out["position_strided"].shape == (2, 4, 4)


def test_expanded_catalog_validation(tmp_path):
    """Expanded (root_audios_transcripts) dev sets: dataset flags
    is_expanded, items resolve from the expanded root, and the engine's
    validation skips them in the averaged curve metrics
    (reference dataset.py:1155-1156, model.py:388-398)."""
    root = tmp_path / "mls"
    expanded = tmp_path / "mls_expanded"
    from fixtures import make_mls_expanded

    make_mls_expanded(str(root), str(expanded), languages=("English",))

    ds_plain = MLSEvaluationDataset(
        str(root), language="English", kw_type="natural", size=FS,
        keywords_per_group=2, n_layers=2,
    )
    ds_exp = MLSEvaluationDataset(
        str(root), language="English", kw_type="natural", size=FS,
        keywords_per_group=2, n_layers=2,
        root_audios_transcripts=str(expanded),
    )
    assert not ds_plain.is_expanded() and ds_exp.is_expanded()
    assert len(ds_exp) == 2
    assert ds_exp[0]["transcript"].startswith("expanded")

    model_config = EfficientKWSConfig(
        n_layers=2, embedding_dim=8, resnet_version="resnet-18",
    )
    engine = EfficientKWSEngine(model_config, EfficientTrainConfig())
    sample_kwd = ds_plain.groups[0]
    import jax

    variables = engine.model.init(
        jax.random.PRNGKey(0), sample_kwd["kwd"], ds_plain[0]["utt"][None],
        sample_kwd["kwd_mask"], ds_plain[0]["utt_mask"][None],
    )

    class DM:
        val_dataset = {"English/natural": ds_plain, "English/natural/exp": ds_exp}

    metrics = engine.validate(variables, DM())
    assert "metrics/f1_0" in metrics
    assert "metrics/f1_1" not in metrics  # expanded loader skipped


def test_engine_int8_scoring_decision_parity(mls_root):
    """enable_int8_scoring: the quantized group scorer preserves the fp32
    scorer's probabilities/decisions on real eval items (LE variant)."""
    import jax.numpy as jnp

    model_config = EfficientKWSConfig(
        n_layers=2, embedding_dim=8, learn_features=True, proj_mlp=True,
        proj_mlp_units=4, resnet_version="resnet-18", threshold=0.5,
    )
    dm = EfficientKWSDataMod(
        batch_size=4, sampling="random",
        train_info=[{"name": "mls", "root": mls_root, "kw_type": "natural"}],
        val_info=[
            {"language": lang, "root": mls_root, "kw_type": "natural"}
            for lang in LANGS
        ],
        features_size=FS, n_layers=2, keywords_per_group=2, languages=list(LANGS),
    )
    engine = EfficientKWSEngine(model_config, EfficientTrainConfig())
    dm.setup("validate")
    dataset = list(dm.val_dataset.values())[0]
    item = dataset[0]
    state = engine.init_state(
        {
            "kwd_features": item["groups"][0]["kwd"],
            "utt_features": item["utt"][None],
            "kwd_mask": item["groups"][0]["kwd_mask"],
            "utt_mask": item["utt_mask"][None],
        }
    )
    variables = engine.variables(state[0], state[1]) if isinstance(state, tuple) else state
    kwd = np.concatenate([g["kwd"] for g in item["groups"]])
    km = np.concatenate([g["kwd_mask"] for g in item["groups"]])
    p_ref, _ = engine._score_group(
        variables, jnp.asarray(kwd), jnp.asarray(item["utt"][None]),
        jnp.asarray(km), jnp.asarray(item["utt_mask"][None]),
    )
    engine.enable_int8_scoring(variables, item)
    p_q, _ = engine._score_group(
        variables, jnp.asarray(kwd), jnp.asarray(item["utt"][None]),
        jnp.asarray(km), jnp.asarray(item["utt_mask"][None]),
    )
    p_ref, p_q = np.asarray(p_ref), np.asarray(p_q)
    assert np.max(np.abs(p_ref - p_q)) < 0.08
    assert np.array_equal(p_ref > 0.5, p_q > 0.5)


def test_val_dataset_keys_no_collision(tmp_path):
    """Expanded configs list a plain AND an expanded entry per
    (language, kw_type); the datamodule must keep BOTH (the engine consumes
    .values() in config order, like Lightning's loader list)."""
    from fixtures import make_mls_expanded

    root = tmp_path / "mls"
    expanded = tmp_path / "mls_expanded"
    make_mls_expanded(str(root), str(expanded), languages=("English",))
    dm = EfficientKWSDataMod(
        batch_size=4,
        sampling="random",
        val_info=[
            {"language": "English", "root": str(root), "kw_type": "natural"},
            {"language": "English", "root": str(root), "kw_type": "natural",
             "root_audios_transcripts": str(expanded)},
        ],
        features_size=FS,
        n_layers=2,
        keywords_per_group=2,
        languages=["English"],
    )
    dm.setup("validate")
    assert len(dm.val_dataset) == 2, list(dm.val_dataset)
    flags = [ds.is_expanded() for ds in dm.val_dataset.values()]
    assert flags == [False, True]


def test_efficient_fit_resume(tmp_path, mls_root):
    """Paper-2 Lightning ckpt_path resume: epoch/step/opt_state restored."""
    from enhance_cb_whisper_tpu.runtime.checkpoint import load_checkpoint

    model_config = EfficientKWSConfig(n_layers=2, embedding_dim=8,
                                      resnet_version="resnet-18")
    dm = EfficientKWSDataMod(
        batch_size=4,
        sampling="random",
        train_info=[{"name": "mls", "root": mls_root, "kw_type": "natural"}],
        features_size=FS,
        n_layers=2,
        keywords_per_group=2,
        languages=["English"],
    )
    engine = EfficientKWSEngine(model_config, EfficientTrainConfig(),
                                ckpt_dir=str(tmp_path / "ckpt"))
    engine.fit(dm, max_epochs=1, limit_train_batches=2)
    ckpt, _ = load_checkpoint(str(tmp_path / "ckpt" / "final"))
    assert int(ckpt["global_step"]) == 2 and "opt_state" in ckpt

    engine2 = EfficientKWSEngine(model_config, EfficientTrainConfig(),
                                 ckpt_dir=str(tmp_path / "ckpt2"))
    engine2.fit(dm, max_epochs=2, limit_train_batches=2,
                resume_from=str(tmp_path / "ckpt" / "final"))
    ckpt2, meta2 = load_checkpoint(str(tmp_path / "ckpt2" / "final"))
    assert int(meta2["epoch"]) == 1  # resumed at epoch 1
    assert int(ckpt2["global_step"]) == 4  # step counter continued
