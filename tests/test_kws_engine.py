"""End-to-end mini run of the paper-1 engine: fit 2 epochs on the synthetic
aishell fixture, validate, test with bootstrap CIs — the `kws.py test` /
`run_CLI.py fit` slice (SURVEY.md §7 build order step 3-4)."""

import numpy as np
import pytest

from enhance_cb_whisper_tpu.data import KWSDataMod
from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.runtime.checkpoint import EarlyStopping, load_checkpoint
from enhance_cb_whisper_tpu.runtime.kws_engine import KWSEngine
from enhance_cb_whisper_tpu.train.kws_train import KWSTrainConfig
from fixtures import make_aishell_hotword, make_aishell_kws

TINY = ResNetConfig(
    num_channels=3, embedding_size=8, hidden_sizes=(8, 16, 24, 32), depths=(1, 1, 1, 1),
    num_labels=2,
)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("aishell_e2e")
    make_aishell_kws(str(root))
    make_aishell_hotword(str(root))
    return str(root)


@pytest.fixture(scope="module")
def datamodule(root):
    dm = KWSDataMod(
        batch_size=4,
        sampling="random",
        train_info=[{"name": "aishell", "root": root, "kw_type": "natural"}],
        val_info=[{"name": "aishell", "root": root, "kw_type": "natural"}],
        test_info={"name": "aishell", "root": root, "kw_type": "natural"},
        hotwords_per_group=2,
        features_size=(32, 48),
        test_split="dev",
    )
    return dm


def test_fit_validate_test(tmp_path, datamodule):
    engine = KWSEngine(
        KWSTrainConfig(learning_rate=1e-3),
        resnet_config=TINY,
        features_size=(32, 48),
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    state = engine.fit(
        datamodule,
        max_epochs=2,
        early_stopping=EarlyStopping("metrics/f1", patience=5),
        limit_train_batches=3,
    )

    val = engine.validate(engine.variables(state), datamodule)
    assert "metrics/f1" in val and "metrics/f1_0" in val
    assert 0.0 <= val["metrics/f1"] <= 1.0
    assert np.isfinite(val["val/loss"])

    # checkpoints written and loadable
    ckpt, meta = load_checkpoint(str(tmp_path / "ckpt" / "final"))
    assert "params" in ckpt and meta["epoch"] == 1
    best, best_meta = load_checkpoint(str(tmp_path / "ckpt" / "f1_checkpoint"))
    assert best_meta["monitor"] == "metrics/f1"
    assert best_meta["hparams"]["learning_rate"] == pytest.approx(1e-3)

    # bootstrap-CI test path (reduced bootstraps through the public API is
    # exercised as-is; 1000 bootstraps over 15 points is fast)
    results = engine.test(engine.variables(state), datamodule)
    for key in ("Precision", "Recall", "F1"):
        assert key in results
        assert results[f"{key}_LB"] <= results[key] + 1e-9
        assert results[key] <= results[f"{key}_UB"] + 1e-9


def test_scores_match_reference_group_features(datamodule, root):
    """Catalog-scored probabilities == forwarding the reference's per-group
    resized matrices through the same model (dataset.item_features parity)."""
    import jax

    datamodule.setup("validate")
    dataset = list(datamodule.val_dataset.values())[0]
    engine = KWSEngine(KWSTrainConfig(), resnet_config=TINY, features_size=(32, 48))
    state = engine.init_state()
    variables = engine.variables(state)

    item = dataset[0]
    probs, _ = engine.score_utterance(variables, dataset, item["utt_hs"])

    want = []
    for g in range(dataset.catalog.num_groups()):
        feats = dataset.item_features(0, g)
        out = engine.kws.apply(variables, feats)
        want.append(np.asarray(jax.nn.softmax(out.logits, -1))[:, 1])
    want = np.concatenate(want) * np.asarray(item["hotword_mask"], np.float32)
    got = probs * np.asarray(item["hotword_mask"], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fit_resume(tmp_path, datamodule):
    engine = KWSEngine(
        KWSTrainConfig(learning_rate=1e-3),
        resnet_config=TINY,
        features_size=(32, 48),
        ckpt_dir=str(tmp_path / "ckpt_resume"),
    )
    engine.fit(datamodule, max_epochs=1, limit_train_batches=1)
    state = engine.fit(
        datamodule, max_epochs=3, limit_train_batches=1,
        resume_from=str(tmp_path / "ckpt_resume" / "final"),
    )
    assert state.epoch == 2  # resumed at 1, ran epochs 1..2


def test_validate_zh_en_aggregation(datamodule, root):
    """With 4 validation dataloaders the reference averages 0,1 into _zh and
    2,3 into _en (model.py:291-296)."""
    dm = KWSDataMod(
        batch_size=4,
        sampling="random",
        train_info=[{"name": "aishell", "root": root, "kw_type": "natural"}],
        val_info=[{"name": "aishell", "root": root, "kw_type": "natural"}] * 4,
        hotwords_per_group=2,
        features_size=(32, 48),
    )
    # dict-keyed val datasets collapse duplicates; build them manually
    dm.setup("fit")
    ds = dm._make_val_dataset(dm.val_info[0])
    dm.val_dataset = {f"v{i}": ds for i in range(4)}

    engine = KWSEngine(KWSTrainConfig(), resnet_config=TINY, features_size=(32, 48))
    state = engine.init_state()
    metrics = engine.validate(engine.variables(state), dm)
    assert "metrics/f1_zh" in metrics and "metrics/f1_en" in metrics
    import numpy as np

    np.testing.assert_allclose(
        metrics["metrics/f1_zh"],
        (metrics["metrics/f1_0"] + metrics["metrics/f1_1"]) / 2,
    )
    np.testing.assert_allclose(
        metrics["metrics/f1"],
        sum(metrics[f"metrics/f1_{i}"] for i in range(4)) / 4,
    )


def test_int8_scoring_matches_fp32_decisions(datamodule):
    """enable_int8_scoring: quantized catalog scoring preserves the fp32
    scorer's probabilities/threshold decisions on the engine surface."""
    datamodule.setup("validate")
    dataset = list(datamodule.val_dataset.values())[0]
    engine = KWSEngine(KWSTrainConfig(), resnet_config=TINY, features_size=(32, 48))
    variables = engine.variables(engine.init_state())

    item = dataset[0]
    p_ref, _ = engine.score_utterance(variables, dataset, item["utt_hs"])

    qvars = engine.enable_int8_scoring(variables, dataset, item["utt_hs"])
    p_q, _ = engine.score_utterance(qvars, dataset, item["utt_hs"])

    mask = np.asarray(item["hotword_mask"], np.float32)
    assert np.max(np.abs(p_ref * mask - p_q * mask)) < 0.08
    assert np.array_equal((p_ref * mask) > 0.5, (p_q * mask) > 0.5)

    # batched path dispatches to the quantized scorer by pytree shape
    p_b, _ = engine.score_utterances(qvars, dataset, [item["utt_hs"]] * 2)
    np.testing.assert_allclose(p_b[0], p_b[1], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(p_b[0], p_q, rtol=1e-4, atol=1e-4)

    # and fp32 variables STILL score through the fp32 path after int8 is
    # enabled (validate()/fit() keep working — the engine must not clobber
    # its float scorer)
    p_after, _ = engine.score_utterance(variables, dataset, item["utt_hs"])
    np.testing.assert_allclose(p_after, p_ref, rtol=1e-6, atol=1e-6)


def test_fit_resume_restores_opt_state(tmp_path, datamodule):
    """Checkpoints carry the optimizer state and resume restores it —
    Lightning's ckpt_path resume restores Adam moments, and restarting them
    from zero mid-run is not equivalent to an uninterrupted fit."""
    import jax

    engine = KWSEngine(
        KWSTrainConfig(learning_rate=1e-3),
        resnet_config=TINY,
        features_size=(32, 48),
        ckpt_dir=str(tmp_path / "ckpt_opt"),
    )
    state = engine.fit(datamodule, max_epochs=1, limit_train_batches=2)

    ckpt, _ = load_checkpoint(str(tmp_path / "ckpt_opt" / "final"))
    assert "opt_state" in ckpt

    engine2 = KWSEngine(
        KWSTrainConfig(learning_rate=1e-3),
        resnet_config=TINY,
        features_size=(32, 48),
        ckpt_dir=str(tmp_path / "ckpt_opt2"),
    )
    datamodule.setup("fit")
    fresh = engine2.init_state()
    from enhance_cb_whisper_tpu.runtime.checkpoint import load_checkpoint as _lc

    restored, _ = _lc(
        str(tmp_path / "ckpt_opt" / "final"),
        template={"params": fresh.params, "batch_stats": fresh.batch_stats,
                  "epoch": 0, "opt_state": fresh.opt_state},
    )
    # Adam moments after 2 steps are non-zero and must round-trip exactly
    saved_leaves = jax.tree.leaves(state.opt_state)
    restored_leaves = jax.tree.leaves(restored["opt_state"])
    assert len(saved_leaves) == len(restored_leaves)
    assert any(np.asarray(l).any() for l in saved_leaves if hasattr(l, "any"))
    for a, b in zip(saved_leaves, restored_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_channels_last(tmp_path, datamodule):
    """channels_last training through the engine: NHWC init + per-batch
    transpose of the collator's NCHW features; the trained params evaluate
    through the (NCHW) eval model — the layouts share one param tree."""
    engine = KWSEngine(
        KWSTrainConfig(learning_rate=1e-3, channels_last=True),
        resnet_config=TINY,
        features_size=(32, 48),
        ckpt_dir=str(tmp_path / "ckpt_cl"),
    )
    state = engine.fit(datamodule, max_epochs=1, limit_train_batches=2)
    # stem conv saw 2 input channels (TINY), not W=48 — would differ if the
    # NCHW dummy had been fed to the NHWC model
    stem = state.params["kws"]["model"]["feature_extractor"]["embedder"][
        "convolution"]["kernel"]
    assert stem.shape[2] == TINY.num_channels
    val = engine.validate(engine.variables(state), datamodule)
    assert 0.0 <= val["metrics/f1"] <= 1.0


def test_fit_zero_batches_no_crash(tmp_path, datamodule):
    """limit_train_batches=0 (a Lightning smoke setting) must not NameError
    on the post-epoch logging."""
    engine = KWSEngine(
        KWSTrainConfig(learning_rate=1e-3),
        resnet_config=TINY,
        features_size=(32, 48),
        ckpt_dir=str(tmp_path / "ckpt_zero"),
    )
    state = engine.fit(datamodule, max_epochs=1, limit_train_batches=0)
    assert state is not None


def test_resume_restores_step_and_best(tmp_path, datamodule):
    """Resume continues global_step (no RNG/metric-step replay) and seeds
    CheckpointManager.best from disk so a worse post-resume validation
    cannot overwrite a better best checkpoint."""
    from enhance_cb_whisper_tpu.runtime.checkpoint import CheckpointManager

    engine = KWSEngine(
        KWSTrainConfig(learning_rate=1e-3),
        resnet_config=TINY,
        features_size=(32, 48),
        ckpt_dir=str(tmp_path / "ckpt_sb"),
    )
    engine.fit(datamodule, max_epochs=1, limit_train_batches=2)

    ckpt, _ = load_checkpoint(str(tmp_path / "ckpt_sb" / "final"))
    assert int(ckpt["global_step"]) == 2

    manager = CheckpointManager(str(tmp_path / "ckpt_sb"),
                                {"f1_checkpoint": "metrics/f1:max"})
    best = manager.restore_best()
    assert "f1_checkpoint" in best
    # a non-improving metric must NOT overwrite the best checkpoint
    before = open(tmp_path / "ckpt_sb" / "f1_checkpoint" / "meta.json").read()
    manager.step(5, {"metrics/f1": best["f1_checkpoint"] - 1.0},
                 {"params": {}, "batch_stats": {}, "epoch": 5})
    after = open(tmp_path / "ckpt_sb" / "f1_checkpoint" / "meta.json").read()
    assert before == after
