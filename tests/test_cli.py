"""CLI tests: YAML configs through the four entry points' dispatcher
(reference surface: run_CLI.py / kws.py — LightningCLI subcommands)."""

import os

import pytest
import yaml

from enhance_cb_whisper_tpu.cli import run_cli
from enhance_cb_whisper_tpu.cli.config import apply_overrides, check_placeholders, load_config
from fixtures import make_aishell_hotword, make_aishell_kws


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_aishell")
    make_aishell_kws(str(root))
    make_aishell_hotword(str(root))
    return str(root)


def _write_config(path, root, run_dir):
    config = {
        "seed_everything": 123,
        "trainer": {
            "max_epochs": 1,
            "check_val_every_n_epoch": 1,
            "limit_train_batches": 2,
            "default_root_dir": run_dir,
        },
        "f1_checkpoint": {"monitor": "metrics/f1", "mode": "max"},
        "early_stopping": {"monitor": "metrics/f1", "patience": 5, "mode": "max"},
        "model": {
            "class_path": "model.model.KWSModel",
            "init_args": {
                "sampling": "random",
                "kw_type": "natural",
                "batch_size": 4,
                "learning_rate": 1e-3,
            },
        },
        "data": {
            "class_path": "data.data_module.KWSDataMod",
            "init_args": {
                "train_info": [{"name": "aishell", "root": root, "kw_type": "natural"}],
                "val_info": [{"name": "aishell", "root": root, "kw_type": "natural"}],
                "test_info": {"name": "aishell", "root": root, "kw_type": "natural"},
                "test_split": "dev",
                "features_size": [32, 48],
                "hotwords_per_group": 2,
                "batch_size": 4,
                "sampling": "random",
            },
        },
        "ckpt_path": None,
    }
    with open(path, "w") as f:
        yaml.safe_dump(config, f)


@pytest.fixture(scope="module")
def tiny_engine_patch():
    from fixtures import tiny_paper1_patch

    with tiny_paper1_patch():
        yield


def test_cli_fit_then_test(tmp_path, root, tiny_engine_patch):
    run_dir = str(tmp_path / "run")
    cfg = tmp_path / "train.yaml"
    _write_config(cfg, root, run_dir)

    run_cli(["fit", "--config", str(cfg)])
    ckpt = os.path.join(run_dir, "checkpoints", "final")
    assert os.path.exists(os.path.join(ckpt, "state.msgpack"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))

    results = run_cli(["test", "--config", str(cfg), "--ckpt_path", ckpt])
    assert "F1" in results

    # int8 quantized scoring through the same surface (kws_int8 extension):
    # F1 on the tiny fixture must agree with the fp32 run
    results_q = run_cli(
        ["test", "--config", str(cfg), "--ckpt_path", ckpt, "--model.init_args.kws_int8", "true"]
    )
    assert abs(results_q["F1"] - results["F1"]) < 0.05


def test_placeholder_detection(tmp_path):
    cfg = tmp_path / "bad.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump({"model": {"init_args": {"root": "[FILL_ME]"}}}, f)
    with pytest.raises(SystemExit, match="PLACEHOLDER"):
        run_cli(["fit", "--config", str(cfg)])


def test_overrides():
    config = {"a": {"b": 1}}
    out = apply_overrides(config, ["--a.b", "5", "--a.c", "[1, 2]"])
    assert out["a"]["b"] == 5 and out["a"]["c"] == [1, 2]


def test_cli_efficient_kws_fit(tmp_path):
    """run_efficient_kws.py fit through the dispatcher on a tiny MLS fixture."""
    from fixtures import make_mls

    root = tmp_path / "mls"
    root.mkdir()
    make_mls(str(root), languages=("English", "German"))
    run_dir = str(tmp_path / "run2")
    config = {
        "seed_everything": 123,
        "trainer": {"max_epochs": 1, "limit_train_batches": 2,
                    "default_root_dir": run_dir},
        "f1_checkpoint": {"monitor": "metrics/f1", "mode": "max"},
        "model": {
            "class_path": "efficient_kws.model.KWSModel",
            "init_args": {
                "sampling": "random",
                "kw_type": "natural",
                "batch_size": 4,
                "n_layers": 2,
                "embedding_dim": 8,
                "learn_features": True,
                "proj_mlp": True,
                "proj_mlp_units": 4,
                "resnet_version": "resnet-18",
                "features_size": [32, 64],
                "pad_long_before_resize": True,
            },
        },
        "data": {
            "class_path": "efficient_kws.data_module.KWSDataMod",
            "init_args": {
                "train_info": [{"name": "mls", "root": str(root), "kw_type": "natural"}],
                "val_info": [
                    {"language": "English", "root": str(root), "kw_type": "natural"},
                    {"language": "German", "root": str(root), "kw_type": "natural"},
                ],
                "keywords_per_group": 2,
                "languages": ["English", "German"],
            },
        },
    }
    cfg = tmp_path / "lef.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)
    run_cli(["fit", "--config", str(cfg)])
    assert os.path.exists(os.path.join(run_dir, "checkpoints", "final", "state.msgpack"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))


def test_load_reference_lightning_checkpoint(tmp_path):
    """A reference-format Lightning .ckpt (torch state_dict under 'model.',
    incl. the legacy 'model.resnet.' layout) loads into flax variables and
    produces the same logits as the torch source."""
    import numpy as np
    import torch

    transformers = pytest.importorskip("transformers")
    import enhance_cb_whisper_tpu.cli.main as main
    from enhance_cb_whisper_tpu.models import KWSModel, ResNetConfig

    hf_cfg = transformers.ResNetConfig(
        num_channels=3, embedding_size=8, hidden_sizes=[8, 16, 24, 32],
        depths=[1, 1, 1, 1],
    )
    torch.manual_seed(0)
    hf = transformers.ResNetModel(hf_cfg).eval()
    head = torch.nn.Linear(32, 2)

    sd = {f"model.feature_extractor.{k}": v for k, v in hf.state_dict().items()}
    sd["model.classifier.1.weight"] = head.weight
    sd["model.classifier.1.bias"] = head.bias
    ckpt_path = tmp_path / "reference.ckpt"
    torch.save({"state_dict": sd}, ckpt_path)

    cfg = ResNetConfig(
        num_channels=3, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1), num_labels=2,
    )
    variables = main._load_kws_variables(str(ckpt_path), cfg)

    x = np.random.default_rng(0).standard_normal((2, 3, 48, 48), dtype=np.float32)
    model = KWSModel(cfg)
    got = np.asarray(model.apply(variables, x).logits)
    with torch.no_grad():
        want = head(hf(torch.from_numpy(x)).pooler_output.flatten(1)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # legacy 'model.resnet.' layout migrates through the shim
    legacy = {
        ("model.resnet." + k[len("model.feature_extractor."):] if k.startswith("model.feature_extractor.") else k): v
        for k, v in sd.items()
    }
    torch.save({"state_dict": legacy}, tmp_path / "legacy.ckpt")
    variables2 = main._load_kws_variables(str(tmp_path / "legacy.ckpt"), cfg)
    got2 = np.asarray(model.apply(variables2, x).logits)
    np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-4)


def test_cli_efficient_kws_validate_from_reference_ckpt(tmp_path):
    """run_efficient_kws.py validate with ckpt_path pointing at a
    reference-format Lightning .ckpt FILE (torch state dict) — the paper-2
    torch->flax conversion (efficient_kws/torch_compat.py; forward parity
    pinned by tests/test_efficient_model_differential.py) wired through the
    CLI surface end-to-end."""
    import torch
    import transformers

    from fixtures import make_mls

    root = tmp_path / "mls"
    root.mkdir()
    make_mls(str(root), languages=("English", "German"))

    # reference-layout state dict: Resnet wrapper + per-layer projector
    n_layers, D, U = 2, 8, 4
    hf_cfg = transformers.ResNetConfig(
        num_channels=n_layers, layer_type="basic",
        hidden_sizes=[64, 128, 256, 512], depths=[2, 2, 2, 2], num_labels=2,
    )
    torch.manual_seed(0)
    hf = transformers.ResNetModel(hf_cfg)
    head = torch.nn.Linear(512, 2)
    sd = {f"model.feature_extractor.{k}": v for k, v in hf.state_dict().items()}
    sd["model.classifier.1.weight"] = head.weight
    sd["model.classifier.1.bias"] = head.bias
    for i in range(n_layers):
        lin0, lin1 = torch.nn.Linear(D, D // 2), torch.nn.Linear(D // 2, U)
        sd[f"projector.{i}.0.weight"] = lin0.weight
        sd[f"projector.{i}.0.bias"] = lin0.bias
        sd[f"projector.{i}.2.weight"] = lin1.weight
        sd[f"projector.{i}.2.bias"] = lin1.bias
    ckpt_file = tmp_path / "reference-lef.ckpt"
    torch.save({"state_dict": sd, "epoch": 3, "global_step": 120}, ckpt_file)

    config = {
        "seed_everything": 7,
        "trainer": {"default_root_dir": str(tmp_path / "run")},
        "ckpt_path": str(ckpt_file),
        "model": {
            "class_path": "efficient_kws.model.KWSModel",
            "init_args": {
                "sampling": "random",
                "kw_type": "natural",
                "n_layers": n_layers,
                "embedding_dim": D,
                "learn_features": True,
                "proj_mlp": True,
                "proj_mlp_units": U,
                "resnet_version": "resnet-18",
                "features_size": [32, 64],
            },
        },
        "data": {
            "class_path": "efficient_kws.data_module.KWSDataMod",
            "init_args": {
                "train_info": [{"name": "mls", "root": str(root), "kw_type": "natural"}],
                "val_info": [
                    {"language": "English", "root": str(root), "kw_type": "natural"},
                ],
                "keywords_per_group": 2,
                "languages": ["English", "German"],
            },
        },
    }
    cfg = tmp_path / "val.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)
    metrics = run_cli(["validate", "--config", str(cfg)])
    assert metrics, "validate returned no metrics"
