"""The reference's OWN config files through our dispatcher.

SURVEY.md §5: "This CLI surface is the public API the new framework must
keep: same four entry points, same YAML schema."  These tests consume the
reference's literal YAML files from /root/reference (placeholders filled via
the CLI's ``--set NAME=value`` mechanism — the reference's usage contract,
README.md:79,97,143; some files are not even valid YAML until filled,
e.g. train.yaml:141) plus this repo's shipped ``configs/*.yaml``.

Tiny-model knobs (features_size, batch sizes, checkpoint paths pointing at
local tiny models) are applied through the SAME dotted-override surface a
real user has — the schema keys themselves are the reference's.
"""

import glob
import os
import shutil
import types

import numpy as np
import pytest
import yaml

import enhance_cb_whisper_tpu.cli.main as cli_main
from enhance_cb_whisper_tpu.cli import run_cli
from enhance_cb_whisper_tpu.cli.config import (
    check_placeholders,
    fill_placeholders_text,
)
from fixtures import (
    make_acl,
    make_aishell_hotword,
    make_aishell_kws,
    make_mls,
)

transformers = pytest.importorskip("transformers")

REF = "/root/reference/src/configs"
REF_EFF = "/root/reference/src/efficient_kws/configs"
SHIPPED = os.path.join(os.path.dirname(__file__), "..", "configs")

MLS_LANGS = ("English", "German", "French", "Spanish", "Polish", "Portuguese")


def _sets(mapping):
    args = []
    for k, v in mapping.items():
        args += ["--set", f"{k}={v}"]
    return args


# --------------------------------------------------------------------- worlds


@pytest.fixture(scope="module")
def aishell_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_aishell")
    make_aishell_kws(str(root))
    make_aishell_hotword(str(root))
    hot = root / "hotword"
    # both kw_type dirs + a test split (the reference eval configs use
    # test_split: test and kw_type tts/natural)
    shutil.copytree(hot / "dev" / "keywords-hs" / "natural",
                    hot / "dev" / "keywords-hs" / "tts")
    shutil.copytree(hot / "dev", hot / "test")
    # wavs for CB-Whisper: wav/test/S0000/BAC009S0000W0000.wav
    import wave

    rng = np.random.default_rng(5)
    for line in open(hot / "test" / "text"):
        code = line.split()[0]
        sub = code[len("BAC009"):code.index("W")]
        d = root / "wav" / "test" / sub
        os.makedirs(d, exist_ok=True)
        wav = (rng.standard_normal(16000) * 0.05).astype(np.float32)
        with wave.open(str(d / f"{code}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((wav * 32767).astype("<i2").tobytes())
    return str(root)


@pytest.fixture(scope="module")
def acl_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_acl")
    make_acl(str(root), split="eval", kw_layers=3, whisper_dim=32)
    make_acl(str(root), split="dev", kw_layers=3, whisper_dim=32)
    for split in ("eval", "dev"):
        base = os.path.join(str(root), "2", "acl_6060", split, "keywords-hs")
        shutil.copytree(os.path.join(base, "tts"), os.path.join(base, "natural"))
    return str(root)


@pytest.fixture(scope="module")
def acl_root_eff(tmp_path_factory):
    """ACL world at the MLS embedding dim (8): the efficient-kws eval
    projects RAW hidden states, so the eval corpus dim must match the
    checkpoint trained on the MLS world (the dim-32 ``acl_root`` serves the
    whisper-sized paper-1/CB-Whisper configs)."""
    root = tmp_path_factory.mktemp("ref_acl_eff")
    make_acl(str(root), split="eval", kw_layers=3, whisper_dim=8)
    make_acl(str(root), split="dev", kw_layers=3, whisper_dim=8)
    for split in ("eval", "dev"):
        base = os.path.join(str(root), "2", "acl_6060", split, "keywords-hs")
        shutil.copytree(os.path.join(base, "tts"), os.path.join(base, "natural"))
    return str(root)


@pytest.fixture(scope="module")
def mls_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_mls")
    # n_keywords >= 6: the reference sampling scheme draws 5 DISTINCT
    # keywords per utterance (2 positives + 1 random + 1 forward-lex +
    # 1 reverse-lex, sampler.py:55-77) — fewer keywords makes the
    # rejection loops infeasible (KWSSampler raises)
    make_mls(str(root), languages=MLS_LANGS, n_keywords=6, n_utts=2)
    # the reference eval configs also read tts dev keyword caches
    for lang in MLS_LANGS:
        base = os.path.join(str(root), f"mls_{lang.lower()}_opus", "dev", "keywords-hs")
        shutil.copytree(os.path.join(base, "natural"), os.path.join(base, "tts"))
    return str(root)


@pytest.fixture(scope="module")
def whisper_ckpt(tmp_path_factory):
    import torch

    d = tmp_path_factory.mktemp("ref_whisper_ckpt")
    hf_config = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=8, d_model=32,
        encoder_layers=3, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    transformers.WhisperForConditionalGeneration(hf_config).save_pretrained(str(d))
    return str(d)


# ------------------------------------------------------- parse every config


def _generic_placeholders(root="/tmp/x"):
    names = [
        "AISHELL_ROOT", "ACL_ROOT", "MLS_ROOT", "TRAIN_DATASET_ROOT",
        "DEFAULT_ROOT_DIR", "CKPT", "KWS_CKPT", "WHISPER_CKPT",
        "WHISPER_LOCAL_DIR", "WHISPER_LARGE_V3_LOCAL_DIR",
        "MLS_EXPANDED_ROOT", "RUN_NAME", "URL",
    ]
    vals = {n: root for n in names}
    vals.update(
        MAX_EPOCHS=1, EVERY_N_EPOCHS=1, PATIENCE=1, NUM_DOMAINS=2,
        LR_STEP_SCHEDULER=7, F1_CODE="zh", MODALITY="natural",
        ADVERSARIAL_TRAINING="false", ADVERSARIAL_TRAINED="false",
        ENTROPY_LOSS="false", TRAIN_DATASET_NAME="aishell",
        BIASING_PROMPT="true", RETRIEVED_KEYWORDS="kws", THRESHOLD=0.5,
        RUN_NAME="run", URL="null",
    )
    return vals


ALL_CONFIGS = (
    sorted(glob.glob(os.path.join(REF, "*.yaml")))
    + sorted(glob.glob(os.path.join(REF_EFF, "*.yaml")))
    + sorted(glob.glob(os.path.join(SHIPPED, "*.yaml")))
    + sorted(glob.glob(os.path.join(SHIPPED, "efficient_kws", "*.yaml")))
)


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: os.path.relpath(p, "/"))
def test_config_parses_and_routes(path):
    """Every reference AND shipped YAML: placeholders filled → valid YAML →
    zero remaining placeholders → a class_path our dispatcher routes."""
    with open(path) as f:
        raw = f.read()
    filled = fill_placeholders_text(raw, _generic_placeholders())
    config = yaml.safe_load(filled)
    assert isinstance(config, dict)
    assert check_placeholders(config) == []
    class_path = (config.get("model") or {}).get("class_path", "")
    routed = (
        class_path in cli_main.PAPER1_MODELS
        or class_path in cli_main.PAPER2_MODELS
        or class_path in cli_main.CBWHISPER_MODELS
    )
    assert routed, f"{path}: unrouted class_path {class_path!r}"


# ------------------------------------------------- paper 1: train + kws eval


@pytest.fixture(scope="module")
def paper1_ckpt(tmp_path_factory, aishell_root, acl_root):
    """Fit through the reference's verbatim train.yaml; returns the final
    checkpoint dir (consumed by the kws/cb-whisper eval configs)."""
    run_dir = str(tmp_path_factory.mktemp("ref_train_run"))
    sets = {
        "RUN_NAME": "refrun", "URL": "null",
        "MAX_EPOCHS": 1, "EVERY_N_EPOCHS": 1, "PATIENCE": 1,
        "DEFAULT_ROOT_DIR": run_dir, "F1_CODE": "zh",
        "TRAIN_DATASET_NAME": "aishell", "TRAIN_DATASET_ROOT": aishell_root,
        "AISHELL_ROOT": aishell_root, "ACL_ROOT": acl_root,
        "MODALITY": "natural", "ADVERSARIAL_TRAINING": "false",
        "ENTROPY_LOSS": "false", "NUM_DOMAINS": 2, "LR_STEP_SCHEDULER": 7,
    }
    overrides = [
        # tiny-run knobs via the SAME dotted-override surface users have
        "--trainer.limit_train_batches", "1",
        "--data.init_args.features_size", "[32, 48]",
        "--data.init_args.hotwords_per_group", "4",
        "--model.init_args.num_channels", "3",
        "--model.init_args.batch_size", "4",
        "--model.init_args.accumulate_grad_batches", "1",
    ]
    run_cli(["fit", "--config", os.path.join(REF, "train.yaml")]
            + _sets(sets) + overrides)
    ckpt = os.path.join(run_dir, "checkpoints", "final")
    assert os.path.exists(os.path.join(ckpt, "state.msgpack"))
    return ckpt


@pytest.mark.parametrize("name", ["kws-acl.yaml", "kws-aishell.yaml"])
def test_reference_kws_eval_config(tmp_path, name, aishell_root, acl_root, paper1_ckpt):
    sets = {
        "AISHELL_ROOT": aishell_root, "ACL_ROOT": acl_root,
        "MODALITY": "natural", "CKPT": paper1_ckpt,
        "ADVERSARIAL_TRAINED": "false", "NUM_DOMAINS": 2,
        "DEFAULT_ROOT_DIR": str(tmp_path),
    }
    overrides = [
        "--data.init_args.features_size", "[32, 48]",
        "--data.init_args.hotwords_per_group", "4",
        "--model.init_args.num_channels", "3",
    ]
    results = run_cli(["test", "--config", os.path.join(REF, name)]
                      + _sets(sets) + overrides)
    assert "F1" in results


class _FakeTokenizer:
    def convert_tokens_to_ids(self, token):
        return {"<|en|>": 10, "<|zh|>": 13, "<|transcribe|>": 11,
                "<|startofprev|>": 99}.get(token, 12)

    def get_prompt_ids(self, text):
        return [99] + [20 + (ord(c) % 60) for c in text][:6]

    def decode(self, tokens, skip_special_tokens=True):
        return " ".join(f"w{t}" for t in tokens if 12 < t < 99)


@pytest.mark.parametrize("name", ["cb-whisper-acl.yaml", "cb-whisper-aishell.yaml"])
def test_reference_cbwhisper_config(tmp_path, monkeypatch, name, aishell_root,
                                    acl_root, whisper_ckpt, paper1_ckpt):
    gc = types.SimpleNamespace(
        decoder_start_token_id=3, no_timestamps_token_id=100, eos_token_id=2,
        pad_token_id=0, suppress_tokens=None, begin_suppress_tokens=None,
        max_initial_timestamp_index=10, prev_sot_token_id=99,
    )
    monkeypatch.setattr(
        transformers.WhisperTokenizer, "from_pretrained",
        classmethod(lambda cls, p: _FakeTokenizer()),
    )
    monkeypatch.setattr(
        transformers.GenerationConfig, "from_pretrained",
        classmethod(lambda cls, p: gc),
    )

    sets = {
        "AISHELL_ROOT": aishell_root, "ACL_ROOT": acl_root,
        "WHISPER_CKPT": whisper_ckpt, "CKPT": paper1_ckpt,
        "MODALITY": "natural", "BIASING_PROMPT": "true",
        "RETRIEVED_KEYWORDS": "kws", "DEFAULT_ROOT_DIR": str(tmp_path),
    }
    overrides = [
        # the reference hard-codes encoder_ckpt: openai/whisper-medium
        # (cb-whisper-acl.yaml:77) — unreachable in a zero-egress
        # environment; point it at the local tiny checkpoint
        "--model.init_args.encoder_ckpt", whisper_ckpt,
        "--model.init_args.kws_features_size", "[32, 48]",
        "--model.init_args.kws_layer_slice", "[1, 4]",
        "--model.init_args.keywords_per_group", "4",
        "--model.init_args.num_bootstraps", "20",
        "--model.init_args.kws_num_channels", "3",
        "--data.init_args.features_size", "[32, 48]",
        "--data.init_args.hotwords_per_group", "4",
    ]
    results = run_cli(["test", "--config", os.path.join(REF, name)]
                      + _sets(sets) + overrides)
    assert 0.0 <= results["Entity Recall"] <= 1.0


# ------------------------------------------- paper 2: train L/LE/LEF + evals

EFF_TINY_OVERRIDES = [
    # train-{L,LE,LEF}.yaml hard-code max_epochs: 800 / patience: 80 — a
    # real user would also trim these for a smoke run; without them the
    # fixture fit loops for ~45 min on one CPU core
    "--trainer.max_epochs", "1",
    "--early_stopping.patience", "1",
    "--model.init_args.embedding_dim", "8",
    "--model.init_args.features_size", "[32, 64]",
    "--model.init_args.batch_size", "4",
    "--model.init_args.accumulate_grad_batches", "1",
    "--model.init_args.resnet_version", "resnet-18",
    "--trainer.limit_train_batches", "1",
    "--data.init_args.keywords_per_group", "4",
]


@pytest.fixture(scope="module")
def eff_ckpts(tmp_path_factory, mls_root, aishell_root):
    """Fit each reference train-{L,LE,LEF}.yaml verbatim; return ckpts."""
    out = {}
    for variant in ("L", "LE", "LEF"):
        run_dir = str(tmp_path_factory.mktemp(f"ref_eff_{variant}"))
        sets = {
            "RUN_NAME": "r", "URL": "null", "MAX_EPOCHS": 1,
            "EVERY_N_EPOCHS": 1, "PATIENCE": 1,
            "MLS_ROOT": mls_root, "DEFAULT_ROOT_DIR": run_dir,
            # the train configs carry a test_info block whose [AISHELL_ROOT]
            # is unused during fit, but run_cli (like the reference's usage
            # contract) requires EVERY placeholder filled before dispatch
            "AISHELL_ROOT": aishell_root,
        }
        run_cli(["fit", "--config", os.path.join(REF_EFF, f"train-{variant}.yaml")]
                + _sets(sets) + EFF_TINY_OVERRIDES)
        ckpt = os.path.join(run_dir, "checkpoints", "final")
        assert os.path.exists(os.path.join(ckpt, "state.msgpack"))
        out[variant] = ckpt
    return out


@pytest.mark.parametrize("variant", ["L", "LE", "LEF"])
@pytest.mark.parametrize("which", ["acl", "aishell"])
def test_reference_eff_eval_config(tmp_path, variant, which, mls_root,
                                   aishell_root, acl_root_eff, eff_ckpts):
    name = f"eval-{variant}-comp-{which}.yaml"
    sets = {
        "MLS_ROOT": mls_root, "AISHELL_ROOT": aishell_root,
        "ACL_ROOT": acl_root_eff, "CKPT": eff_ckpts[variant],
        "THRESHOLD": 0.5, "DEFAULT_ROOT_DIR": str(tmp_path),
        "RUN_NAME": "r", "URL": "null",
    }
    results = run_cli(["test", "--config", os.path.join(REF_EFF, name)]
                      + _sets(sets) + EFF_TINY_OVERRIDES)
    assert results is not None
