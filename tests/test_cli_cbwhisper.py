"""End-to-end `cb-whisper.py test` CLI run: synthetic ACL-6060 dataset,
tiny random Whisper checkpoint on disk, mocked tokenizer — exercises config
parsing → dataset/catalog construction → KWS-checkpoint loading → biased
generation → entity recall (the flagship path, SURVEY.md §3.3)."""

import types

import jax
import numpy as np
import pytest
import torch
import yaml

import enhance_cb_whisper_tpu.cli.main as cli_main
from enhance_cb_whisper_tpu.cli import run_cli
from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.models.kws import KWSModel
from enhance_cb_whisper_tpu.runtime.checkpoint import save_checkpoint
from fixtures import make_acl

transformers = pytest.importorskip("transformers")

KW_LAYERS = 2


@pytest.fixture(scope="module")
def whisper_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("whisper_ckpt")
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


@pytest.fixture(scope="module")
def acl_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("acl")
    make_acl(str(root), kw_layers=KW_LAYERS, whisper_dim=32)
    return str(root)


@pytest.fixture(scope="module")
def kws_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("kws_ckpt") / "f1"
    cfg = ResNetConfig(
        num_channels=KW_LAYERS, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1), num_labels=2,
    )
    model = KWSModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, KW_LAYERS, 32, 48), np.float32)
    )
    save_checkpoint(
        str(d),
        {"params": {"kws": variables["params"]},
         "batch_stats": {"kws": variables["batch_stats"]}},
    )
    return str(d)


class FakeTokenizer:
    def convert_tokens_to_ids(self, token):
        return {"<|en|>": 10, "<|transcribe|>": 11, "<|startofprev|>": 99}.get(token, 12)

    def get_prompt_ids(self, text):
        return [99] + [20 + (ord(c) % 60) for c in text][:6]

    def decode(self, tokens, skip_special_tokens=True):
        return " ".join(f"w{t}" for t in tokens if 12 < t < 99)


def test_cbwhisper_cli_end_to_end(tmp_path, monkeypatch, whisper_ckpt, acl_root, kws_ckpt):
    gc = types.SimpleNamespace(
        decoder_start_token_id=3, no_timestamps_token_id=100, eos_token_id=2,
        pad_token_id=0, suppress_tokens=None, begin_suppress_tokens=None,
        max_initial_timestamp_index=10, prev_sot_token_id=99,
    )
    monkeypatch.setattr(
        transformers.WhisperTokenizer, "from_pretrained", classmethod(lambda cls, p: FakeTokenizer())
    )
    monkeypatch.setattr(
        transformers.GenerationConfig, "from_pretrained", classmethod(lambda cls, p: gc)
    )
    # shrink the hard-wired 12-channel ResNet-50 / [10:22] slice to test size
    monkeypatch.setattr(
        cli_main, "_cbwhisper_kws_resnet",
        lambda model_args: ResNetConfig(
            num_channels=KW_LAYERS, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
            depths=(1, 1, 1, 1), num_labels=2,
        ),
    )

    config = {
        "seed_everything": 123,
        "model": {
            "class_path": "model.cb_whisper.CBWhisper",
            "init_args": {
                "dataset": "acl",
                "split": "test",
                "root": acl_root,
                "kw_type": "tts",
                "encoder_ckpt": whisper_ckpt,
                "whisper_ckpt": whisper_ckpt,
                "kws_ckpt": kws_ckpt,
                "language": "english",
                "prompt": True,
                "oracle": "kws",
                "kws_features_size": [32, 48],
                "keywords_per_group": 2,
                "kws_layer_slice": [1, 3],
                "num_bootstraps": 20,
            },
        },
    }
    cfg_path = tmp_path / "cb.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    results = run_cli(["test", "--config", str(cfg_path)])
    assert 0.0 <= results["Entity Recall"] <= 1.0
    assert results["Entity Recall LB"] <= results["Entity Recall UB"]


def test_cbwhisper_cli_serving_knobs(tmp_path, monkeypatch, whisper_ckpt, acl_root, kws_ckpt):
    """TPU-serving knobs on the cb-whisper CLI surface: compute_dtype
    bfloat16 + weight-only int8 vocab projection + int8 decoder layers all
    plumb through config parsing into CBWhisper/WhisperGenerator and the
    flagship eval still produces a well-formed entity-recall result."""
    gc = types.SimpleNamespace(
        decoder_start_token_id=3, no_timestamps_token_id=100, eos_token_id=2,
        pad_token_id=0, suppress_tokens=None, begin_suppress_tokens=None,
        max_initial_timestamp_index=10, prev_sot_token_id=99,
    )
    monkeypatch.setattr(
        transformers.WhisperTokenizer, "from_pretrained", classmethod(lambda cls, p: FakeTokenizer())
    )
    monkeypatch.setattr(
        transformers.GenerationConfig, "from_pretrained", classmethod(lambda cls, p: gc)
    )
    monkeypatch.setattr(
        cli_main, "_cbwhisper_kws_resnet",
        lambda model_args: ResNetConfig(
            num_channels=KW_LAYERS, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
            depths=(1, 1, 1, 1), num_labels=2,
        ),
    )

    built = {}
    from enhance_cb_whisper_tpu.models import cb_whisper as cbw_mod

    orig_init = cbw_mod.CBWhisper.__init__

    def spy_init(self, *args, **kwargs):
        built.update(
            dtype=kwargs.get("dtype"),
            vocab_int8=kwargs.get("vocab_int8"),
            decoder_int8=kwargs.get("decoder_int8"),
        )
        return orig_init(self, *args, **kwargs)

    monkeypatch.setattr(cbw_mod.CBWhisper, "__init__", spy_init)

    config = {
        "model": {
            "class_path": "model.cb_whisper.CBWhisper",
            "init_args": {
                "dataset": "acl",
                "split": "test",
                "root": acl_root,
                "kw_type": "tts",
                "encoder_ckpt": whisper_ckpt,
                "whisper_ckpt": whisper_ckpt,
                "kws_ckpt": kws_ckpt,
                "language": "english",
                "prompt": True,
                "oracle": "kws",
                "kws_features_size": [32, 48],
                "keywords_per_group": 2,
                "kws_layer_slice": [1, 3],
                "num_bootstraps": 20,
                "compute_dtype": "bfloat16",
                "vocab_int8": True,
                "decoder_int8": True,
            },
        },
    }
    cfg_path = tmp_path / "cb-serving.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    results = run_cli(["test", "--config", str(cfg_path)])
    assert 0.0 <= results["Entity Recall"] <= 1.0
    import jax.numpy as jnp

    assert built["dtype"] == jnp.bfloat16
    assert built["vocab_int8"] is True and built["decoder_int8"] is True


def test_validate_decode_int8_kv_qualifier(tmp_path, monkeypatch, whisper_ckpt,
                                           acl_root, kws_ckpt):
    """tools/validate_approx.py::validate_decode — the decode-lever
    qualifier (int8 KV cache vs exact) through the cb-whisper path reports
    transcript-diff rate, similarity, and the entity-recall delta."""
    import importlib.util
    import os

    gc = types.SimpleNamespace(
        decoder_start_token_id=3, no_timestamps_token_id=100, eos_token_id=2,
        pad_token_id=0, suppress_tokens=None, begin_suppress_tokens=None,
        max_initial_timestamp_index=10, prev_sot_token_id=99,
    )
    monkeypatch.setattr(
        transformers.WhisperTokenizer, "from_pretrained", classmethod(lambda cls, p: FakeTokenizer())
    )
    monkeypatch.setattr(
        transformers.GenerationConfig, "from_pretrained", classmethod(lambda cls, p: gc)
    )
    monkeypatch.setattr(
        cli_main, "_cbwhisper_kws_resnet",
        lambda model_args: ResNetConfig(
            num_channels=KW_LAYERS, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
            depths=(1, 1, 1, 1), num_labels=2,
        ),
    )
    config = {
        "model": {
            "class_path": "model.cb_whisper.CBWhisper",
            "init_args": {
                "dataset": "acl", "split": "test", "root": acl_root,
                "kw_type": "tts", "encoder_ckpt": whisper_ckpt,
                "whisper_ckpt": whisper_ckpt, "kws_ckpt": kws_ckpt,
                "language": "english", "prompt": True, "oracle": "kws",
                "kws_features_size": [32, 48], "keywords_per_group": 2,
                "kws_layer_slice": [1, 3], "num_bootstraps": 20,
            },
        },
    }
    cfg_path = tmp_path / "cb-decode.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "validate_approx", os.path.join(repo, "tools", "validate_approx.py")
    )
    va = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(va)

    report = va.validate_decode(str(cfg_path), None, None,
                                levers=("kv", "kv+stg"))
    assert set(report) == {"exact", "kv", "kv+stg"}
    for mode in ("kv", "kv+stg"):
        kv = report[mode]
        assert 0.0 <= kv["transcript_diff_rate"] <= 1.0
        assert 0.0 <= kv["transcript_similarity_mean"] <= 1.0
        assert "entity_recall_delta" in kv
        # int8 KV rounding (staged or not) is a small perturbation, not a
        # rewrite
        assert kv["transcript_similarity_mean"] > 0.5
