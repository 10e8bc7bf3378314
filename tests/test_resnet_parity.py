"""Golden-parity test: flax ResNet vs HF ResNetModel (torch CPU).

The reference's classifier is literally HF ResNetModel + Flatten + Linear
(src/model/resnet.py:5-34); transcript-level parity requires the flax
reimplementation to agree numerically with converted weights."""

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.models import ResNet, ResNetClassifier, ResNetConfig
from enhance_cb_whisper_tpu.models.torch_compat import (
    load_hf_resnet,
    load_hf_resnet_classifier,
)

transformers = pytest.importorskip("transformers")


def _tiny_hf_config(layer_type):
    return transformers.ResNetConfig(
        num_channels=4,
        embedding_size=8,
        hidden_sizes=[8, 16, 24, 32],
        depths=[1, 1, 1, 1],
        layer_type=layer_type,
    )


def _tiny_config(layer_type):
    return ResNetConfig(
        num_channels=4,
        embedding_size=8,
        hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1),
        layer_type=layer_type,
        num_labels=2,
    )


@pytest.mark.parametrize("layer_type", ["bottleneck", "basic"])
def test_resnet_matches_hf(layer_type):
    torch.manual_seed(0)
    hf = transformers.ResNetModel(_tiny_hf_config(layer_type)).eval()
    x = np.random.default_rng(0).standard_normal((2, 4, 64, 96), dtype=np.float32)

    with torch.no_grad():
        want = hf(torch.from_numpy(x)).pooler_output.flatten(1).numpy()

    model = ResNet(_tiny_config(layer_type))
    variables = load_hf_resnet(hf.state_dict(), _tiny_config(layer_type))
    got = np.asarray(model.apply(variables, x, train=False))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resnet_classifier_matches_reference_head():
    """The reference wraps HF ResNetModel with Flatten+Linear
    (src/model/resnet.py:24-27); check logits parity end to end."""
    torch.manual_seed(1)
    hf = transformers.ResNetModel(_tiny_hf_config("bottleneck")).eval()
    head = torch.nn.Linear(32, 2)
    x = np.random.default_rng(1).standard_normal((3, 4, 48, 48), dtype=np.float32)

    with torch.no_grad():
        feats = hf(torch.from_numpy(x)).pooler_output.flatten(1)
        want_logits = head(feats).numpy()

    sd = {f"feature_extractor.{k}": v for k, v in hf.state_dict().items()}
    sd["classifier.1.weight"] = head.weight
    sd["classifier.1.bias"] = head.bias

    cfg = _tiny_config("bottleneck")
    model = ResNetClassifier(cfg)
    variables = load_hf_resnet_classifier(sd, cfg)
    got_logits, got_feats = model.apply(variables, x, train=False)

    np.testing.assert_allclose(np.asarray(got_feats), feats.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits, rtol=1e-4, atol=1e-4)


def test_resnet_train_mode_updates_stats():
    cfg = _tiny_config("basic")
    model = ResNet(cfg)
    import jax

    x = np.zeros((2, 4, 32, 32), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, new_state = model.apply(
        variables, np.ones_like(x), train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["embedder"]["normalization"]["mean"]
    after = new_state["batch_stats"]["embedder"]["normalization"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
