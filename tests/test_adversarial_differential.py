"""Differential: the adversarial branch vs the reference's torch modules run
VERBATIM (src/model/{discriminator,heads,entropyLoss}.py import cleanly —
no shims needed).

Pins, with converted weights and shared random inputs:
* GRL value + GRADIENT (backward multiplies by -beta — discriminator.py:
  10-26) through both reverse senses;
* Discriminator forward + CE loss with the linear head
  (ResNetDiscriminator) and the 3-layer MLP head
  (ResNetDiscriminatorLarge, dropout inactive in eval) — heads.py:4-54;
* HLoss entropy value + gradient (softmax·log_softmax sum-mean,
  entropyLoss.py:9-16).

The DANNCE inner loop is deliberately NOT differential-tested: its
BatchNorm/batching semantics deviate by design (docs/PARITY.md #20).
"""

import numpy as np
import pytest
import torch

from ref_shims import load_reference_package_module, restore_modules


@pytest.fixture(scope="module")
def ref_mods():
    disc, saved = load_reference_package_module("model.discriminator", {})
    heads, _ = load_reference_package_module("model.heads", {})
    ent, _ = load_reference_package_module("model.entropyLoss", {})
    yield disc, heads, ent
    restore_modules(saved)


@pytest.mark.parametrize("reverse", [True, False])
@pytest.mark.parametrize("beta", [0.0, 0.3, 1.0])
def test_grad_reverse_matches_reference(ref_mods, beta, reverse):
    disc_mod, _, _ = ref_mods
    import jax
    import jax.numpy as jnp

    from enhance_cb_whisper_tpu.models.kws import grad_reverse

    x = np.random.default_rng(0).standard_normal((4, 6)).astype(np.float32)
    up = np.random.default_rng(1).standard_normal((4, 6)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    yt = disc_mod.grad_reverse(xt, beta=beta, reverse=reverse)
    yt.backward(torch.from_numpy(up))
    want_grad = xt.grad.numpy()

    # our grad_reverse is the reverse=True GRL; reverse=False is +beta
    signed_beta = beta if reverse else -beta
    y, vjp = jax.vjp(lambda v: grad_reverse(v, signed_beta), jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(y), x)
    np.testing.assert_allclose(np.asarray(vjp(jnp.asarray(up))[0]), want_grad,
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("large", [False, True])
def test_discriminator_matches_reference(ref_mods, large):
    disc_mod, heads_mod, _ = ref_mods
    import jax
    import numpy as np

    from enhance_cb_whisper_tpu.models.kws import Discriminator

    in_features, num_labels, beta = 12, 4, 0.7
    torch.manual_seed(0)
    head_cls = (heads_mod.ResNetDiscriminatorLarge if large
                else heads_mod.ResNetDiscriminator)
    ref = disc_mod.Discriminator(head=head_cls(in_features, num_labels))
    ref.set_beta(beta)
    ref.eval()  # dropout inactive (the reference evaluates in eval() mode)

    # convert Sequential Linear weights -> our DiscriminatorHead params
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    if large:
        params = {"head": {
            f"dense_{j}": {"kernel": sd[f"head.layers.{i}.weight"].T,
                           "bias": sd[f"head.layers.{i}.bias"]}
            for j, i in enumerate((1, 4, 7))
        }}
    else:
        params = {"head": {
            "linear": {"kernel": sd["head.layers.1.weight"].T,
                       "bias": sd["head.layers.1.bias"]},
        }}

    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, in_features)).astype(np.float32)
    labels = rng.integers(0, num_labels, 5)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), labels=torch.from_numpy(labels))

    ours = Discriminator(num_labels=num_labels, large=large)
    out = ours.apply({"params": params}, x, beta=beta,
                     labels=np.asarray(labels))
    np.testing.assert_allclose(np.asarray(out.logits), want.logits.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(out.loss), float(want.loss),
                               rtol=1e-5, atol=1e-6)


def test_entropy_loss_matches_reference(ref_mods):
    _, _, ent_mod = ref_mods
    import jax
    import jax.numpy as jnp

    from enhance_cb_whisper_tpu.models.kws import entropy_loss

    x = np.random.default_rng(3).standard_normal((7, 5)).astype(np.float32) * 3

    xt = torch.from_numpy(x).requires_grad_(True)
    loss_t = ent_mod.HLoss()(xt)
    loss_t.backward()

    val, grad = jax.value_and_grad(lambda v: entropy_loss(v))(jnp.asarray(x))
    np.testing.assert_allclose(float(val), float(loss_t.detach()),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(grad), xt.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
