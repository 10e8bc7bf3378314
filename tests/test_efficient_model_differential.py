"""Differential: our EfficientKWSModel forward vs the reference paper-2
`KWSModel` run VERBATIM (src/efficient_kws/model.py, loaded with minimal
pytorch_lightning/torchmetrics/confidence_intervals stubs — the forward
path itself is untouched torch code).

The reference model's weights are converted with
`efficient_kws.torch_compat.load_torch_efficient_kws` and the SAME random
inputs are pushed through both forwards for all three shipped variants:

* L   — raw-activation similarity maps -> ResNet (resnet-50 default);
* LE  — per-layer MLP projection (Linear(D,D/2) ReLU Linear(D/2,U));
* LEF — + per-layer Conv1d+BatchNorm1d+MaxPool1d frame compression.

This pins the in-model sim computation (eps-clamped cosine, model.py:
208-218), the mask zeroing (model.py:185-191), the projector stacking
order, and the weight conversion itself.  For LEF the reference requires
masks already sized to the POOLED frame count (full-length masks crash it
— docs/PARITY.md #1), so the LEF case feeds all-ones masks; random masks
are exercised on L/LE.
"""

import numpy as np
import pytest
import torch

from ref_shims import (
    confidence_intervals_shim,
    lightning_shim,
    load_reference_package_module,
    restore_modules,
    torchmetrics_shim,
)


@pytest.fixture(scope="module")
def ref_model_mod():
    shims = {**lightning_shim(), **torchmetrics_shim(),
             **confidence_intervals_shim()}
    mod, saved = load_reference_package_module("efficient_kws.model", shims)
    yield mod
    restore_modules(saved)


VARIANTS = {
    # learn_features, proj_mlp, frames_conv, resnet_version
    "L": (False, False, False, "resnet-50"),
    "LE": (True, True, False, "resnet-18"),
    "LEF": (True, True, True, "resnet-18"),
}


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_forward_matches_reference(ref_model_mod, variant):
    import jax

    from enhance_cb_whisper_tpu.efficient_kws.model import (
        EfficientKWSConfig,
        EfficientKWSModel,
    )
    from enhance_cb_whisper_tpu.efficient_kws.torch_compat import (
        load_torch_efficient_kws,
    )

    learn, proj, conv, version = VARIANTS[variant]
    n_layers, D, U = 2, 16, 6
    torch.manual_seed(hash(variant) % 2**31)
    ref = ref_model_mod.KWSModel(
        num_domains=4, learn_features=learn, proj_mlp=proj, frames_conv=conv,
        n_layers=n_layers, embedding_dim=D, proj_mlp_units=U,
        resnet_version=version,
    )
    ref.eval()
    # randomize BN running stats so the conversion of batch_stats is load-
    # bearing (fresh init has mean 0 / var 1 which would hide swaps)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)

    cfg = EfficientKWSConfig(
        n_layers=n_layers, embedding_dim=D, learn_features=learn,
        proj_mlp=proj, proj_mlp_units=U, frames_conv=conv,
        resnet_version=version,
    )
    variables = load_torch_efficient_kws(ref.state_dict(), cfg)

    rng = np.random.default_rng(42)
    B, T_k, T_u = 3, 5, 9
    feat_d = D if (learn and proj) else n_layers  # L consumes raw "features"
    kwd = rng.standard_normal((B, n_layers, T_k, feat_d)).astype(np.float32)
    utt = rng.standard_normal((B, n_layers, T_u, feat_d)).astype(np.float32)
    if variant == "LEF":
        # the reference needs POOLED-length masks (PARITY #1); ones only
        t_kp, t_up = (T_k + 1) // 2, (T_u + 1) // 2
        kwd_mask_ref = np.ones((B, n_layers, t_kp), np.float32)
        utt_mask_ref = np.ones((B, n_layers, t_up), np.float32)
        kwd_mask = np.ones((B, n_layers, T_k), np.float32)
        utt_mask = np.ones((B, n_layers, T_u), np.float32)
    else:
        kwd_mask = (rng.random((B, n_layers, T_k)) < 0.8).astype(np.float32)
        utt_mask = (rng.random((B, n_layers, T_u)) < 0.8).astype(np.float32)
        kwd_mask_ref, utt_mask_ref = kwd_mask, utt_mask

    with torch.no_grad():
        want = ref(
            kwd_features=torch.from_numpy(kwd),
            utt_features=torch.from_numpy(utt),
            kwd_mask=torch.from_numpy(kwd_mask_ref),
            utt_mask=torch.from_numpy(utt_mask_ref),
        )

    model = EfficientKWSModel(cfg)
    logits, sims = model.apply(
        variables, kwd, utt, kwd_mask, utt_mask, train=False
    )
    np.testing.assert_allclose(
        np.asarray(sims), want.features.numpy(), rtol=1e-4, atol=1e-5,
        err_msg=f"{variant}: similarity maps diverge")
    np.testing.assert_allclose(
        np.asarray(logits), want.logits.numpy(), rtol=5e-4, atol=5e-4,
        err_msg=f"{variant}: logits diverge")
