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


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_gradients_match_reference(ref_model_mod, variant):
    """Backward differential: torch CE-loss gradients through the verbatim
    reference model (train-mode BatchNorm) vs jax.grad through ours with
    converted weights — pins the backward of the eps-clamped cosine sims,
    mask zeroing, projector/conv stacks and the ResNet, i.e. what the
    paper-2 training step actually optimizes (model.py:228-297).

    Dims are chosen well-conditioned on purpose: train-mode BatchNorm
    normalizes by the BATCH statistics, and at degenerate sizes (1x1 maps,
    batch 4) the 53 successive normalizations of resnet-50 chaotically
    amplify f32 conv noise (measured: 0.25 logits divergence at B=4
    T_k=5; 6e-4 at B=8 T_k=16) — hence B=8, T>=16 and looser tolerances
    for the deeper L variant."""
    import jax
    import jax.numpy as jnp

    from enhance_cb_whisper_tpu.efficient_kws.model import (
        EfficientKWSConfig,
        EfficientKWSModel,
    )
    from enhance_cb_whisper_tpu.efficient_kws.torch_compat import (
        load_torch_efficient_kws,
    )
    from enhance_cb_whisper_tpu.models.kws import cross_entropy

    learn, proj, conv, version = VARIANTS[variant]
    n_layers, D, U = 2, 16, 6
    # deterministic seed (hash() is process-salted -> flaky tolerances)
    torch.manual_seed({"L": 11, "LE": 12, "LEF": 13}[variant])
    ref = ref_model_mod.KWSModel(
        num_domains=4, learn_features=learn, proj_mlp=proj, frames_conv=conv,
        n_layers=n_layers, embedding_dim=D, proj_mlp_units=U,
        resnet_version=version,
    )
    # L runs resnet-50: backprop through 53 TRAIN-mode batch-stat
    # normalizations chaotically amplifies f32 noise into the early-layer
    # gradients (the forward divergence alone is ~6e-4 at these dims), so
    # the deep variant compares EVAL-mode gradients; the train-mode BN
    # backward is pinned by the resnet-18 variants
    train_mode = variant != "L"
    ref.train(train_mode)

    cfg = EfficientKWSConfig(
        n_layers=n_layers, embedding_dim=D, learn_features=learn,
        proj_mlp=proj, proj_mlp_units=U, frames_conv=conv,
        resnet_version=version,
    )
    # clone: torch grads/steps must not alias the converted arrays
    variables = load_torch_efficient_kws(
        {k: v.detach().clone() for k, v in ref.state_dict().items()}, cfg
    )

    rng = np.random.default_rng(7)
    B, T_k, T_u = 8, 16, 32
    feat_d = D if (learn and proj) else n_layers
    kwd = rng.standard_normal((B, n_layers, T_k, feat_d)).astype(np.float32)
    utt = rng.standard_normal((B, n_layers, T_u, feat_d)).astype(np.float32)
    labels = rng.integers(0, 2, B)
    if variant == "LEF":  # pooled-length mask quirk (PARITY #1)
        t_kp, t_up = (T_k + 1) // 2, (T_u + 1) // 2
        kwd_mask_ref = np.ones((B, n_layers, t_kp), np.float32)
        utt_mask_ref = np.ones((B, n_layers, t_up), np.float32)
        kwd_mask = np.ones((B, n_layers, T_k), np.float32)
        utt_mask = np.ones((B, n_layers, T_u), np.float32)
    else:
        kwd_mask = (rng.random((B, n_layers, T_k)) < 0.8).astype(np.float32)
        utt_mask = (rng.random((B, n_layers, T_u)) < 0.8).astype(np.float32)
        kwd_mask_ref, utt_mask_ref = kwd_mask, utt_mask

    out = ref(
        kwd_features=torch.from_numpy(kwd),
        utt_features=torch.from_numpy(utt),
        labels=torch.from_numpy(labels),
        kwd_mask=torch.from_numpy(kwd_mask_ref),
        utt_mask=torch.from_numpy(utt_mask_ref),
    )
    ref.zero_grad()
    out.loss.backward()
    ref_grads = {n: p.grad.detach().numpy() for n, p in ref.named_parameters()
                 if p.grad is not None}
    for n, buf in ref.state_dict().items():
        if n.endswith(("running_mean", "running_var")):
            ref_grads[n] = np.zeros(buf.shape, np.float32)

    model = EfficientKWSModel(cfg)

    def loss_fn(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        if train_mode:
            (logits, _), _ = model.apply(
                v, kwd, utt, kwd_mask, utt_mask, train=True,
                mutable=["batch_stats"],
            )
        else:
            logits, _ = model.apply(v, kwd, utt, kwd_mask, utt_mask, train=False)
        return cross_entropy(logits, jnp.asarray(labels))

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(float(loss), float(out.loss.detach()),
                               rtol=5e-4, atol=1e-5)

    want = load_torch_efficient_kws(
        {k: torch.from_numpy(v) for k, v in ref_grads.items()}, cfg
    )["params"]
    import jax.tree_util as jtu

    flat_want, tdef_want = jtu.tree_flatten_with_path(want)
    flat_ours, tdef_ours = jtu.tree_flatten_with_path(grads)
    assert tdef_want == tdef_ours
    for (path, w), (_, g) in zip(flat_want, flat_ours):
        w = np.asarray(w).ravel()
        g = np.asarray(g).ravel()
        nw, ng = np.linalg.norm(w), np.linalg.norm(g)
        name = f"{variant}: {jtu.keystr(path)}"
        if max(nw, ng) < 1e-4 * max(1.0, np.sqrt(w.size)):
            # analytically-zero gradients leave f32 dust with random
            # direction — e.g. a Conv1d bias immediately followed by
            # train-mode BatchNorm1d (the mean subtraction cancels it;
            # measured norms ~1e-5 both sides)
            continue
        # elementwise allclose is the wrong metric for early-layer grads:
        # backprop through ~25 train-mode batch-stat normalizations
        # amplifies f32 noise few-percent per element while the DIRECTION
        # stays intact (measured embedder cosine 0.99989, norm ratio
        # 0.9992); a structural backward bug (wrong mask, missed eps
        # clamp, layer swap) collapses the cosine or the norm instead
        cos = float(np.dot(w, g) / (nw * ng))
        assert cos > 0.999, f"{name}: grad cosine {cos:.6f}"
        assert 0.98 < ng / nw < 1.02, f"{name}: grad norm ratio {ng / nw:.4f}"
