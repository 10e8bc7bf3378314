"""Parity tests of the L/LE/LEF flax model vs a torch replica of the
reference forward (src/efficient_kws/model.py:129-218)."""

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn

from enhance_cb_whisper_tpu.efficient_kws import EfficientKWSConfig, EfficientKWSModel

transformers = pytest.importorskip("transformers")

L, D, U = 3, 16, 8


def _torch_sim(a, b, eps=1e-6):
    a_n = a.norm(dim=-1)[:, :, None]
    b_n = b.norm(dim=-1)[:, :, None]
    return torch.bmm(a / torch.clamp(a_n, min=eps), (b / torch.clamp(b_n, min=eps)).transpose(-2, -1))


def _torch_forward(kwd, utt, kwd_mask, utt_mask, proj=None, tconv=None, pool_masks=False):
    """The reference's forward up to (and including) masking."""
    if proj is not None:
        kwd = torch.stack([proj[i](kwd[:, i]) for i in range(L)], 1)
        utt = torch.stack([proj[i](utt[:, i]) for i in range(L)], 1)
    if tconv is not None:
        kwd = torch.stack([tconv[i](kwd[:, i].transpose(1, 2)).transpose(1, 2) for i in range(L)], 1)
        utt = torch.stack([tconv[i](utt[:, i].transpose(1, 2)).transpose(1, 2) for i in range(L)], 1)
        if pool_masks:
            mp = nn.MaxPool1d(3, 2, 1)
            kwd_mask = mp(kwd_mask)
            utt_mask = mp(utt_mask)
    n_kw = kwd.size(0)
    feats = torch.stack(
        [
            _torch_sim(utt[:, l].expand(n_kw, -1, -1), kwd[:, l]).permute(0, 2, 1)
            for l in range(kwd.size(1))
        ],
        dim=1,
    )
    return feats * utt_mask.unsqueeze(2) * kwd_mask.unsqueeze(-1)


def _inputs(tk=10, tu=20, b=2, seed=0):
    rng = np.random.default_rng(seed)
    kwd = rng.standard_normal((b, L, tk, D), dtype=np.float32)
    utt = rng.standard_normal((b, L, tu, D), dtype=np.float32)
    kwd_mask = (rng.random((b, L, tk)) > 0.2).astype(np.float32)
    utt_mask = (rng.random((b, L, tu)) > 0.2).astype(np.float32)
    return kwd, utt, kwd_mask, utt_mask


def _get_sims(config, variables, kwd, utt, kwd_mask, utt_mask):
    model = EfficientKWSModel(config)
    _, sims = model.apply(
        variables, kwd, utt, kwd_mask=kwd_mask, utt_mask=utt_mask, train=False
    )
    return np.asarray(sims)


def test_L_variant_matches_reference_math():
    config = EfficientKWSConfig(n_layers=L, embedding_dim=D, learn_features=False,
                                resnet_version="resnet-18")
    kwd, utt, km, um = _inputs()
    model = EfficientKWSModel(config)
    variables = model.init(jax.random.PRNGKey(0), kwd, utt, km, um)
    got = _get_sims(config, variables, kwd, utt, km, um)
    want = _torch_forward(
        torch.from_numpy(kwd), torch.from_numpy(utt),
        torch.from_numpy(km), torch.from_numpy(um),
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_LE_variant_matches_with_copied_weights():
    config = EfficientKWSConfig(n_layers=L, embedding_dim=D, learn_features=True,
                                proj_mlp=True, proj_mlp_units=U, resnet_version="resnet-18")
    kwd, utt, km, um = _inputs(seed=1)
    model = EfficientKWSModel(config)
    variables = model.init(jax.random.PRNGKey(1), kwd, utt, km, um)

    torch.manual_seed(0)
    proj = nn.ModuleList(
        [nn.Sequential(nn.Linear(D, D // 2), nn.ReLU(), nn.Linear(D // 2, U)) for _ in range(L)]
    )
    # copy torch weights into the flax projector
    params = jax.tree.map(lambda x: x, variables["params"])
    for i in range(L):
        params["projector"][f"proj_{i}_0"]["kernel"] = proj[i][0].weight.detach().numpy().T
        params["projector"][f"proj_{i}_0"]["bias"] = proj[i][0].bias.detach().numpy()
        params["projector"][f"proj_{i}_1"]["kernel"] = proj[i][2].weight.detach().numpy().T
        params["projector"][f"proj_{i}_1"]["bias"] = proj[i][2].bias.detach().numpy()
    variables = {**variables, "params": params}

    got = _get_sims(config, variables, kwd, utt, km, um)
    with torch.no_grad():
        want = _torch_forward(
            torch.from_numpy(kwd), torch.from_numpy(utt),
            torch.from_numpy(km), torch.from_numpy(um), proj=proj,
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_LEF_variant_halves_frames_and_pools_masks():
    config = EfficientKWSConfig(n_layers=L, embedding_dim=D, learn_features=True,
                                proj_mlp=True, proj_mlp_units=U, frames_conv=True,
                                resnet_version="resnet-18")
    kwd, utt, km, um = _inputs(tk=64, tu=128, seed=2)
    model = EfficientKWSModel(config)
    variables = model.init(jax.random.PRNGKey(2), kwd, utt, km, um)
    logits, sims = model.apply(variables, kwd, utt, kwd_mask=km, utt_mask=um)
    assert sims.shape == (2, L, 32, 64)  # frames halved
    assert logits.shape == (2, 2)
    # frames whose entire pool window was padding are zeroed
    km_zero = km.copy()
    km_zero[:, :, :8] = 0.0
    _, sims2 = model.apply(variables, kwd, utt, kwd_mask=km_zero, utt_mask=um)
    assert np.allclose(np.asarray(sims2)[:, :, :3, :], 0.0)


def test_eval_broadcast_single_utterance():
    config = EfficientKWSConfig(n_layers=L, embedding_dim=D, resnet_version="resnet-18")
    kwd, utt, km, um = _inputs(b=4)
    model = EfficientKWSModel(config)
    variables = model.init(jax.random.PRNGKey(0), kwd, utt[:1], km, um[:1])
    logits, sims = model.apply(variables, kwd, utt[:1], kwd_mask=km, utt_mask=um[:1])
    assert logits.shape == (4, 2)
    assert sims.shape[0] == 4


def test_LEF_variant_matches_with_copied_weights():
    """LEF similarity maps parity with a torch replica: per-layer MLP +
    Conv1d/BatchNorm(eval)/MaxPool copied into flax."""
    config = EfficientKWSConfig(n_layers=L, embedding_dim=D, learn_features=True,
                                proj_mlp=True, proj_mlp_units=U, frames_conv=True,
                                resnet_version="resnet-18")
    kwd, utt, km, um = _inputs(tk=16, tu=32, seed=3)
    km[:] = 1.0  # full-length masks: pooled masks equal torch's full windows
    um[:] = 1.0
    model = EfficientKWSModel(config)
    import jax

    variables = model.init(jax.random.PRNGKey(3), kwd, utt, km, um)

    torch.manual_seed(1)
    proj = nn.ModuleList(
        [nn.Sequential(nn.Linear(D, D // 2), nn.ReLU(), nn.Linear(D // 2, U)) for _ in range(L)]
    )
    tconv = nn.ModuleList(
        [
            nn.Sequential(nn.Conv1d(U, U, 3, 1, 1), nn.BatchNorm1d(U), nn.MaxPool1d(3, 2, 1))
            for _ in range(L)
        ]
    ).eval()

    params = variables["params"]
    stats = variables["batch_stats"]
    for i in range(L):
        params["projector"][f"proj_{i}_0"]["kernel"] = proj[i][0].weight.detach().numpy().T
        params["projector"][f"proj_{i}_0"]["bias"] = proj[i][0].bias.detach().numpy()
        params["projector"][f"proj_{i}_1"]["kernel"] = proj[i][2].weight.detach().numpy().T
        params["projector"][f"proj_{i}_1"]["bias"] = proj[i][2].bias.detach().numpy()
        # torch Conv1d [out, in, W] -> flax [W, in, out]
        params["time_projector"][f"conv_{i}"]["kernel"] = (
            tconv[i][0].weight.detach().numpy().transpose(2, 1, 0)
        )
        params["time_projector"][f"conv_{i}"]["bias"] = tconv[i][0].bias.detach().numpy()
        params["time_projector"][f"bn_{i}"]["scale"] = tconv[i][1].weight.detach().numpy()
        params["time_projector"][f"bn_{i}"]["bias"] = tconv[i][1].bias.detach().numpy()
        stats["time_projector"][f"bn_{i}"]["mean"] = tconv[i][1].running_mean.numpy()
        stats["time_projector"][f"bn_{i}"]["var"] = tconv[i][1].running_var.numpy()
    variables = {"params": params, "batch_stats": stats}

    got = _get_sims(config, variables, kwd, utt, km, um)
    with torch.no_grad():
        want = _torch_forward(
            torch.from_numpy(kwd), torch.from_numpy(utt),
            torch.from_numpy(km), torch.from_numpy(um),
            proj=proj, tconv=tconv, pool_masks=True,
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bfloat16_compute_dtype_close_to_f32():
    """Paper-2 bf16 training (EfficientTrainConfig.compute_dtype) keeps f32
    params/BN/loss.  A one-step LOSS comparison cannot be tight here: the
    random-init train-mode BN ResNet is chaotic — rounding only the INPUT
    features through bf16 and running the pure-f32 network moves the logits
    by up to ~0.4 (measured; ~200x amplification over 18 BN layers), so any
    end-to-end tolerance that passes is vacuous.  Instead pin (a) tight
    parity at the shallow projection surface (MLP+Conv+BN — bounded
    amplification), (b) the dtype contract (params stay f32, projection
    computes in bf16), and (c) that the step runs and moves f32 params with
    a finite f32 loss."""
    import jax.numpy as jnp

    from enhance_cb_whisper_tpu.efficient_kws.engine import (
        EfficientKWSEngine,
        EfficientTrainConfig,
    )
    from enhance_cb_whisper_tpu.efficient_kws.model import EfficientKWSModel

    cfg = EfficientKWSConfig(
        n_layers=L, embedding_dim=D, learn_features=True, proj_mlp=True,
        proj_mlp_units=U, frames_conv=True, resnet_version="resnet-18",
    )
    rng = np.random.default_rng(5)
    batch = {
        "kwd_features": rng.standard_normal((4, L, 10, D)).astype(np.float32),
        "utt_features": rng.standard_normal((4, L, 24, D)).astype(np.float32),
        "kwd_mask": np.ones((4, L, 10), np.float32),
        "utt_mask": np.ones((4, L, 24), np.float32),
        "labels": np.array([0, 1, 1, 0]),
    }
    engines, states = {}, {}
    for dtype in ("float32", "bfloat16"):
        engines[dtype] = EfficientKWSEngine(
            cfg, EfficientTrainConfig(compute_dtype=dtype), ckpt_dir=None
        )
        states[dtype] = engines[dtype].init_state(batch)

    # (a) shallow-surface parity: the projection stack (where the bf16
    # matmuls live) must match f32 within bf16 rounding at 2-layer depth
    params_f32 = states["float32"][0]
    for eng, tol in ((engines["float32"], 0.0), (engines["bfloat16"], 0.03)):
        out, _ = eng.model.apply(
            {"params": params_f32, "batch_stats": states["float32"][1]},
            batch["utt_features"], batch["utt_mask"], train=False,
            method=EfficientKWSModel.project,
        )
        if tol == 0.0:
            want = np.asarray(out, np.float32)
        else:
            # (b) dtype contract: bf16 engine projects in bf16
            assert out.dtype == jnp.bfloat16
            scale = np.abs(want).max()
            np.testing.assert_allclose(
                np.asarray(out, np.float32), want, rtol=tol, atol=tol * scale
            )

    # (c) the bf16 step runs: finite f32 loss, f32 params that move
    for dtype in ("float32", "bfloat16"):
        params, stats, opt = states[dtype]
        step = engines[dtype].make_train_step()
        p2, _, _, metrics = step(params, stats, opt, batch, jax.random.PRNGKey(0))
        loss = np.asarray(metrics["loss"])
        assert loss.dtype == np.float32 and np.isfinite(loss)
        leaves = jax.tree.leaves(p2)
        assert all(l.dtype == jnp.float32 for l in leaves), "params must stay f32"
        moved = sum(
            np.abs(np.asarray(a) - np.asarray(b)).sum()
            for a, b in zip(jax.tree.leaves(params), leaves)
        )
        assert moved > 0
