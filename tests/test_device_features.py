"""On-device training features (TPU extension): the similarity einsum +
antialiased collator resize fused into the jitted train step.

Host-side, the resize is ~2 GFLOP/example at the reference's (150, 750)
target — a host core collates ~5 examples/s against the 881 examples/s the
TPU step consumes, so training at reference dims is input-bound unless
this work rides the MXU (ops/resize.py:features_from_hidden_states).

Pinned here:
* `resize_matrix_dynamic` (traced input length, static pad) reproduces the
  host `resize_matrix` weights exactly for both antialias branches, with
  zero weight on padded columns;
* the fused step's loss/gradients match the host-collated path
  (KWSDataCollator -> make_grad_fn) on the same raw items;
* the raw collator buckets lengths (one compile per bucket pair) and the
  CLI fit runs end-to-end with `data.init_args.device_features: true`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.data.collators import KWSDataCollator, RawKWSDataCollator
from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.ops.resize import (
    features_from_hidden_states,
    resize_matrix,
    resize_matrix_dynamic,
)
from enhance_cb_whisper_tpu.train.kws_train import (
    KWSTrainConfig,
    init_train_state,
    make_grad_fn,
)

TINY = ResNetConfig(
    num_channels=3, embedding_size=8, hidden_sizes=(8, 16, 24, 32), depths=(1, 1, 1, 1),
    num_labels=2,
)
SIZE = (32, 48)
L, D = 3, 8


@pytest.mark.parametrize("antialias", [False, True])
def test_dynamic_resize_matrix_matches_static(antialias):
    rng = np.random.default_rng(0)
    for _ in range(25):
        t_out = int(rng.integers(2, 120))
        t_in = int(rng.integers(1, 200))
        max_in = t_in + int(rng.integers(0, 40))
        w_static = resize_matrix(t_in, t_out, antialias)
        w_dyn = np.asarray(
            resize_matrix_dynamic(jnp.float32(t_in), max_in, t_out, antialias)
        )
        np.testing.assert_allclose(
            w_dyn[:, :t_in], w_static, atol=1e-6,
            err_msg=f"aa={antialias} t_in={t_in} t_out={t_out}",
        )
        assert w_dyn[:, t_in:].max(initial=0.0) == 0.0  # no padding leak


def _raw_items(n, rng):
    items = []
    for i in range(n):
        t_k = int(rng.integers(2, 12))
        t_u = int(rng.integers(20, 60))
        kwd = rng.standard_normal((L, t_k, D)).astype(np.float32)
        utt = rng.standard_normal((L, t_u, D)).astype(np.float32)
        items.append({
            "label": int(rng.integers(0, 2)),
            "mask": 1,
            "domain": int(rng.integers(0, 4)),
            "kwd_hs": kwd,
            "utt_hs": utt,
        })
    return items


def test_fused_features_match_host_collator():
    rng = np.random.default_rng(1)
    items = _raw_items(6, rng)
    host_items = [
        {**it, "features": np.einsum("lkd,lud->lku", it["kwd_hs"], it["utt_hs"])}
        for it in items
    ]
    host = KWSDataCollator(size=SIZE)(host_items)
    raw = RawKWSDataCollator(bucket_kwd=4, bucket_utt=16)(items)

    fused = jax.vmap(
        lambda k, u, kl, ul: features_from_hidden_states(k, u, kl, ul, SIZE)
    )(raw["kwd_hs"], raw["utt_hs"], raw["kwd_len"], raw["utt_len"])
    np.testing.assert_allclose(np.asarray(fused), host["features"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(raw["labels"], host["labels"])


def test_fused_step_grads_match_host_path():
    """Same raw items through both training paths: identical losses,
    metrics and gradient trees."""
    rng = np.random.default_rng(2)
    items = _raw_items(8, rng)
    host_items = [
        {**it, "features": np.einsum("lkd,lud->lku", it["kwd_hs"], it["utt_hs"])}
        for it in items
    ]
    host_batch = KWSDataCollator(size=SIZE)(host_items)
    raw_batch = RawKWSDataCollator(bucket_kwd=4, bucket_utt=16)(items)

    base = dict(adversarial_training=True, entropy=True, num_domains=4,
                accumulate_grad_batches=2)
    cfg_host = KWSTrainConfig(**base)
    cfg_dev = KWSTrainConfig(device_features=SIZE, **base)
    shape = (TINY.num_channels, *SIZE)
    state, (kws, disc, _tx) = init_train_state(jax.random.PRNGKey(0), cfg_host, TINY, shape)

    key = jax.random.PRNGKey(3)
    g_host, _, m_host, n_host = jax.jit(make_grad_fn(cfg_host, kws, disc))(
        state.params, state.batch_stats, host_batch, key, 0.1, 0.5
    )
    g_dev, _, m_dev, n_dev = jax.jit(make_grad_fn(cfg_dev, kws, disc))(
        state.params, state.batch_stats, raw_batch, key, 0.1, 0.5
    )
    assert n_host == n_dev
    for k in m_host:
        np.testing.assert_allclose(float(m_dev[k]), float(m_host[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    flat_h, tdef_h = jax.tree_util.tree_flatten_with_path(g_host)
    flat_d, tdef_d = jax.tree_util.tree_flatten_with_path(g_dev)
    assert tdef_h == tdef_d
    for (path, h), (_, d) in zip(flat_h, flat_d):
        # f32 op-order noise through train-mode BN (host einsum vs fused
        # device einsum): observed max 6e-5 absolute on near-zero elements
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(h), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_raw_collator_buckets_and_tuples():
    rng = np.random.default_rng(4)
    items = _raw_items(4, rng)
    col = RawKWSDataCollator(bucket_kwd=8, bucket_utt=32)
    batch = col(items)
    assert batch["kwd_hs"].shape[2] % 8 == 0
    assert batch["utt_hs"].shape[2] % 32 == 0
    assert batch["kwd_hs"].shape[0] == 4
    # tts/natural tuple flattening (ConcatDataset, kw_type='all')
    pairs = [(items[0], items[1]), (items[2], items[3])]
    batch2 = col(pairs)
    assert batch2["kwd_hs"].shape[0] == 4
    np.testing.assert_array_equal(batch2["labels"],
                                  [it["label"] for it in items])


def test_cli_fit_device_features(tmp_path):
    """run_CLI.py fit with data.init_args.device_features: true."""
    import os

    import yaml

    from enhance_cb_whisper_tpu.cli import run_cli
    from fixtures import make_aishell_hotword, make_aishell_kws, tiny_paper1_patch

    root = tmp_path / "aishell"
    root.mkdir()
    make_aishell_kws(str(root))
    make_aishell_hotword(str(root))
    run_dir = str(tmp_path / "run")
    config = {
        "seed_everything": 1,
        "trainer": {"max_epochs": 1, "limit_train_batches": 2,
                    "default_root_dir": run_dir},
        "f1_checkpoint": {"monitor": "metrics/f1", "mode": "max"},
        "model": {"class_path": "model.model.KWSModel", "init_args": {
            "sampling": "random", "kw_type": "natural", "batch_size": 4,
        }},
        "data": {"class_path": "data.data_module.KWSDataMod", "init_args": {
            "train_info": [{"name": "aishell", "root": str(root), "kw_type": "natural"}],
            "val_info": [{"name": "aishell", "root": str(root), "kw_type": "natural"}],
            "test_info": {"name": "aishell", "root": str(root), "kw_type": "natural"},
            "test_split": "dev",
            "features_size": [32, 48],
            "hotwords_per_group": 2,
            "batch_size": 4,
            "sampling": "random",
            "device_features": True,
        }},
        "ckpt_path": None,
    }
    cfg = tmp_path / "train.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)
    with tiny_paper1_patch():
        run_cli(["fit", "--config", str(cfg)])
    assert os.path.exists(os.path.join(run_dir, "checkpoints", "final", "state.msgpack"))


def test_fused_features_channels_last():
    """device_features composes with the NHWC training layout: the fused
    path transposes in-graph and matches the NCHW run's loss."""
    rng = np.random.default_rng(5)
    items = _raw_items(8, rng)
    raw = RawKWSDataCollator(bucket_kwd=4, bucket_utt=16)(items)

    results = {}
    for cl in (False, True):
        cfg = KWSTrainConfig(device_features=SIZE, channels_last=cl)
        shape = ((TINY.num_channels, *SIZE) if not cl else (*SIZE, TINY.num_channels))
        state, (kws, disc, _tx) = init_train_state(
            jax.random.PRNGKey(0), cfg, TINY, shape
        )
        _, _, metrics, _ = jax.jit(make_grad_fn(cfg, kws, disc))(
            state.params, state.batch_stats, raw, jax.random.PRNGKey(1), 0.0, 0.0
        )
        results[cl] = float(metrics["class_loss"])
    np.testing.assert_allclose(results[True], results[False], rtol=1e-4)
