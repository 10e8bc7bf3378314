"""int8 quantized ResNet inference vs the fp32 model.

The quantized scorer replaces the ResNet classification step of catalog
scoring (reference hot loop src/model/cb_whisper.py:110-129).  Required
parity: score ordering / argmax decisions, not bitwise probabilities —
checked here as probability closeness + argmax agreement on random models
with perturbed BatchNorm statistics (so the BN folding is actually
exercised: init-time stats are the trivial mean=0/var=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhance_cb_whisper_tpu.catalog import (
    KeywordCatalog,
    device_put_catalog,
    make_catalog_score_fn,
)
from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.models.kws import KWSModel
from enhance_cb_whisper_tpu.models.quant import (
    calibrate_act_scales,
    make_quantized_kws_apply,
    quantize_resnet_classifier,
    quantized_apply,
)

N_LAYERS = 3
OUT = (32, 48)


def _randomize_bn(variables, seed=0):
    """Give BatchNorm non-trivial running stats + affine params so folding
    is exercised; returns a new variables pytree."""
    rng = np.random.default_rng(seed)

    def visit(tree, in_stats):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = visit(v, in_stats or k == "normalization")
            elif in_stats and k == "mean":
                out[k] = jnp.asarray(rng.normal(0, 0.2, v.shape), jnp.float32)
            elif in_stats and k == "var":
                out[k] = jnp.asarray(rng.uniform(0.5, 2.0, v.shape), jnp.float32)
            elif in_stats and k == "scale":
                out[k] = jnp.asarray(rng.uniform(0.5, 1.5, v.shape), jnp.float32)
            elif in_stats and k == "bias":
                out[k] = jnp.asarray(rng.normal(0, 0.1, v.shape), jnp.float32)
            else:
                out[k] = v
        return out

    return {
        "params": visit(variables["params"], False),
        "batch_stats": visit(variables["batch_stats"], True),
    }


def _small_config(layer_type):
    return ResNetConfig(
        num_channels=N_LAYERS,
        embedding_size=8,
        hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1),
        layer_type=layer_type,
        num_labels=2,
    )


@pytest.mark.parametrize("layer_type", ["bottleneck", "basic"])
@pytest.mark.parametrize("static", [False, True])
def test_quantized_matches_fp32(layer_type, static):
    cfg = _small_config(layer_type)
    model = KWSModel(cfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, N_LAYERS, *OUT)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    variables = _randomize_bn(variables)

    ref = jax.jit(lambda v, x: model.apply(v, x).logits)(variables, x)
    ref_p = jax.nn.softmax(ref, axis=-1)

    qparams = quantize_resnet_classifier(variables, cfg)
    if static:
        # calibrate on a disjoint batch, evaluate on x
        calib = rng.standard_normal((8, N_LAYERS, *OUT)).astype(np.float32)
        qparams = calibrate_act_scales(cfg, qparams, calib)
    q = jax.jit(lambda qp, x: quantized_apply(cfg, qp, x))(qparams, x)
    q_p = jax.nn.softmax(q, axis=-1)

    # int8 quantization: probabilities must stay close, and the
    # positive/negative decision must agree except on near-ties (random
    # nets produce logit margins below the quantization noise floor)
    ref_p, q_p = np.asarray(ref_p), np.asarray(q_p)
    assert np.max(np.abs(ref_p - q_p)) < 0.08
    decided = np.abs(ref_p[:, 1] - ref_p[:, 0]) > 0.02
    assert decided.sum() >= 8  # the check must actually bite
    assert np.array_equal(
        np.argmax(ref_p[decided], -1), np.argmax(q_p[decided], -1)
    )


@pytest.mark.parametrize("static", [False, True])
def test_quantized_catalog_scoring_ordering(static):
    """End-to-end: quantized kws_apply inside make_catalog_score_fn keeps
    the catalog score ordering of the fp32 scorer."""
    cfg = _small_config("bottleneck")
    model = KWSModel(cfg)
    rng = np.random.default_rng(2)

    def norm(a):
        return a / np.linalg.norm(a, axis=-1, keepdims=True)

    stacks = [
        norm(rng.standard_normal((N_LAYERS, int(rng.integers(2, 9)), 16), dtype=np.float32))
        for _ in range(8)
    ]
    catalog = KeywordCatalog.from_arrays([f"k{i}" for i in range(8)], stacks, group_size=4)
    utt = norm(rng.standard_normal((N_LAYERS, OUT[1], 16), dtype=np.float32))

    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, N_LAYERS, *OUT), np.float32))
    variables = _randomize_bn(variables, seed=3)

    from enhance_cb_whisper_tpu.ops.resize import resize_matrix

    cat_dev = device_put_catalog(catalog, out_h=OUT[0], chunk=4)
    utt_w = jnp.asarray(resize_matrix(utt.shape[1], OUT[1], antialias=False))
    utt_j = jnp.asarray(utt)

    fp32_apply = lambda v, im: model.apply(v, im).logits
    score_fp32 = make_catalog_score_fn(fp32_apply, out_size=OUT, chunk=4)
    p_ref, _ = score_fp32(variables, cat_dev, utt_j, utt_w)

    qparams = quantize_resnet_classifier(variables, cfg)
    if static:
        # similarity maps are cosine similarities: calibrate on random
        # maps in [-1, 1] (the bench/engine integration pattern)
        calib = rng.uniform(-1, 1, (8, N_LAYERS, *OUT)).astype(np.float32)
        qparams = calibrate_act_scales(cfg, qparams, calib)
    score_q = make_catalog_score_fn(
        make_quantized_kws_apply(cfg), out_size=OUT, chunk=4
    )
    p_q, _ = score_q(qparams, cat_dev, utt_j, utt_w)

    p_ref, p_q = np.asarray(p_ref), np.asarray(p_q)
    assert np.max(np.abs(p_ref - p_q)) < 0.08
    # ordering: the detected set at the 0.5 threshold must agree
    assert np.array_equal(p_ref > 0.5, p_q > 0.5)


def test_quantized_projected_scorer_efficient_kws():
    """Paper-2 100k-catalog path: the int8 projected scorer must preserve
    the fp32 scorer's probabilities/decisions (LEF variant)."""
    from enhance_cb_whisper_tpu.efficient_kws import (
        EfficientKWSConfig,
        EfficientKWSModel,
    )
    from enhance_cb_whisper_tpu.efficient_kws.catalog import (
        make_projected_score_fn,
        project_catalog,
    )
    from enhance_cb_whisper_tpu.efficient_kws.model import masked_sims
    from enhance_cb_whisper_tpu.models.quant import quantize_efficient_classifier

    L, D, U = 2, 16, 8
    config = EfficientKWSConfig(
        n_layers=L, embedding_dim=D, learn_features=True, proj_mlp=True,
        proj_mlp_units=U, frames_conv=True, resnet_version="resnet-18",
    )
    model = EfficientKWSModel(config)
    rng = np.random.default_rng(7)
    groups = [
        {
            "kwd": rng.standard_normal((4, L, 32, D), dtype=np.float32),
            "kwd_mask": (rng.random((4, L, 32)) > 0.1).astype(np.float32),
            "mask": np.ones((4,), np.float32),
        }
        for _ in range(2)
    ]
    utt = rng.standard_normal((1, L, 64, D), dtype=np.float32)
    utt_mask = np.ones((1, L, 64), np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), groups[0]["kwd"], utt, groups[0]["kwd_mask"], utt_mask
    )
    variables = _randomize_bn(variables, seed=8)

    catalog = project_catalog(model, variables, groups, chunk=4)
    score = make_projected_score_fn(model, chunk=4)
    p_ref = np.asarray(score(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))

    # calibrate on the first chunk's real similarity maps
    qparams = quantize_efficient_classifier(variables, config.resnet_config())
    utt_p, utt_mask_p = model.apply(
        variables, utt, utt_mask, train=False, method=EfficientKWSModel.project
    )
    sims = masked_sims(
        catalog["kwd"][:4], utt_p, catalog["kwd_mask"][:4], utt_mask_p
    )
    scales = calibrate_act_scales(config.resnet_config(), qparams, sims)["act_scales"]
    score_q = make_projected_score_fn(
        model, chunk=4, quantized_params=jax.device_put(qparams), act_scales=scales
    )
    p_q = np.asarray(score_q(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))

    assert np.max(np.abs(p_ref - p_q)) < 0.08
    assert np.array_equal(p_ref > 0.5, p_q > 0.5)

    # the multi-chip 100k serving shape: quantized scorer over a catalog
    # sharded across the mesh `model` axis must match the single-device run
    from enhance_cb_whisper_tpu.parallel import make_mesh, shard_catalog

    mesh = make_mesh({"data": 1, "model": 8})
    with mesh:
        arrays = {k: v for k, v in catalog.items() if k in ("kwd", "kwd_mask", "mask")}
        sharded = {**catalog, **shard_catalog(arrays, mesh, axis="model")}
        p_s = np.asarray(
            score_q(variables, sharded, jnp.asarray(utt), jnp.asarray(utt_mask))
        )
    np.testing.assert_allclose(p_s, p_q, rtol=1e-5, atol=1e-6)


def test_quantized_channels_last():
    cfg = _small_config("bottleneck")
    model = KWSModel(cfg)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, N_LAYERS, *OUT)).astype(np.float32)
    variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x[:1]), seed=5)
    qparams = quantize_resnet_classifier(variables, cfg)
    a = quantized_apply(cfg, qparams, x)
    b = quantized_apply(cfg, qparams, np.transpose(x, (0, 2, 3, 1)), channels_last=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("layer_type", ["bottleneck", "basic"])
@pytest.mark.parametrize("float_stages", [("stem", "stage_0"), ("stage_1",), ("stem", "stage_0", "stage_1", "stage_2", "stage_3")])
def test_quantized_float_stages(layer_type, float_stages):
    """Mixed quantization boundary (float_stages): accuracy must be at
    least as good as all-int8 (fewer quantization sites), and the
    all-float configuration must track the fp32 model to bf16 tolerance —
    it runs the folded dequantized weights with no activation
    quantization at all."""
    cfg = _small_config(layer_type)
    model = KWSModel(cfg)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((16, N_LAYERS, *OUT)).astype(np.float32)
    variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x[:1]), seed=7)
    ref_p = np.asarray(
        jax.nn.softmax(model.apply(variables, x).logits, axis=-1)
    )

    qparams = quantize_resnet_classifier(variables, cfg)
    calib = rng.standard_normal((8, N_LAYERS, *OUT)).astype(np.float32)
    qparams = calibrate_act_scales(cfg, qparams, calib)
    q = quantized_apply(cfg, qparams, x, float_stages=float_stages)
    q_p = np.asarray(jax.nn.softmax(q, axis=-1))

    all_float = len(float_stages) == 5
    tol = 0.02 if all_float else 0.08
    assert np.max(np.abs(ref_p - q_p)) < tol
    decided = np.abs(ref_p[:, 1] - ref_p[:, 0]) > 0.02
    assert decided.sum() >= 8
    assert np.array_equal(
        np.argmax(ref_p[decided], -1), np.argmax(q_p[decided], -1)
    )


def test_quantized_float_stages_boundary_int8_pool():
    """float stem + quantized stages: the int8 stem pool shortcut is taken
    from the bf16 stem output; float stage_0 + quantized stage_1 crosses
    the boundary mid-network.  Both must agree with the plain int8 path to
    quantization-noise tolerance."""
    cfg = _small_config("bottleneck")
    model = KWSModel(cfg)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((8, N_LAYERS, *OUT)).astype(np.float32)
    variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x[:1]), seed=9)
    qparams = quantize_resnet_classifier(variables, cfg)
    qparams = calibrate_act_scales(
        cfg, qparams, rng.standard_normal((8, N_LAYERS, *OUT)).astype(np.float32)
    )
    base = np.asarray(
        jax.nn.softmax(quantized_apply(cfg, qparams, x), axis=-1)
    )
    for fs in [("stem",), ("stage_0",), ("stem", "stage_0")]:
        mixed = np.asarray(
            jax.nn.softmax(quantized_apply(cfg, qparams, x, float_stages=fs), axis=-1)
        )
        assert np.max(np.abs(base - mixed)) < 0.08, fs


# ---------------------------------------------------------------------------
# Pallas fused s8 1x1 path (ECW_S8_PALLAS / quantized_apply(pallas_1x1=...))
# ---------------------------------------------------------------------------


def _pallas_config():
    """stage_1 channels are 128-multiples (the Pallas s8 kernel's alignment
    requirement); depths (1, 3) exercise every fusion shape: the shortcut
    block (partial fusion, float tail), a fused int8-residual tail handing
    codes straight to the next block, and the final block's float tail."""
    return ResNetConfig(
        num_channels=N_LAYERS,
        embedding_size=32,
        hidden_sizes=(128, 512),
        depths=(1, 3),
        layer_type="bottleneck",
        num_labels=2,
    )


def test_quantized_pallas_1x1_matches_plain_int8():
    """The Pallas fused 1x1 path (interpret mode on CPU) must track the
    plain static-int8 path to epilogue-rounding tolerance (the kernel
    keeps f32 where the XLA chain rounds through bf16) and agree on the
    decisions outside near-ties."""
    cfg = _pallas_config()
    model = KWSModel(cfg)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((8, N_LAYERS, 32, 32)).astype(np.float32)
    variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x[:1]), seed=11)
    qparams = quantize_resnet_classifier(variables, cfg)
    qparams = calibrate_act_scales(
        cfg, qparams, rng.standard_normal((8, N_LAYERS, 32, 32)).astype(np.float32)
    )
    base = quantized_apply(cfg, qparams, x, pallas_1x1=())
    pal = quantized_apply(cfg, qparams, x, pallas_1x1=("stage_1",))
    base_p = np.asarray(jax.nn.softmax(base, axis=-1))
    pal_p = np.asarray(jax.nn.softmax(pal, axis=-1))
    assert np.max(np.abs(base_p - pal_p)) < 0.05
    decided = np.abs(base_p[:, 1] - base_p[:, 0]) > 0.02
    assert decided.sum() >= 4  # the check must actually bite
    assert np.array_equal(
        np.argmax(base_p[decided], -1), np.argmax(pal_p[decided], -1)
    )
    # and both must still track the fp32 model
    ref_p = np.asarray(
        jax.nn.softmax(model.apply(variables, x).logits, axis=-1)
    )
    assert np.max(np.abs(ref_p - pal_p)) < 0.08


def test_quantized_pallas_alignment_fallback():
    """Stages whose 1x1 channels are not 128-multiples silently fall back
    to the plain int8 path — requesting pallas everywhere on the small
    config must be a no-op (bit-identical logits)."""
    cfg = _small_config("bottleneck")
    model = KWSModel(cfg)
    rng = np.random.default_rng(12)
    x = rng.standard_normal((4, N_LAYERS, *OUT)).astype(np.float32)
    variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x[:1]), seed=12)
    qparams = quantize_resnet_classifier(variables, cfg)
    qparams = calibrate_act_scales(
        cfg, qparams, rng.standard_normal((4, N_LAYERS, *OUT)).astype(np.float32)
    )
    base = np.asarray(quantized_apply(cfg, qparams, x, pallas_1x1=()))
    pal = np.asarray(
        quantized_apply(
            cfg, qparams, x,
            pallas_1x1=("stem", "stage_0", "stage_1", "stage_2", "stage_3"),
        )
    )
    np.testing.assert_array_equal(base, pal)


def test_quantized_pallas_respects_float_stages():
    """float_stages wins over pallas_1x1 on the same stage: the result is
    bit-identical to the float_stages-only run."""
    cfg = _pallas_config()
    model = KWSModel(cfg)
    rng = np.random.default_rng(13)
    x = rng.standard_normal((4, N_LAYERS, 32, 32)).astype(np.float32)
    variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x[:1]), seed=13)
    qparams = quantize_resnet_classifier(variables, cfg)
    qparams = calibrate_act_scales(
        cfg, qparams, rng.standard_normal((4, N_LAYERS, 32, 32)).astype(np.float32)
    )
    a = np.asarray(
        quantized_apply(cfg, qparams, x, float_stages=("stage_1",), pallas_1x1=())
    )
    b = np.asarray(
        quantized_apply(
            cfg, qparams, x, float_stages=("stage_1",), pallas_1x1=("stage_1",)
        )
    )
    np.testing.assert_array_equal(a, b)


def test_pallas_stage_env_resolver(monkeypatch):
    from enhance_cb_whisper_tpu.models.quant import _default_pallas_1x1

    monkeypatch.delenv("ECW_S8_PALLAS", raising=False)
    assert _default_pallas_1x1() == frozenset()
    monkeypatch.setenv("ECW_S8_PALLAS", "stage_2,stage_3")
    assert _default_pallas_1x1() == frozenset({"stage_2", "stage_3"})
    monkeypatch.setenv("ECW_S8_PALLAS", "0")
    assert _default_pallas_1x1() == frozenset()
