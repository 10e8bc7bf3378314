"""Static FLOP accounting (runtime/flops.py) and profiler trace analysis
(runtime/profiler.py:device_op_breakdown).

The FLOP counter exists because XLA's Compiled.cost_analysis() counts a
while/scan body ONCE regardless of trip count — it under-reported the
lax.map-chunked catalog scorer ~16x (round-2 bench published 2.9% MFU for a
program profiled at >50%)."""

import gzip
import json

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhance_cb_whisper_tpu.runtime.flops import estimate_flops
from enhance_cb_whisper_tpu.runtime.profiler import device_op_breakdown


def test_dot_general_flops():
    f = estimate_flops(
        lambda a, b: a @ b, np.zeros((4, 8), np.float32), np.zeros((8, 16), np.float32)
    )
    assert f == 2 * 4 * 8 * 16


def test_batched_einsum_flops():
    f = estimate_flops(
        lambda a, b: jnp.einsum("bij,bjk->bik", a, b),
        np.zeros((3, 4, 8), np.float32),
        np.zeros((3, 8, 16), np.float32),
    )
    assert f == 2 * 3 * 4 * 8 * 16


def test_conv_flops():
    conv = nn.Conv(7, (3, 3), padding="SAME")
    x = np.zeros((1, 8, 8, 4), np.float32)
    v = conv.init(jax.random.PRNGKey(0), x)
    f = estimate_flops(lambda x_: conv.apply(v, x_), x)
    assert f == 2 * 1 * 8 * 8 * 7 * 3 * 3 * 4


def test_scan_multiplies_by_length():
    w = np.ones((8, 8), np.float32)

    def scanned(x):
        out, _ = jax.lax.scan(lambda c, _: (c @ w, None), x, None, length=5)
        return out

    assert estimate_flops(scanned, np.zeros((8, 8), np.float32)) == 5 * 2 * 8**3


def test_lax_map_multiplies_by_length():
    w = np.ones((8, 8), np.float32)
    f = estimate_flops(
        lambda xs: jax.lax.map(lambda x: x @ w, xs), np.zeros((6, 4, 8), np.float32)
    )
    assert f == 6 * 2 * 4 * 8 * 8


def test_catalog_scorer_flops_scale_with_chunks():
    """The regression that motivated this module: FLOPs must scale with the
    catalog size even though the chunk loop is a single scan."""
    from enhance_cb_whisper_tpu.catalog import (
        KeywordCatalog,
        device_put_catalog,
        make_catalog_score_fn,
    )
    from enhance_cb_whisper_tpu.models import ResNetConfig
    from enhance_cb_whisper_tpu.models.kws import KWSModel
    from enhance_cb_whisper_tpu.ops.resize import resize_matrix

    rng = np.random.default_rng(0)
    cfg = ResNetConfig(
        num_channels=2, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1), num_labels=2,
    )
    model = KWSModel(cfg)

    def kws_apply(v, x):
        return model.apply(v, x).logits

    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, 2, 16, 24), np.float32))
    score = make_catalog_score_fn(kws_apply, out_size=(16, 24), chunk=4)
    utt = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)
    w = jnp.asarray(resize_matrix(20, 24, antialias=False))

    def flops_for(n_keywords):
        stacks = [
            rng.standard_normal((2, 5, 8)).astype(np.float32)
            for _ in range(n_keywords)
        ]
        cat = KeywordCatalog.from_arrays(
            [f"k{i}" for i in range(n_keywords)], stacks, group_size=4
        )
        cat_dev = device_put_catalog(cat, out_h=16, chunk=4)
        return estimate_flops(score, variables, cat_dev, utt, w)

    f8, f32 = flops_for(8), flops_for(32)
    # 4x the keywords -> ~4x the FLOPs (utterance-side work is shared)
    assert f32 > 3.5 * f8


def _fake_trace(tmp_path):
    events = [
        {"ph": "M", "pid": 1, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name", "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 1, "tid": 1, "name": "thread_name", "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name", "args": {"name": "XLA Ops"}},
        # module track: one jit_f covering everything (must NOT be counted)
        {"ph": "X", "pid": 1, "tid": 1, "name": "jit_f", "ts": 0, "dur": 100},
        # op track: fusion.1 twice (loop iterations), nested child inside one
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1", "ts": 0, "dur": 40},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1", "ts": 50, "dur": 40},
        {"ph": "X", "pid": 1, "tid": 2, "name": "copy.2", "ts": 90, "dur": 10},
        # host track must be ignored entirely
        {"ph": "X", "pid": 9, "tid": 1, "name": "np.asarray", "ts": 0, "dur": 999},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_device_op_breakdown(tmp_path):
    total, ops = device_op_breakdown(_fake_trace(tmp_path))
    assert total == pytest.approx(90 / 1e6)
    assert ops[0]["name"] == "fusion.1" and ops[0]["count"] == 2
    assert ops[0]["seconds"] == pytest.approx(80 / 1e6)
    assert ops[1]["name"] == "copy.2"
    names = [o["name"] for o in ops]
    assert "jit_f" not in names and "np.asarray" not in names


def test_device_op_breakdown_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        device_op_breakdown(str(tmp_path))
