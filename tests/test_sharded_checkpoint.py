"""Orbax sharded checkpoint round-trip under the 8-virtual-device mesh
(VERDICT r1 item 10; SURVEY §5 'Orbax checkpoints with the same policy')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhance_cb_whisper_tpu.parallel import make_mesh
from enhance_cb_whisper_tpu.runtime.sharded_checkpoint import (
    restore_sharded,
    save_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh({"data": 4, "model": 2})


def _sharded_state(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    return {
        "params": {
            "w": jax.device_put(
                rng.standard_normal((16, 8), dtype=np.float32),
                NamedSharding(mesh, P("data", "model")),
            ),
            "b": jax.device_put(
                rng.standard_normal((8,), dtype=np.float32),
                NamedSharding(mesh, P(None)),
            ),
        },
        "step": jnp.asarray(7),
    }


def test_sharded_roundtrip(tmp_path, mesh):
    state = _sharded_state(mesh)
    save_sharded(str(tmp_path / "ckpt"), state)

    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding), state
    )
    restored = restore_sharded(str(tmp_path / "ckpt"), template)

    assert restored["params"]["w"].sharding == state["params"]["w"].sharding
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["b"]), np.asarray(state["params"]["b"])
    )
    assert int(restored["step"]) == 7


def test_restore_onto_different_layout(tmp_path, mesh):
    """Restore relays arrays onto a different sharding (elastic topology)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = _sharded_state(mesh)
    save_sharded(str(tmp_path / "ckpt2"), state)

    new_shardings = {
        "params": {
            "w": NamedSharding(mesh, P("model", None)),
            "b": NamedSharding(mesh, P(None)),
        },
        "step": NamedSharding(mesh, P()),
    }
    template = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        state, new_shardings,
    )
    restored = restore_sharded(str(tmp_path / "ckpt2"), template)
    assert restored["params"]["w"].sharding.spec == P("model", None)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
