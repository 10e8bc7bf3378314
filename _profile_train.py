"""Profile the bf16 KWS train step on-chip (reference full config:
batch 20, 12-ch ResNet-50, 150x750)."""
import numpy as np
import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache
enable_persistent_cache()

from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.train.kws_train import (
    KWSTrainConfig, init_train_state, make_train_step,
)
from enhance_cb_whisper_tpu.runtime.profiler import trace, device_op_breakdown

cfg = KWSTrainConfig(compute_dtype="bfloat16")
rcfg = ResNetConfig(num_channels=12, num_labels=2)
rng = jax.random.PRNGKey(0)
state, (kws, disc, tx) = init_train_state(rng, cfg, rcfg, (12, 150, 750))
step = make_train_step(cfg, kws, disc, tx)

nprng = np.random.default_rng(0)
batch = {
    "features": nprng.standard_normal((20, 12, 150, 750)).astype(np.float32),
    "labels": nprng.integers(0, 2, (20,)).astype(np.int32),
    "domain": nprng.integers(0, 2, (20,)).astype(np.int32),
}
batch = {k: jnp.asarray(v) for k, v in batch.items()}

out = step(state.params, state.batch_stats, state.opt_state, batch,
           jax.random.PRNGKey(1), 0.0, 0.0)
np.asarray(jax.tree_util.tree_leaves(out)[0])

with trace("/tmp/train_trace"):
    out = step(state.params, state.batch_stats, state.opt_state, batch,
               jax.random.PRNGKey(1), 0.0, 0.0)
    np.asarray(jax.tree_util.tree_leaves(out)[0])

total, ops = device_op_breakdown("/tmp/train_trace")
print(f"total device s: {total:.3f}")
for o in ops[:30]:
    print(f"{o['seconds']*1e3:9.2f} ms x{o['count']:4d}  {o['name'][:100]}")
