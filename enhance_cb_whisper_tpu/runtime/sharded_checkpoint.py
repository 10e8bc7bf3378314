"""Orbax-backed sharded checkpoints for the mesh training path.

The reference's checkpointing is Lightning's single-process torch.save
(SURVEY.md §5); the TPU-native framework trains under a
``jax.sharding.Mesh``, so multi-host/multi-chip state must save and restore
WITH its shardings — each host writes only its addressable shards, and
restore re-lays arrays out on the (possibly different) target mesh. Orbax
handles the array serialization + atomicity; this module pins the policy:

* ``save_sharded(path, state)`` — state is any pytree of jax.Arrays (params,
  opt_state, batch_stats, step); sharded arrays are written distributed.
* ``restore_sharded(path, template)`` — ``template`` is a matching pytree of
  arrays OR jax.ShapeDtypeStruct with ``.sharding`` set; outputs land
  sharded on the template's mesh without a host-memory round-trip of the
  full state.

The best-by-metric ×3 + final retention policy lives in
:class:`.checkpoint.CheckpointManager` and composes: pass ``save_fn``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def save_sharded(path: str, state: Any, force: bool = True) -> None:
    """Write a (possibly sharded) pytree of jax.Arrays atomically."""
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), state, force=force)


def restore_sharded(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; with ``template``, arrays are produced directly
    with the template's shapes/dtypes/shardings (sharded restore)."""
    import orbax.checkpoint as ocp

    ckptr = _checkpointer()
    if template is None:
        return ckptr.restore(os.path.abspath(path))

    def spec(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            sharding = getattr(x, "sharding", None)
        else:
            sharding = x.sharding if isinstance(x, jax.Array) else None
        return ocp.ArrayRestoreArgs(
            sharding=sharding,
            global_shape=getattr(x, "shape", None),
            dtype=getattr(x, "dtype", None),
        )

    restore_args = jax.tree.map(spec, template)
    return ckptr.restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(
            item=template, restore_args=restore_args
        ),
    )
