"""Device mesh utilities.

The reference's distributed story is Lightning DDP flags that no shipped
config enables (SURVEY.md §2.7).  Here scaling is explicit and TPU-native:
one ``jax.sharding.Mesh`` with a ``data`` axis (batch/data parallelism —
the DDP replacement) and a ``model`` axis (keyword-catalog sharding and
optional tensor parallelism for large encoders).  Collectives ride ICI via
XLA's SPMD partitioner; metric sync that Lightning does with
``sync_dist=True`` falls out of jit on sharded inputs (reductions become
psums automatically).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh; default: all devices on the ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"data": len(devices), "model": 1}
    sizes = list(shape.values())
    assert int(np.prod(sizes)) == len(devices), (
        f"mesh {shape} does not match {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(shape.keys()))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in ``batch`` with its leading dim over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
