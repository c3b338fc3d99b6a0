"""Device mesh construction.

TPU-native replacement for the reference's parallelism stack (SURVEY.md
§2.14): instead of NCCL DDP/FSDP + accelerate layer-wise dispatch, a single
``jax.sharding.Mesh`` with (data, model) axes; pjit + NamedSharding lay
params/batches out and XLA emits the collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= data * model, (
        f"need {data * model} devices, have {len(devices)}"
    )
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def shard(mesh: Mesh, tree, spec_tree):
    """device_put a pytree with a matching PartitionSpec pytree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        spec_tree,
        is_leaf=lambda x: x is None,
    )


def batch_spec() -> P:
    return P("data")
