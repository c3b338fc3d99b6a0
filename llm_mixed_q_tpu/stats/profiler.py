"""Statistic profiling runners.

Reference: src/llm_mixed_q/statstic_profiler/stat_profiler.py:9-81
(``profile_statistics_cls_glue``/``profile_statistics_lm_fn``).

TPU-first design: instead of eager forward hooks, a JITTED tapped forward
returns the activation arrays of every quant node as outputs (one XLA
program), and weight/bias stats are read directly from the resident params
pytree — no eager dispatch anywhere.
"""

from __future__ import annotations

import numpy as np

from .capture import PARAM_PATH_SPECS, TAP_ENTRY_SPECS, make_tapped_forward
from .manager import StatManager

DEFAULT_ACT_STATS = ("range_min_max", "variance_online")
DEFAULT_WEIGHT_STATS = ("range_min_max", "variance_precise")


def _collect_weight_stats(manager: StatManager, params: dict, arch: str, prefix: str):
    entry_spec = TAP_ENTRY_SPECS[arch]
    path_spec = PARAM_PATH_SPECS[arch]
    for i, layer in enumerate(params["layers"]):
        for suffix, path in path_spec.items():
            entries = entry_spec[suffix]
            node = layer
            for p in path:
                node = node[p]
            base = f"{prefix}:model_layer_{i}:{suffix.replace(':', ':')}"
            if "weight" in entries:
                manager.update_weight(f"{base}:weight", np.asarray(node["weight"]))
            if "bias" in entries and node.get("bias") is not None:
                manager.update_weight(f"{base}:bias", np.asarray(node["bias"]))


def profile_statistics(
    forward_fn=None,
    batches=None,
    arch: str = "llama",
    act_stats=DEFAULT_ACT_STATS,
    weight_stats=DEFAULT_WEIGHT_STATS,
    root_name: str = "root",
    num_samples: int | None = None,
    # jitted path:
    model_fn=None,
    config=None,
    params=None,
) -> dict:
    """Collect act/weight statistics at every quant node.

    Two modes:
    - jitted (preferred): pass ``model_fn``, ``config``, ``params`` — taps
      come back as outputs of one compiled program per batch shape.
    - eager: pass ``forward_fn(batch)`` that runs the model UNjitted under
      the tap context (kept for API parity / debugging).
    """
    import jax.numpy as jnp

    manager = StatManager(act_stats=act_stats, weight_stats=weight_stats)

    if model_fn is not None:
        assert config is not None and params is not None
        tapped = make_tapped_forward(model_fn, config, arch)
        seen = 0
        for batch in batches:
            taps = tapped(
                params,
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
            )
            for node_name, entries in taps.items():
                for entry, arr in entries.items():
                    manager.update_act(
                        f"{root_name}:{node_name}:{entry}", np.asarray(arr)
                    )
            seen += _batch_size(batch)
            if num_samples is not None and seen >= num_samples:
                break
        _collect_weight_stats(manager, params, arch, root_name)
        return manager.finalize()

    # eager fallback
    from ..ops.linear import capture_quant_node_taps
    from .capture import StatTapRouter

    router = StatTapRouter(manager, arch=arch, prefix=root_name)
    seen = 0
    with capture_quant_node_taps(router):
        for batch in batches:
            forward_fn(batch)
            seen += _batch_size(batch)
            if num_samples is not None and seen >= num_samples:
                break
    return manager.finalize()


def _batch_size(batch) -> int:
    if isinstance(batch, dict):
        batch = next(iter(batch.values()))
    return int(batch.shape[0])
