"""Tap router: quant-node taps -> StatManager entries.

Per-arch entry specs mirror the reference hook registrations:
- llama: profiler_llama.py:155-180 (q/k/v incl. data_out; o/gate/down/up
  data_in+weight only; no bias)
- opt: profiler_opt.py:116-180 (bias entries included)
- bert: profiler_bert.py:184-236 (bias entries included)
Entry names: ``<prefix>:model_layer_<i>:...:<entry>``.
"""

from __future__ import annotations

import numpy as np

from .manager import StatManager

TAP_ENTRY_SPECS = {
    "llama": {
        "self_attn:q_proj": ("data_in", "weight", "data_out"),
        "self_attn:k_proj": ("data_in", "weight", "data_out"),
        "self_attn:v_proj": ("data_in", "weight", "data_out"),
        "self_attn:o_proj": ("data_in", "weight"),
        "mlp:gate_proj": ("data_in", "weight"),
        "mlp:down_proj": ("data_in", "weight"),
        "mlp:up_proj": ("data_in", "weight"),
    },
    "opt": {
        "self_attn:q_proj": ("data_in", "weight", "bias", "data_out"),
        "self_attn:k_proj": ("data_in", "weight", "bias", "data_out"),
        "self_attn:v_proj": ("data_in", "weight", "bias", "data_out"),
        "self_attn:out_proj": ("data_in", "weight", "bias"),
        "fc1": ("data_in", "weight", "bias"),
        "fc2": ("data_in", "weight", "bias"),
    },
    "bert": {
        "attention:query": ("data_in", "weight", "bias", "data_out"),
        "attention:key": ("data_in", "weight", "bias", "data_out"),
        "attention:value": ("data_in", "weight", "bias", "data_out"),
        "attention:output:dense": ("data_in", "weight", "bias"),
        "intermediate:dense": ("data_in", "weight", "bias"),
        "output:dense": ("data_in", "weight", "bias"),
    },
}


class TracingTapCollector:
    """Collects tap arrays (tracers) into a dict during jit tracing.

    Used by ``make_tapped_forward``: the model is traced ONCE inside the
    capture context; the tapped activations become jit outputs, so stat
    collection runs at compiled speed — the functional replacement for
    eager hooks (SURVEY.md §5 "stats collection becomes a functional
    intercept that threads a stats pytree out of the forward").
    """

    def __init__(self, arch: str):
        self.spec = TAP_ENTRY_SPECS[arch]
        self.taps: dict[str, dict] = {}

    def on_linear(self, node_name: str, x, w, b, out):
        _, _, suffix = node_name.partition(":")
        entries = self.spec.get(suffix)
        if entries is None:
            return
        node_taps = {}
        if "data_in" in entries:
            node_taps["data_in"] = x
        if "data_out" in entries:
            node_taps["data_out"] = out
        if node_taps:
            self.taps[node_name] = node_taps


def make_tapped_forward(model_fn, config, arch: str, quantize_weights: bool = False):
    """Jitted ``fwd(params, input_ids, attention_mask) -> {node: {entry: arr}}``."""
    import jax

    from ..ops.linear import capture_quant_node_taps

    @jax.jit
    def fwd(params, input_ids, attention_mask):
        collector = TracingTapCollector(arch)
        with capture_quant_node_taps(collector):
            model_fn(
                params,
                input_ids,
                attention_mask,
                config=config,
                quantize_weights=quantize_weights,
            )
        return collector.taps

    return fwd


# node-name suffix -> params pytree path, per arch (for weight/bias stats —
# taken directly from the resident params, no forward needed)
PARAM_PATH_SPECS = {
    "llama": {
        "self_attn:q_proj": ("self_attn", "q_proj"),
        "self_attn:k_proj": ("self_attn", "k_proj"),
        "self_attn:v_proj": ("self_attn", "v_proj"),
        "self_attn:o_proj": ("self_attn", "o_proj"),
        "mlp:gate_proj": ("mlp", "gate_proj"),
        "mlp:down_proj": ("mlp", "down_proj"),
        "mlp:up_proj": ("mlp", "up_proj"),
    },
    "opt": {
        "self_attn:q_proj": ("self_attn", "q_proj"),
        "self_attn:k_proj": ("self_attn", "k_proj"),
        "self_attn:v_proj": ("self_attn", "v_proj"),
        "self_attn:out_proj": ("self_attn", "out_proj"),
        "fc1": ("fc1",),
        "fc2": ("fc2",),
    },
    "bert": {
        "attention:query": ("attention", "query"),
        "attention:key": ("attention", "key"),
        "attention:value": ("attention", "value"),
        "attention:output:dense": ("attention", "output", "dense"),
        "intermediate:dense": ("intermediate", "dense"),
        "output:dense": ("output", "dense"),
    },
}


class StatTapRouter:
    """Routes ``on_linear`` taps into a StatManager by entry spec."""

    def __init__(self, stat_manager: StatManager, arch: str, prefix: str = "root"):
        self.manager = stat_manager
        self.spec = TAP_ENTRY_SPECS[arch]
        self.prefix = prefix

    def on_linear(self, node_name: str, x, w, b, out):
        # node_name = "model_layer_<i>:<suffix>"
        _, _, suffix = node_name.partition(":")
        entries = self.spec.get(suffix)
        if entries is None:
            return
        base = f"{self.prefix}:{node_name}"
        if "data_in" in entries:
            self.manager.update_act(f"{base}:data_in", np.asarray(x))
        if "weight" in entries:
            self.manager.update_weight(f"{base}:weight", np.asarray(w))
        if "bias" in entries and b is not None:
            self.manager.update_weight(f"{base}:bias", np.asarray(b))
        if "data_out" in entries:
            self.manager.update_act(f"{base}:data_out", np.asarray(out))
