"""One-off PTQ weight quantization over the Llama param pytree.

Equivalent of the reference's quantize-weight-once-on-first-forward
(quantized_modules/linear.py:63-71, guarded by
``weight_requires_quantisation``): after ``quantize_llama_params_ptq`` the
model is served with ``quantize_weights=False`` so only activations are
quantized in the hot loop. Also the re-configuration point for search: params
stay resident, only this cheap pass re-runs per trial (vs the reference
re-instantiating the model every trial, search.py:145-176).
"""

from __future__ import annotations

from ...ops.linear import quantize_bias, quantize_weight

_LLAMA_LINEARS = {
    "self_attn": ("q_proj", "k_proj", "v_proj", "o_proj"),
    "mlp": ("gate_proj", "down_proj", "up_proj"),
}


def quantize_llama_params_ptq(params: dict, config) -> dict:
    """Return a new pytree with linear weights/biases fake-quantized once.

    Jitted as one XLA program — eager per-op dispatch would pay a compile
    round-trip per primitive."""
    if config.quant_config is None:
        return params
    import jax

    return jax.jit(lambda p: _quantize_llama_params(p, config))(params)


def _quantize_llama_params(params: dict, config) -> dict:
    new_params = dict(params)
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        layer_cfg = config.quant_config[f"model_layer_{i}"]
        new_layer = dict(layer)
        for group, names in _LLAMA_LINEARS.items():
            new_group = dict(layer[group])
            for name in names:
                node_cfg = layer_cfg[group][name]
                node = dict(new_group[name])
                node["weight"] = quantize_weight(node["weight"], node_cfg)
                if node.get("bias") is not None:
                    node["bias"] = quantize_bias(node["bias"], node_cfg)
                new_group[name] = node
            new_layer[group] = new_group
        new_layers.append(new_layer)
    new_params["layers"] = new_layers
    return new_params
