"""One-off PTQ weight quantization for OPT params (see llama/prepare.py)."""

from __future__ import annotations

from ...ops.linear import quantize_bias, quantize_weight


def quantize_opt_params_ptq(params: dict, config) -> dict:
    """Jitted one-off PTQ weight quantization (see llama/prepare.py)."""
    if config.quant_config is None:
        return params
    import jax

    return jax.jit(lambda p: _quantize_opt_params(p, config))(params)


def _quantize_opt_params(params: dict, config) -> dict:
    def q_node(node: dict, node_cfg: dict) -> dict:
        node = dict(node)
        node["weight"] = quantize_weight(node["weight"], node_cfg)
        if node.get("bias") is not None:
            node["bias"] = quantize_bias(node["bias"], node_cfg)
        return node

    new_params = dict(params)
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        layer_cfg = config.quant_config[f"model_layer_{i}"]
        new_layer = dict(layer)
        new_attn = dict(layer["self_attn"])
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            new_attn[name] = q_node(new_attn[name], layer_cfg["self_attn"][name])
        new_layer["self_attn"] = new_attn
        for name in ("fc1", "fc2"):
            new_layer[name] = q_node(layer[name], layer_cfg[name])
        new_layers.append(new_layer)
    new_params["layers"] = new_layers
    return new_params
