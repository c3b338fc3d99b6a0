"""Convert OPT linear weights to packed BFP storage (see llama/pack.py).

Covers the reference's quantized OPT nodes: self_attn.{q,k,v,out}_proj and
fc1/fc2 (reference quant_config_opt.py:44-57)."""

from __future__ import annotations

from ..pack_common import pack_linear_node


def pack_opt_params(params: dict, config, subbyte: bool = True) -> dict:
    if config.quant_config is None:
        return params
    new_params = dict(params)
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        layer_cfg = config.quant_config[f"model_layer_{i}"]
        new_layer = dict(layer)
        new_attn = dict(layer["self_attn"])
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            new_attn[name] = pack_linear_node(
                new_attn[name], layer_cfg["self_attn"][name], subbyte
            )
        new_layer["self_attn"] = new_attn
        for name in ("fc1", "fc2"):
            new_layer[name] = pack_linear_node(layer[name], layer_cfg[name], subbyte)
        new_layers.append(new_layer)
    new_params["layers"] = new_layers
    return new_params
