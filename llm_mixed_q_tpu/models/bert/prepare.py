"""One-off PTQ weight quantization for BERT params (see llama/prepare.py)."""

from __future__ import annotations

from ...ops.linear import quantize_bias, quantize_weight


def quantize_bert_params_ptq(params: dict, config) -> dict:
    """Jitted one-off PTQ weight quantization (see llama/prepare.py)."""
    if config.quant_config is None:
        return params
    import jax

    return jax.jit(lambda p: _quantize_bert_params(p, config))(params)


def _quantize_bert_params(params: dict, config) -> dict:
    def q_node(node: dict, node_cfg: dict) -> dict:
        node = dict(node)
        node["weight"] = quantize_weight(node["weight"], node_cfg)
        if node.get("bias") is not None:
            node["bias"] = quantize_bias(node["bias"], node_cfg)
        return node

    new_params = dict(params)
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        lc = config.quant_config[f"model_layer_{i}"]
        new_layer = dict(layer)
        attn = dict(layer["attention"])
        for name in ("query", "key", "value"):
            attn[name] = q_node(attn[name], lc["attention"][name])
        attn_out = dict(attn["output"])
        attn_out["dense"] = q_node(attn_out["dense"], lc["attention"]["output"]["dense"])
        attn["output"] = attn_out
        new_layer["attention"] = attn
        inter = dict(layer["intermediate"])
        inter["dense"] = q_node(inter["dense"], lc["intermediate"]["dense"])
        new_layer["intermediate"] = inter
        outp = dict(layer["output"])
        outp["dense"] = q_node(outp["dense"], lc["output"]["dense"])
        new_layer["output"] = outp
        new_layers.append(new_layer)
    new_params["layers"] = new_layers
    return new_params
