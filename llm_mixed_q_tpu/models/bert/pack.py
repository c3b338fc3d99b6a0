"""Convert BERT linear weights to packed BFP storage (see llama/pack.py).

Covers the reference's quantized BERT nodes: attention.{query,key,value},
attention.output.dense, intermediate.dense, output.dense
(reference quant_config_bert.py:64-85)."""

from __future__ import annotations

from ..pack_common import pack_linear_node


def pack_bert_params(params: dict, config, subbyte: bool = True) -> dict:
    if config.quant_config is None:
        return params
    new_params = dict(params)
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        lc = config.quant_config[f"model_layer_{i}"]
        new_layer = dict(layer)
        attn = dict(layer["attention"])
        for name in ("query", "key", "value"):
            attn[name] = pack_linear_node(attn[name], lc["attention"][name], subbyte)
        attn_out = dict(attn["output"])
        attn_out["dense"] = pack_linear_node(
            attn_out["dense"], lc["attention"]["output"]["dense"], subbyte
        )
        attn["output"] = attn_out
        new_layer["attention"] = attn
        inter = dict(layer["intermediate"])
        inter["dense"] = pack_linear_node(
            inter["dense"], lc["intermediate"]["dense"], subbyte
        )
        new_layer["intermediate"] = inter
        outp = dict(layer["output"])
        outp["dense"] = pack_linear_node(outp["dense"], lc["output"]["dense"], subbyte)
        new_layer["output"] = outp
        new_layers.append(new_layer)
    new_params["layers"] = new_layers
    return new_params
