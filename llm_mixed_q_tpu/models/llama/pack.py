"""Convert Llama linear weights to packed BFP storage.

The packed analogue of ``quantize_llama_params_ptq``: block_fp nodes with
[1, bs]-style blocks get int8 codes + per-block scales (served by the fused
Pallas kernel); any other node keeps fake-quant semantics (weight quantized
once here, activations per call).
"""

from __future__ import annotations

from ...kernels.packing import (
    _SLICE,
    effective_block_len,
    pack_block_fp,
    pack_block_fp_subbyte,
)
from ...ops.linear import quantize_bias, quantize_weight
from .prepare import _LLAMA_LINEARS


def _pack_weight(w, node_cfg, subbyte: bool):
    """Pick the packed representation for one block_fp weight: bit-packed
    uint32 words when the width is sub-byte and blocks divide the 128-lane
    slice, int8 codes otherwise."""
    width = node_cfg["weight_width"]
    bs = effective_block_len(node_cfg["weight_block_size"], w.shape[1])
    if subbyte and width < 8 and bs is not None and _SLICE % bs == 0:
        return pack_block_fp_subbyte(
            w,
            width,
            node_cfg["weight_exponent_width"],
            node_cfg["weight_exponent_bias"],
            node_cfg["weight_block_size"],
        )
    return pack_block_fp(
        w,
        width,
        node_cfg["weight_exponent_width"],
        node_cfg["weight_exponent_bias"],
        node_cfg["weight_block_size"],
    )


def pack_llama_params(params: dict, config, subbyte: bool = True) -> dict:
    if config.quant_config is None:
        return params
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
                w = node["weight"]
                if (
                    node_cfg.get("name") == "block_fp"
                    and not node_cfg.get("bypass", False)
                    and effective_block_len(
                        node_cfg["weight_block_size"], w.shape[1]
                    )
                    is not None
                ):
                    node["weight"] = _pack_weight(w, node_cfg, subbyte)
                else:
                    node["weight"] = quantize_weight(w, node_cfg)
                if node.get("bias") is not None:
                    node["bias"] = quantize_bias(node["bias"], node_cfg)
                new_group[name] = node
            new_layer[group] = new_group
        new_layers.append(new_layer)
    new_params["layers"] = new_layers
    return new_params
