"""Shared packed-storage conversion for quantized-linear nodes.

Replaces what the reference only simulates (fp32 qdq round trips,
reference linear.py:59-76 is_ptq mode) with real packed buffers: block_fp
nodes with [1, bs]-style blocks become bit-packed uint32 words (sub-byte
widths) or int8 codes + per-block scales, served by the fused Pallas
dequant-matmul; any other arith keeps fake-quant semantics with the weight
quantized once here.
"""

from __future__ import annotations

from ..kernels.packing import (
    _SLICE,
    effective_block_len,
    pack_block_fp,
    pack_block_fp_subbyte,
)
from ..ops.linear import quantize_bias, quantize_weight


def pack_linear_node(node: dict, node_cfg: dict, subbyte: bool = True) -> dict:
    """One linear param node {weight, bias?} -> packed/quantized node."""
    node = dict(node)
    w = node["weight"]
    packable = (
        node_cfg.get("name") == "block_fp"
        and not node_cfg.get("bypass", False)
        and effective_block_len(node_cfg["weight_block_size"], w.shape[1])
        is not None
    )
    if packable:
        width = node_cfg["weight_width"]
        bs = effective_block_len(node_cfg["weight_block_size"], w.shape[1])
        if subbyte and width < 8 and _SLICE % bs == 0:
            node["weight"] = pack_block_fp_subbyte(
                w,
                width,
                node_cfg["weight_exponent_width"],
                node_cfg["weight_exponent_bias"],
                node_cfg["weight_block_size"],
            )
        else:
            node["weight"] = pack_block_fp(
                w,
                width,
                node_cfg["weight_exponent_width"],
                node_cfg["weight_exponent_bias"],
                node_cfg["weight_block_size"],
            )
    else:
        node["weight"] = quantize_weight(w, node_cfg)
    if node.get("bias") is not None:
        node["bias"] = quantize_bias(node["bias"], node_cfg)
    return node
