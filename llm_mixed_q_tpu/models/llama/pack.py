"""Convert Llama linear weights to packed BFP storage.

The packed analogue of ``quantize_llama_params_ptq``: block_fp nodes with
[1, bs]-style blocks get bit-packed uint32 words (sub-byte widths) or int8
codes + per-block scales (served by the fused Pallas kernel); any other node
keeps fake-quant semantics (weight quantized once here, activations per
call). Covers the reference's quantized Llama nodes: self_attn.{q,k,v,o}_proj
and mlp.{gate,down,up}_proj (reference quant_config_llama.py:50-65).
"""

from __future__ import annotations

from ..pack_common import pack_linear_node
from .prepare import _LLAMA_LINEARS


def pack_llama_params(
    params: dict, config, subbyte: bool = True, host: bool = False
) -> dict:
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
                new_group[name] = pack_linear_node(
                    new_group[name], layer_cfg[group][name], subbyte, host
                )
            new_layer[group] = new_group
        new_layers.append(new_layer)
    new_params["layers"] = new_layers
    return new_params


def pack_llama_params_host(params: dict, config, subbyte: bool = True) -> dict:
    """Host-side packing (native C++ engine / CPU-JAX fallback): packed
    leaves are numpy, so a later ``jax.device_put`` moves only ~width/32 of
    the fp32 bytes over the host↔device link. Use for models whose fp32
    params exceed device HBM (e.g. Llama-7B on one 16GB chip)."""
    return pack_llama_params(params, config, subbyte, host=True)
