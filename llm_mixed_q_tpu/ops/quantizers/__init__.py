"""Quantizer registry.

Mirrors the reference QUANTIZER_MAP
(src/llm_mixed_q/models/quantize/quantizers/__init__.py:8-16): 7 arithmetics,
each a fake-quant (quantize->dequantize) function with an STE gradient.
"""

from .block_fp import block_fp_quantizer, _block_fp_qdq
from .block_log import block_log_quantizer, _block_log_qdq
from .block_minifloat import block_minifloat_quantizer, _block_minifloat_qdq
from .blocking import block_abs_max, infer_block_shape
from .integer import integer_quantizer, integer_fraction, _integer_qdq
from .log import log_quantizer, _log_qdq
from .minifloat import (
    minifloat_denorm_quantizer,
    minifloat_ieee_quantizer,
    _minifloat_denorm_qdq,
    _minifloat_ieee_qdq,
)

QUANTIZER_MAP = {
    "block_fp": block_fp_quantizer,
    "block_log": block_log_quantizer,
    "block_minifloat": block_minifloat_quantizer,
    "integer": integer_quantizer,
    "log": log_quantizer,
    "minifloat_denorm": minifloat_denorm_quantizer,
    "minifloat_ieee": minifloat_ieee_quantizer,
}


def get_quantizer(name: str):
    return QUANTIZER_MAP[name]
