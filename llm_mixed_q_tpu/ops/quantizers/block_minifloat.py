"""Block minifloat (BM) fake quantizer.

Reference: src/llm_mixed_q/models/quantize/quantizers/block_minifloat.py:22-141.
Per block: shared exponent *bias* = clamp(floor(log2(per_block_abs_max)), 0,
2^bias_width - 1); then each element is minifloat_ieee-quantized with that
shared bias. The shared bias is broadcast back to element positions so the
minifloat core runs elementwise with an array bias.
"""

from __future__ import annotations

import jax.numpy as jnp

from .blocking import block_abs_max
from .minifloat import _minifloat_ieee_qdq
from .ste import ste


def _block_minifloat_qdq(
    x,
    width: int,
    exponent_width: int,
    exponent_bias_width: int,
    block_size=(16,),
    skip_first_dim: bool = False,
):
    per_block_max = block_abs_max(x, block_size, skip_first_dim)
    per_block_bias = jnp.clip(
        jnp.floor(jnp.log2(per_block_max)), 0, 2**exponent_bias_width - 1
    )
    return _minifloat_ieee_qdq(
        x, width=width, exponent_width=exponent_width, exponent_bias=per_block_bias
    )


block_minifloat_quantizer = ste(_block_minifloat_qdq)
