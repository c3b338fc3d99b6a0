"""Block base-2 log (BL) fake quantizer.

Reference: src/llm_mixed_q/models/quantize/quantizers/block_log.py:23-120.
Per block: shared log-bias = clamp(2^(width-1) - 1 - ceil(log2(per_block_max)),
0, 2^bias_width - 1); then elementwise log quantization with that shared bias.
"""

from __future__ import annotations

import jax.numpy as jnp

from .blocking import block_abs_max
from .log import _log_qdq
from .ste import ste


def _block_log_qdq(
    x,
    width: int,
    exponent_bias_width: int = None,
    block_size=(16,),
    skip_first_dim: bool = False,
):
    exponent_bits = width - 1
    per_block_max = block_abs_max(x, block_size, skip_first_dim)
    per_block_max_exponent = jnp.ceil(jnp.log2(per_block_max))
    per_block_bias = jnp.clip(
        2**exponent_bits - 1 - per_block_max_exponent, 0, 2**exponent_bias_width - 1
    )
    return _log_qdq(x, width=width, exponent_bias=per_block_bias)


block_log_quantizer = ste(_block_log_qdq)
