"""Block floating point (BFP / MSFP) fake quantizer — the paper's key format.

Reference: src/llm_mixed_q/models/quantize/quantizers/block_fp.py:21-153.
Per block: shared exponent = clamp(ceil(log2(per_block_abs_max))); each element
is sign + (width-1) mantissa bits of |x| / 2^e_shared. Zero-block guard and the
zero-preserving mask (block_fp.py:54-58, 92-94) are reproduced exactly.

TPU-first formulation: the per-block shared exponent is computed via
pad+reshape+max and broadcast back (see blocking.py), so the whole qdq is an
elementwise expression XLA fuses into the consuming matmul. The packed-storage
+ fused Pallas kernel path lives in ``llm_mixed_q_tpu.kernels`` and matches
this function bit-exactly (this is the semantics oracle).
"""

from __future__ import annotations

import jax.numpy as jnp

from .blocking import block_abs_max
from .exact import exact_exp2
from .ste import ste

_ATOL = 1e-8


def _block_fp_qdq(
    x,
    width: int = 12,
    exponent_width: int = 8,
    exponent_bias=None,
    block_size=(16,),
    skip_first_dim: bool = True,
):
    # zero_fill="one": collective-free under TP; output-identical because
    # block_fp's |x| <= 1e-8 passthrough returns every element of a zero
    # block unchanged for any scale (see blocking._fix_zero_blocks)
    per_block_max = block_abs_max(x, block_size, skip_first_dim,
                                  zero_fill="one")

    mantissa_bits = width - 1
    if exponent_bias in (None, "none", "None"):
        exponent_bias = 2 ** (exponent_width - 1) - 1

    exponent_max = 2**exponent_width - 1 - exponent_bias
    exponent_min = -exponent_bias
    mantissa_integer_max = 2**mantissa_bits - 1

    sign = jnp.sign(x + 1e-9)
    value = jnp.abs(x) + 1e-9
    exponent = jnp.clip(jnp.ceil(jnp.log2(per_block_max)), exponent_min, exponent_max)

    two_e = exact_exp2(exponent)  # exp2 must be exact (see exact.py)
    mantissa = value / two_e
    shift = 2**mantissa_bits
    mantissa_integer = jnp.clip(jnp.round(mantissa * shift), 0, mantissa_integer_max)
    mantissa = mantissa_integer / shift

    msfp = sign * two_e * mantissa
    # zero-preserving STE trick (reference block_fp.py:92-94)
    is_close_to_0 = jnp.abs(x) <= _ATOL
    return jnp.where(is_close_to_0, x, msfp)


block_fp_quantizer = ste(_block_fp_qdq)
