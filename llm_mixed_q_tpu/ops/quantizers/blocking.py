"""Blocking machinery for block-based quantizers.

Reproduces the semantics of the reference's ``block``/``unblock``
(reference: src/llm_mixed_q/models/quantize/quantizers/utils.py:261-321) but in
a TPU-friendly formulation: instead of materializing an unfold/fold blocked
layout, we compute the per-block abs-max *reduced* array with pad+reshape+max
and broadcast it back to each element's position. Every block quantizer then
becomes a purely elementwise op over (x, shared_stat) that XLA fuses into the
surrounding matmul — no gather/scatter, static shapes throughout.

Block-shape inference and padding semantics match the reference exactly:
  - ``_infer_block_shape`` right-aligns the requested block shape with the
    array shape, clamping each dim to the array dim
    (reference utils.py:42-67).
  - 1-D bias  -> blocks of ``bs`` along the only dim (utils.py:86-104)
  - 2-D activation (skip_first_dim=True) -> per-row blocks along the last dim,
    block shape inferred against [1, hidden] (utils.py:127-144)
  - 2-D weight -> 2-D tiles [bs0, bs1] (utils.py:161-183, F.unfold equivalent)
  - 3-D activation (skip_first_dim=True) -> 2-D tiles over the last two dims,
    per batch element (utils.py:211-237)
Padding contributes zeros which never change a per-block abs-max, and padded
positions are never read back, so pad+reduce+broadcast+slice is exactly
equivalent to the reference's pad+unfold+max+fold+slice round trip.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def infer_block_shape(x_shape: Sequence[int], block_shape: Sequence[int]) -> list[int]:
    """Right-align ``block_shape`` with ``x_shape`` and clamp to array dims.

    Mirrors reference utils.py:_infer_block_shape (utils.py:42-67).
    """
    x_ndim = len(x_shape)
    block_ndim = len(block_shape)
    if block_ndim >= x_ndim:
        inferred = list(block_shape[-x_ndim:])
    else:
        inferred = [-1] * (x_ndim - block_ndim) + list(block_shape)
    for i in range(x_ndim):
        if inferred[i] == -1 or inferred[i] > x_shape[i]:
            inferred[i] = x_shape[i]
    return inferred


def _pad_to_multiple(x: jnp.ndarray, dims: Sequence[int], blocks: Sequence[int]):
    """Zero-pad dims of x (given by index) up to a multiple of block size."""
    pads = [(0, 0)] * x.ndim
    needs = False
    for d, b in zip(dims, blocks):
        n = x.shape[d]
        target = math.ceil(n / b) * b
        if target != n:
            pads[d] = (0, target - n)
            needs = True
    if needs:
        x = jnp.pad(x, pads)
    return x


def _fix_zero_blocks(pbm: jnp.ndarray, zero_fill: str = "nonzero_min"
                     ) -> jnp.ndarray:
    """Replace zero per-block maxes.

    Reference semantics (e.g. block_fp.py:54-58): if ALL per-block maxes are 0,
    use 1.0 everywhere; otherwise replace the zeros with the smallest non-zero
    per-block max.

    ``zero_fill="one"`` fills zero blocks with the constant 1.0 instead. The
    nonzero-min is a GLOBAL reduction over the whole tensor — under tensor
    parallelism it forces a cross-shard all-reduce-min per quantizer call
    (2/layer in the TP decode HLO, round-5 scaling census). For quantizers
    with the |x| <= 1e-8 element passthrough (block_fp), the fill value is
    provably output-irrelevant: a zero block max means every element is
    exactly 0, and those elements pass through unchanged for ANY scale — so
    the qdq path may use the collective-free constant while the PACK paths
    keep the reference fill (stored scale bytes stay bit-identical to the
    reference and the native packer)."""
    is_zero = pbm == 0
    if zero_fill == "one":
        return jnp.where(is_zero, jnp.ones((), pbm.dtype), pbm)
    nonzero_min = jnp.min(jnp.where(is_zero, jnp.inf, pbm))
    fill = jnp.where(jnp.isinf(nonzero_min), jnp.ones((), pbm.dtype), nonzero_min)
    return jnp.where(is_zero, fill, pbm)


def block_abs_max(
    x: jnp.ndarray, block_size: Sequence[int] | int, skip_first_dim: bool,
    zero_fill: str = "nonzero_min",
) -> jnp.ndarray:
    """Per-block abs-max broadcast back to ``x.shape`` (zero blocks fixed).

    The returned array holds, at each element position, the shared abs-max of
    the quantization block that element belongs to. This is the only
    data-dependent collective a block quantizer needs; everything downstream
    is elementwise.
    """
    if isinstance(block_size, int):
        block_size = [block_size]
    block_size = list(block_size)

    if x.ndim == 1:
        if skip_first_dim:
            raise ValueError("skip_first_dim must be False for 1-D (bias) blocking")
        (n,) = x.shape
        bs = infer_block_shape([n], block_size)[0]
        xp = _pad_to_multiple(x, [0], [bs])
        nb = xp.shape[0] // bs
        pbm = jnp.max(jnp.abs(xp).reshape(nb, bs), axis=1)
        pbm = _fix_zero_blocks(pbm, zero_fill)
        out = jnp.repeat(pbm, bs)[:n]
        return out

    if x.ndim == 2 and skip_first_dim:
        b, h = x.shape
        bs = infer_block_shape([1, h], block_size)[-1]
        xp = _pad_to_multiple(x, [1], [bs])
        nb = xp.shape[1] // bs
        pbm = jnp.max(jnp.abs(xp).reshape(b, nb, bs), axis=2)
        pbm = _fix_zero_blocks(pbm, zero_fill)
        out = jnp.repeat(pbm, bs, axis=1)[:, :h]
        return out

    if x.ndim == 2:  # 2-D weight: full 2-D tiles
        r, c = x.shape
        bs0, bs1 = infer_block_shape([r, c], block_size)
        xp = _pad_to_multiple(x, [0, 1], [bs0, bs1])
        nb0, nb1 = xp.shape[0] // bs0, xp.shape[1] // bs1
        pbm = jnp.max(jnp.abs(xp).reshape(nb0, bs0, nb1, bs1), axis=(1, 3))
        pbm = _fix_zero_blocks(pbm, zero_fill)
        out = jnp.repeat(jnp.repeat(pbm, bs0, axis=0), bs1, axis=1)[:r, :c]
        return out

    if x.ndim == 3 and skip_first_dim:
        b, d1, d2 = x.shape
        _, bs1, bs2 = infer_block_shape([1, d1, d2], block_size)
        xp = _pad_to_multiple(x, [1, 2], [bs1, bs2])
        nb1, nb2 = xp.shape[1] // bs1, xp.shape[2] // bs2
        pbm = jnp.max(jnp.abs(xp).reshape(b, nb1, bs1, nb2, bs2), axis=(2, 4))
        pbm = _fix_zero_blocks(pbm, zero_fill)
        out = jnp.repeat(jnp.repeat(pbm, bs1, axis=1), bs2, axis=2)[:, :d1, :d2]
        return out

    raise ValueError(
        f"Unsupported blocking: ndim={x.ndim}, skip_first_dim={skip_first_dim}"
    )
