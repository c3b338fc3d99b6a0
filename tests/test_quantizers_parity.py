"""Bit-exactness parity: jnp quantizers vs the reference torch implementation.

SURVEY.md §4 items 1-2: golden parity for all 7 arithmetics over random
tensors, shapes exercising blocking/padding edges (non-divisible dims), all
block layouts (1-D bias, 2-D weight tiles, 2-D/3-D activations), zero blocks,
saturation, and subnormals.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

import jax.numpy as jnp

from llm_mixed_q_tpu.ops.quantizers import (
    block_fp_quantizer,
    block_log_quantizer,
    block_minifloat_quantizer,
    integer_quantizer,
    log_quantizer,
    minifloat_denorm_quantizer,
    minifloat_ieee_quantizer,
)
from reference_loader import load_reference_quantizers

refq = load_reference_quantizers()

RNG = np.random.default_rng(0)


def _rand(shape, scale=4.0):
    x = RNG.standard_normal(shape).astype(np.float32) * scale
    # sprinkle exact zeros, tiny and large values
    flat = x.reshape(-1)
    n = flat.shape[0]
    idx = RNG.choice(n, size=max(1, n // 16), replace=False)
    flat[idx[: len(idx) // 3]] = 0.0
    flat[idx[len(idx) // 3 : 2 * len(idx) // 3]] = 1e-12
    flat[idx[2 * len(idx) // 3 :]] = 1e6
    return x


def _check(ours, theirs, atol=0.0):
    ours = np.asarray(ours)
    theirs = theirs.detach().numpy()
    # bit-exact except for measure-zero log2/rounding boundary ULP flips
    mismatch = np.sum(ours != theirs)
    assert mismatch <= max(1, ours.size // 10000), (
        f"{mismatch}/{ours.size} mismatches; max abs diff "
        f"{np.max(np.abs(ours - theirs))}"
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


SHAPES_ACT = [(4, 37), (2, 9, 33), (8, 128)]
SHAPES_W = [(37, 33), (16, 16), (7, 129)]
SHAPES_BIAS = [(17,), (16,), (1,)]


@pytest.mark.parametrize("shape", SHAPES_ACT + SHAPES_W)
@pytest.mark.parametrize("width,frac", [(8, 4), (4, 2), (3, 1)])
def test_integer(shape, width, frac):
    x = _rand(shape)
    ours = integer_quantizer(jnp.asarray(x), width, frac)
    theirs = refq.integer.integer_quantizer(torch.tensor(x), width, frac)
    _check(ours, theirs)


@pytest.mark.parametrize("shape", SHAPES_ACT)
@pytest.mark.parametrize("width,ew,bias", [(8, 4, None), (6, 3, 3), (4, 2, None)])
def test_minifloat_denorm(shape, width, ew, bias):
    x = _rand(shape)
    ours = minifloat_denorm_quantizer(jnp.asarray(x), width, ew, bias)
    theirs = refq.minifloat.minifloat_denorm_quantizer(torch.tensor(x), width, ew, bias)
    _check(ours, theirs)


@pytest.mark.parametrize("shape", SHAPES_ACT)
@pytest.mark.parametrize("width,ew,bias", [(8, 4, None), (6, 3, 3), (4, 2, None)])
def test_minifloat_ieee(shape, width, ew, bias):
    x = _rand(shape)
    ours = minifloat_ieee_quantizer(jnp.asarray(x), width, ew, bias)
    theirs = refq.minifloat.minifloat_ieee_quantizer(torch.tensor(x), width, ew, bias)
    _check(ours, theirs)


@pytest.mark.parametrize("shape", SHAPES_ACT)
@pytest.mark.parametrize("width,bias", [(8, None), (5, 7), (3, None)])
def test_log(shape, width, bias):
    x = _rand(shape)
    ours = log_quantizer(jnp.asarray(x), width, bias)
    theirs = refq.log.log_quantizer(torch.tensor(x), width, bias)
    _check(ours, theirs)


@pytest.mark.parametrize(
    "shape,skip", [((4, 37), True), ((2, 9, 33), True), ((37, 33), False)]
)
@pytest.mark.parametrize("block", [[16], [1, 16], [2, 4]])
@pytest.mark.parametrize("width,ew", [(6, 8), (4, 8), (8, 4)])
def test_block_fp(shape, skip, block, width, ew):
    x = _rand(shape)
    ours = block_fp_quantizer(
        jnp.asarray(x), width, ew, None, block_size=block, skip_first_dim=skip
    )
    theirs = refq.block_fp.block_fp_quantizer(
        torch.tensor(x), width, ew, None, block_size=block, skip_first_dim=skip
    )
    _check(ours, theirs)


def test_block_fp_bias_1d():
    for shape in SHAPES_BIAS:
        x = _rand(shape)
        ours = block_fp_quantizer(
            jnp.asarray(x), 6, 8, None, block_size=[16], skip_first_dim=False
        )
        theirs = refq.block_fp.block_fp_quantizer(
            torch.tensor(x), 6, 8, None, block_size=[16], skip_first_dim=False
        )
        _check(ours, theirs)


def test_block_fp_zero_blocks():
    x = np.zeros((4, 37), dtype=np.float32)
    x[0, :5] = 3.7  # one non-zero block; others take the nonzero min
    ours = block_fp_quantizer(
        jnp.asarray(x), 6, 8, None, block_size=[1, 16], skip_first_dim=True
    )
    theirs = refq.block_fp.block_fp_quantizer(
        torch.tensor(x), 6, 8, None, block_size=[1, 16], skip_first_dim=True
    )
    _check(ours, theirs)
    # all-zero input stays exactly zero (zero-preserving mask)
    z = np.zeros((4, 32), dtype=np.float32)
    ours = block_fp_quantizer(
        jnp.asarray(z), 6, 8, None, block_size=[1, 16], skip_first_dim=True
    )
    np.testing.assert_array_equal(np.asarray(ours), z)


@pytest.mark.parametrize(
    "shape,skip", [((4, 37), True), ((2, 9, 33), True), ((37, 33), False)]
)
@pytest.mark.parametrize("width,ew,ebw", [(8, 4, 3), (6, 3, 2)])
def test_block_minifloat(shape, skip, width, ew, ebw):
    x = _rand(shape)
    ours = block_minifloat_quantizer(
        jnp.asarray(x), width, ew, ebw, block_size=[1, 16], skip_first_dim=skip
    )
    theirs = refq.block_minifloat.block_minifloat_quantizer(
        torch.tensor(x), width, ew, ebw, block_size=[1, 16], skip_first_dim=skip
    )
    _check(ours, theirs)


@pytest.mark.parametrize(
    "shape,skip", [((4, 37), True), ((2, 9, 33), True), ((37, 33), False)]
)
@pytest.mark.parametrize("width,ebw", [(8, 3), (5, 2)])
def test_block_log(shape, skip, width, ebw):
    x = _rand(shape)
    ours = block_log_quantizer(
        jnp.asarray(x), width, ebw, block_size=[1, 16], skip_first_dim=skip
    )
    theirs = refq.block_log.block_log_quantizer(
        torch.tensor(x), width, ebw, block_size=[1, 16], skip_first_dim=skip
    )
    _check(ours, theirs)


def test_double_application_parity():
    # BFP is not strictly idempotent (a rounded-up block max can bump the
    # shared exponent); what matters is that double application drifts
    # identically to the reference.
    x = _rand((8, 64))
    q2_ours = block_fp_quantizer(
        block_fp_quantizer(jnp.asarray(x), 6, 8, None, [1, 16], True),
        6, 8, None, [1, 16], True,
    )
    t = refq.block_fp.block_fp_quantizer(torch.tensor(x), 6, 8, None, [1, 16], True)
    q2_theirs = refq.block_fp.block_fp_quantizer(t, 6, 8, None, [1, 16], True)
    _check(q2_ours, q2_theirs)


def test_ste_gradient_is_identity():
    import jax

    x = jnp.asarray(_rand((8, 32)))

    for fn in [
        lambda v: integer_quantizer(v, 8, 4).sum(),
        lambda v: block_fp_quantizer(v, 6, 8, None, [1, 16], True).sum(),
        lambda v: minifloat_ieee_quantizer(v, 8, 4).sum(),
        lambda v: log_quantizer(v, 8, None).sum(),
    ]:
        g = jax.grad(fn)(x)
        np.testing.assert_array_equal(np.asarray(g), np.ones_like(x))


def test_minifloat_docstring_values_parity():
    # The reference docstring examples (minifloat.py:41-43) assume bias 15 but
    # the code default is 7 — the CODE is the oracle; assert we track it on
    # those exact values.
    for v, fn, rfn in [
        (-0.00146484375, minifloat_denorm_quantizer,
         refq.minifloat.minifloat_denorm_quantizer),
        (-0.00537109375, minifloat_ieee_quantizer,
         refq.minifloat.minifloat_ieee_quantizer),
    ]:
        x = np.asarray([v], dtype=np.float32)
        _check(fn(jnp.asarray(x), 8, 4, None), rfn(torch.tensor(x), 8, 4, None))
