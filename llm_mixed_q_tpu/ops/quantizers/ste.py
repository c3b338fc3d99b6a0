"""Straight-through estimator wrapper.

Every fake-quantizer in the reference is a ``torch.autograd.Function`` whose
backward is identity on the input (e.g. reference block_fp.py:119-124). Here
that is a ``jax.custom_vjp`` with identity cotangent — which is what makes QAT
work: the forward sees quantized values, the gradient flows as if the
quantizer were the identity.
"""

from __future__ import annotations

import functools

import jax


def ste(fn):
    """Wrap ``fn(x, **static_kwargs)`` with an identity-gradient custom VJP.

    ``static_kwargs`` are treated as non-differentiable static configuration
    (closed over via ``functools.partial`` at call time).
    """

    @functools.wraps(fn)
    def wrapper(x, *args, **kwargs):
        @jax.custom_vjp
        def qdq(v):
            return fn(v, *args, **kwargs)

        def fwd(v):
            return qdq(v), None

        def bwd(_, g):
            return (g,)

        qdq.defvjp(fwd, bwd)
        return qdq(x)

    return wrapper
