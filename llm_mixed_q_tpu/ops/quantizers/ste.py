"""Straight-through estimator wrapper.

Every fake-quantizer in the reference is a ``torch.autograd.Function`` whose
backward is identity on the input (e.g. reference block_fp.py:119-124). Here
that is a ``jax.custom_vjp`` with identity cotangent — which is what makes QAT
work: the forward sees quantized values, the gradient flows as if the
quantizer were the identity.

The wrapped callable is CACHED per static-arg signature: repeated calls with
the same config reuse one ``custom_vjp`` object, so JAX's trace/compilation
caches hit both under ``jit`` and in eager mode (a fresh wrapper per call
would re-trace every time — orders of magnitude slower).
"""

from __future__ import annotations

import functools

import jax


def _hashable(v):
    if isinstance(v, list):
        return ("__list__", tuple(_hashable(x) for x in v))
    if isinstance(v, tuple):
        return ("__tuple__", tuple(_hashable(x) for x in v))
    if isinstance(v, dict):
        return ("__dict__", tuple(sorted((k, _hashable(x)) for k, x in v.items())))
    hash(v)
    return v


def ste(fn):
    """Wrap ``fn(x, *static_args, **static_kwargs)`` with an identity-gradient
    custom VJP, one cached instance per static signature."""

    cache: dict = {}

    def get_qdq(args, kwargs):
        key = (tuple(_hashable(a) for a in args),
               tuple(sorted((k, _hashable(v)) for k, v in kwargs.items())))
        qdq = cache.get(key)
        if qdq is None:

            @jax.custom_vjp
            def qdq(v):
                return fn(v, *args, **kwargs)

            def fwd(v):
                return qdq(v), None

            def bwd(_, g):
                return (g,)

            qdq.defvjp(fwd, bwd)
            cache[key] = qdq
        return qdq

    @functools.wraps(fn)
    def wrapper(x, *args, **kwargs):
        try:
            qdq = get_qdq(args, kwargs)
        except TypeError:  # unhashable static arg — fall back to uncached
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
