"""Jitted forward factories.

One XLA compilation of the whole quantized forward instead of hundreds of
per-op eager compiles — this is both the serving path and the reason the test
suite is fast. The config and quantization mode are closed over (static);
params/batch are traced arguments.
"""

from __future__ import annotations

from functools import partial

import jax


def make_forward(
    arch: str,
    task: str,
    config,
    quantize_weights: bool = True,
    with_labels: bool = False,
    jit: bool = True,
):
    """Returns ``fwd(params, input_ids, attention_mask=None[, labels]) -> out``.

    ``out`` is the model's dict (logits/loss/…); KV-cache outputs are dropped
    under jit to keep the signature uniform (use ``make_decode_step`` for
    incremental decoding).
    """
    from . import get_model_fn

    model_fn = get_model_fn(arch, task)

    if with_labels:

        def fwd(params, input_ids, attention_mask, labels):
            out = model_fn(
                params,
                input_ids,
                attention_mask,
                labels=labels,
                config=config,
                quantize_weights=quantize_weights,
            )
            return {k: v for k, v in out.items() if k != "past_kvs"}

    else:

        def fwd(params, input_ids, attention_mask=None):
            out = model_fn(
                params,
                input_ids,
                attention_mask,
                config=config,
                quantize_weights=quantize_weights,
            )
            return {k: v for k, v in out.items() if k != "past_kvs"}

    return jax.jit(fwd) if jit else fwd


def make_prefill_and_decode(arch: str, task: str, config, quantize_weights=True):
    """(prefill, decode_step) pair for incremental generation.

    prefill(params, input_ids, attention_mask) -> (logits, kvs)
    decode_step(params, token, attention_mask, kvs) -> (logits, kvs)
    """
    from . import get_model_fn

    model_fn = get_model_fn(arch, task)

    @jax.jit
    def prefill(params, input_ids, attention_mask):
        out = model_fn(
            params,
            input_ids,
            attention_mask,
            config=config,
            quantize_weights=quantize_weights,
        )
        return out["logits"], out["past_kvs"]

    @jax.jit
    def decode_step(params, token, attention_mask, kvs):
        out = model_fn(
            params,
            token,
            attention_mask,
            config=config,
            quantize_weights=quantize_weights,
            past_kvs=kvs,
        )
        return out["logits"], out["past_kvs"]

    return prefill, decode_step
