"""Quantized linear: the framework's hot op.

Reference: src/llm_mixed_q/models/quantize/quantized_modules/linear.py:31-110.
Three modes (linear.py:59-76):
- bypass: plain linear.
- PTQ (``is_ptq=True``): weights/bias are fake-quantized ONCE at prepare time
  (see ``prepare_ptq``); only activations are quantized per call.
- QAT: activations AND weights/bias fake-quantized every forward, grads flow
  via STE.

Functional formulation: weights live in a pytree as ``[out_features,
in_features]`` (torch layout — keeps the HF checkpoint loader transpose-free);
``y = x @ W^T + b`` via dot_general contracting the last axes, which XLA maps
straight onto the MXU. Whether weights are (re-)quantized inside the jitted
forward is the static flag ``quantize_weights``:

    apply(..., quantize_weights=True)    # QAT / one-shot eval
    prepare_ptq(params, cfg); apply(..., quantize_weights=False)   # PTQ serve

The packed-storage + fused Pallas dequant-matmul fast path is selected by
``llm_mixed_q_tpu.kernels`` when the config is a supported packed format.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

from .functions import make_entry_quantizer

# Active tap collector for statistic profiling. Models pass ``node_name`` so an
# eager (un-jitted) forward can stream (name, data_in/weight/bias/data_out)
# into a StatManager — the functional replacement for the reference's torch
# forward hooks (stat_manager.py:84-128). None in the hot path: zero overhead.
_TAP_COLLECTOR = None


@contextmanager
def capture_quant_node_taps(collector):
    """Route per-node tensors to ``collector.on_linear(name, x, w, b, out)``.

    Only valid around *eager* forwards (tracers can't be fetched); the stat
    profiling pass is a one-off offline loop so this costs nothing at serve
    time.
    """
    global _TAP_COLLECTOR
    prev = _TAP_COLLECTOR
    _TAP_COLLECTOR = collector
    try:
        yield collector
    finally:
        _TAP_COLLECTOR = prev


def quantize_weight(w, config: dict):
    """Fake-quantize a weight array with the node's weight_* keys."""
    if config.get("bypass", False):
        return w
    return make_entry_quantizer(config, "weight", skip_first_dim=False)(w)


def quantize_bias(b, config: dict):
    """Fake-quantize a bias with bias_* keys (falls back like the reference:
    parser guarantees bias keys exist when the TOML supplies them)."""
    if b is None or config.get("bypass", False):
        return b
    if f"bias_width" not in config:
        return b
    return make_entry_quantizer(config, "bias", skip_first_dim=False)(b)


def quantized_linear(
    x, w, b, config: dict, quantize_weights: bool, node_name: str | None = None
):
    """y = q_a(x) @ q_w(W)^T + q_b(b).

    x: [..., in]; w: [out, in] array OR PackedBFP; b: [out] or None.

    When ``w`` is a ``PackedBFP`` (packed int8 codes + per-block scales,
    produced by ``prepare_packed``), the fused Pallas dequant-matmul runs
    instead of the fake-quant path — activations are still quantized per the
    node's data_in config, exactly like the reference semantics.
    """
    from ..kernels.packing import PackedBFP, PackedBFPSub, PackedBFPSubT

    if isinstance(w, (PackedBFP, PackedBFPSub, PackedBFPSubT)):
        from ..kernels.dequant_matmul import actq_spec, bfp_matmul

        # data_in quantizer: folded into the Pallas kernel prologue when the
        # config is kernel-eligible (actq_spec), applied here as the
        # reference XLA expression otherwise. Folding removes ~10 small XLA
        # ops between kernel launches per linear (VERDICT r3 #1).
        xq = x
        aq = None
        if not config.get("bypass", False):
            aq = actq_spec(config)
            if aq is None:
                xq = make_entry_quantizer(
                    config, "data_in", skip_first_dim=True
                )(x)
        out = bfp_matmul(xq, w, actq=aq)
        out = out if b is None else out + b
        if _TAP_COLLECTOR is not None and node_name is not None:
            _TAP_COLLECTOR.on_linear(node_name, x, w, b, out)
        return out

    # raw operands for the stat tap: the reference's pre-forward hooks see the
    # UNquantized input/weight (quantization happens inside forward)
    x_raw, w_raw, b_raw = x, w, b
    if config.get("bypass", False):
        out = jax.lax.dot_general(
            x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ()))
        )
        out = out if b is None else out + b
    else:
        xq = make_entry_quantizer(config, "data_in", skip_first_dim=True)(x)
        if quantize_weights:
            w = quantize_weight(w, config)
            b = quantize_bias(b, config)
        out = jax.lax.dot_general(
            xq, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ()))
        )
        out = out if b is None else out + b
    if _TAP_COLLECTOR is not None and node_name is not None:
        _TAP_COLLECTOR.on_linear(node_name, x_raw, w_raw, b_raw, out)
    return out
