"""Benchmark: quantized-Llama decode/prefill throughput on the local chip.

Emits cumulative JSON result lines (one per completed stage, flushed); the
LAST line is the most complete: {"metric", "value", "unit", "vs_baseline",
"extra": {...}}. Stages are ordered by value-per-second so a driver timeout
still leaves real data:

  1. kernel    — fused dequant-matmul microbench at decode shapes, with an
                 HBM-roofline utilisation number (achieved GB/s on the
                 weight stream vs chip peak).
  2. decode1b  — ~1B-param Llama decode, packed (sub-byte codes + packed KV
                 cache + fused Pallas kernels) vs the reference's serving
                 model (is_ptq: weights fake-quantized once, stored/streamed
                 fp32 — reference linear.py:63-71) on identical hardware.
                 This head-to-head is `vs_baseline`.
  3. decode7b  — Llama-7B W6A6 packed decode tokens/s/chip (BASELINE.json's
                 primary metric). 7B fp32 does not fit one chip, so there is
                 no 7B fake-quant baseline; vs_baseline stays the 1B ratio.
  4. prefill1b — packed vs fake-quant full-forward throughput.

Round-1 post-mortem (VERDICT.md Weak #1) fixes baked in: `params` is a jit
ARGUMENT everywhere (nothing big is captured as a constant — enforced via
JAX_CAPTURED_CONSTANTS_WARN_BYTES), and results stream out incrementally.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_CAPTURED_CONSTANTS_WARN_BYTES", str(100 * 2**20))

import jax
import jax.numpy as jnp
from jax import lax

# persistent compile cache: repeat runs (driver + tuning) skip the ~20-40s
# first-compile cost of the big decode programs
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

START = time.perf_counter()
BUDGET = float(os.environ.get("BENCH_BUDGET_S", "1500"))

RESULT = {
    "metric": "decode_tokens_per_sec_per_chip_w6a6_bfp",
    "value": None,
    "unit": "tokens/s",
    "vs_baseline": None,
    "extra": {},
}

# (bf16 peak TFLOP/s, HBM peak GB/s) by device kind substring
_PEAKS = {
    "v5e": (197.0, 819.0),
    "v5 lite": (197.0, 819.0),
    "v5litepod": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "v6e": (918.0, 1640.0),
    "trillium": (918.0, 1640.0),
}


def chip_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return kind, peaks
    return kind, (197.0, 819.0)  # assume v5e-class if unknown


def elapsed():
    return time.perf_counter() - START


def remaining():
    return BUDGET - elapsed()


def emit(stage):
    RESULT["extra"]["stage"] = stage
    RESULT["extra"]["elapsed_s"] = round(elapsed(), 1)
    print(json.dumps(RESULT), flush=True)


def log(msg):
    print(f"[bench +{elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


# --------------------------------------------------------------- stage 1


def stage_kernel(on_tpu):
    """Fused dequant-matmul kernel microbench at the decode shape (M=8,
    N=K=4096 — a 7B q/k/v/o projection), under TRUE WEIGHT ROTATION:
    NROT distinct weights cycle per iteration so nothing stays
    VMEM/cache-resident and every variant is measured streaming-vs-
    streaming (VERDICT r2 weak #3 — the round-2 fp32/bf16 "baselines"
    reused ONE weight and reported >chip-peak GB/s). Iteration count is a
    runtime fori_loop bound: one compile per variant; slope timing between
    two counts cancels the tunnel RTT."""
    from llm_mixed_q_tpu.kernels.dequant_matmul import bfp_matmul
    from llm_mixed_q_tpu.kernels.packing import (
        pack_block_fp,
        pack_block_fp_subbyte,
        packed_nbytes,
    )

    # CPU path (interpret-mode Pallas) is a smoke test only: tiny shapes
    n = k = 4096 if on_tpu else 256
    m = 8
    nrot = 4 if on_tpu else 2
    # hi-lo slope needs enough iterations that the per-iter time dwarfs
    # tunnel RTT jitter: 12 iters gave a NEGATIVE fp32 slope (~3ms total
    # work vs ~ms RTT noise); 40x4 matmuls puts every variant >10ms
    iters = 40 if on_tpu else 2
    rng = np.random.default_rng(0)
    ws = [
        jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.float32)
        for _ in range(nrot)
    ]
    x0 = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)

    def probe(weights, call):
        @jax.jit
        def run(ws_, x, it):
            def body(_, x):
                for w_ in ws_:
                    # tanh feedback defeats dedup; [:, :k] re-shapes N->K
                    x = jnp.tanh(call(x, w_)[:, :k])
                return x

            return lax.fori_loop(0, it, body, x).sum()

        float(run(weights, x0, 1))  # compile + warmup

        def t_at(it):
            t0 = time.perf_counter()
            float(run(weights, x0, it))
            return time.perf_counter() - t0

        t_at(2)
        lo, hi = max(iters // 10, 1), iters
        return (min(t_at(hi), t_at(hi)) - min(t_at(lo), t_at(lo))) / (
            (hi - lo) * nrot
        )

    kind, (tflops_peak, gbs_peak) = chip_peaks()
    out = {
        "device_kind": kind,
        "hbm_peak_gbs": gbs_peak,
        "shape": [m, n, k],
        "weight_rotation": nrot,
    }

    def record(name, t, nbytes):
        out[f"{name}_us"] = round(t * 1e6, 2)
        out[f"{name}_weight_gbs"] = round(nbytes / t / 1e9, 1)
        out[f"{name}_hbm_util"] = round(nbytes / t / 1e9 / gbs_peak, 3)

    subs = [pack_block_fp_subbyte(w, 6, 8, 127, [1, 16]) for w in ws]
    t_sub = probe(subs, lambda x, p: bfp_matmul(x, p, use_pallas=on_tpu,
                                                interpret=not on_tpu))
    record("subbyte_w6", t_sub, packed_nbytes(subs[0]))
    del subs

    t_8 = None
    if on_tpu:
        p8s = [pack_block_fp(w, 6, 8, 127, [1, 16]) for w in ws]
        t_8 = probe(p8s, lambda x, p: bfp_matmul(x, p, use_pallas=True))
        record("int8", t_8, packed_nbytes(p8s[0]))
        del p8s

        # NOTE: no fp32 "stream" baseline. Rounds 2-3 reported one, and it
        # measured >3x HBM peak both times: XLA's default TPU matmul
        # converts f32 operands to bf16, and the conversion of a rotated
        # weight is loop-invariant — hoisted out of the timing loop, so the
        # loop streamed cached bf16 copies, not the fp32 arrays. Rather than
        # fight the compiler into a non-physical configuration, the dense
        # baseline here is the bf16 stream (what XLA actually does with
        # dense weights); the fp32 reference-model comparison lives at the
        # MODEL level (decode_1b packed vs fake-quant is_ptq).
        wbs = [w.astype(jnp.bfloat16) for w in ws]

        def bf16mm(x, w):
            return jax.lax.dot_general(
                x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        t_bf16 = probe(wbs, bf16mm)
        record("bf16", t_bf16, 2 * n * k)
        del wbs

        out["kernel_speedup_vs_bf16_stream"] = round(t_bf16 / t_8, 2)

    RESULT["extra"]["kernel"] = out
    RESULT["extra"]["hbm_bw_util"] = out.get(
        "int8_hbm_util", out["subbyte_w6_hbm_util"]
    )
    log(f"kernel stage: {out}")


# ----------------------------------------------------------- long context


def stage_longctx(on_tpu):
    """Decode tokens/s at a 2k-token cache on an attention-heavy model
    (4 layers — the weight stream is small, so the KV path dominates):
    fused Pallas packed-KV attention kernel vs the XLA dequant+einsum path
    vs the f32 fake-quant cache. ONE compile per variant (iteration count
    is a runtime fori_loop bound)."""
    from __graft_entry__ import BFP6
    from llm_mixed_q_tpu.models.hf_loader import init_llama_params
    from llm_mixed_q_tpu.models.llama.serving import (
        decode_step,
        init_kv_cache,
        init_packed_kv_cache,
        kv_cache_pack_spec,
    )

    if on_tpu:
        hidden, inter, layers, vocab = 2048, 5632, 4, 2048
        batch, max_len = 8, 2048
        lo, hi = 2, 18
    else:
        hidden, inter, layers, vocab = 256, 704, 2, 512
        batch, max_len = 2, 64
        lo, hi = 1, 3

    config = llama_cfg(hidden, inter, layers, vocab, BFP6)
    params = jax.device_put(
        pack_host(init_llama_params(config, task="lm", seed=0), config)
    )
    jax.block_until_ready(params)
    spec = kv_cache_pack_spec(config)
    pos = jnp.full((batch,), max_len - hi - 2, jnp.int32)
    out = {}

    for name, make_cache, attn_kernel in (
        ("pallas_kernel", lambda: init_packed_kv_cache(config, batch, max_len,
                                                       spec), True),
        ("xla_packed", lambda: init_packed_kv_cache(config, batch, max_len,
                                                    spec), False),
        ("fake_quant_f32", lambda: init_kv_cache(config, batch, max_len),
         None),
    ):
        if remaining() < 150 and out:
            log(f"longctx: skipping {name} (budget)")
            break
        try:
            @jax.jit
            def chain(p, t, c, q, iters):
                def body(_, carry):
                    t, c = carry
                    logits, c = decode_step(p, t, c, q, config, False,
                                            attn_kernel)
                    return (jnp.argmax(logits, -1)[:, None].astype(jnp.int32),
                            c)
                t, c = jax.lax.fori_loop(0, iters, body, (t, c))
                return t.sum()

            cache = make_cache()
            tok = jnp.ones((batch, 1), jnp.int32)
            float(chain(params, tok, cache, pos, 1))

            def t_at(n):
                t0 = time.perf_counter()
                float(chain(params, tok, cache, pos, n))
                return time.perf_counter() - t0

            t_at(lo)
            per = (min(t_at(hi), t_at(hi)) - min(t_at(lo), t_at(lo))) / (
                hi - lo
            )
            out[name] = round(batch / per, 1)
            log(f"longctx {name}: {batch/per:.1f} tok/s ({per*1e3:.2f} ms/step)")
        except Exception as e:
            out[f"{name}_error"] = repr(e)[:160]
            log(f"longctx {name} failed: {e!r}")
    if "pallas_kernel" in out and "fake_quant_f32" in out:
        out["kernel_speedup_vs_f32_cache"] = round(
            out["pallas_kernel"] / out["fake_quant_f32"], 2
        )
    RESULT["extra"]["longctx_2k_tok_s"] = out


# --------------------------------------------------------------- decode


def make_decode_run(config, quantize_weights):
    from llm_mixed_q_tpu.models.llama.serving import decode_step

    def run(params, tok0, cache, steps):
        # steps is a runtime fori_loop bound — ONE compile regardless of
        # chain length; the loop index is the (scalar, uniform) position,
        # which takes the cheap dynamic_update_slice cache append
        def body(pos, carry):
            tok, c = carry
            logits, c = decode_step(
                params, tok, c, pos, config, quantize_weights
            )
            return (jnp.argmax(logits, -1)[:, None].astype(jnp.int32), c)

        tok, cache = lax.fori_loop(0, steps, body, (tok0, cache))
        return tok.sum(), cache

    # the cache is DONATED and returned: without donation XLA keeps input
    # and loop-carry copies live simultaneously — 2x cache HBM, which is
    # what OOM'd the 7B batch-64 sweep (cache alone is ~5.4GB there)
    return jax.jit(run, donate_argnums=(2,))


def bench_decode(run, params, cache, batch, steps, reps):
    """tokens/s via the slope between two chain lengths (RTT + fixed
    dispatch cancel out). params/cache are jit ARGUMENTS (nothing
    captured); `reps` timed pairs, best-of taken. The donated cache is
    threaded through the calls (contents are irrelevant to timing)."""
    tok0 = jnp.ones((batch, 1), dtype=jnp.int32)
    out, cache = run(params, tok0, cache, 1)  # compile + warmup
    float(out)

    def t_at(n):
        nonlocal cache
        t0 = time.perf_counter()
        out, cache = run(params, tok0, cache, n)
        float(out)
        return time.perf_counter() - t0

    t_at(max(2, steps // 8))
    lo = max(2, steps // 8)
    t_lo = min(t_at(lo) for _ in range(reps))
    t_hi = min(t_at(steps) for _ in range(reps))
    return batch * (steps - lo) / (t_hi - t_lo)


def llama_cfg(hidden, inter, layers, vocab, quant):
    from llm_mixed_q_tpu.models.llama import LlamaQuantizedConfig

    return LlamaQuantizedConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=inter,
        num_hidden_layers=layers,
        num_attention_heads=hidden // 128,
        max_position_embeddings=2048,
        quant_config=quant,
    )


def pack_host(params, config, subbyte=False):
    """Pack on the HOST (native C++ engine; JAX-CPU fallback) so only the
    packed buffers (~1/5 the bytes) cross the device tunnel. bf16_embed:
    the serving configuration (bf16 embedding/logits tables — halves the
    lm_head stream; deviation quantified by quality.py)."""
    from llm_mixed_q_tpu.models.llama.pack import pack_llama_params_host

    return pack_llama_params_host(params, config, subbyte=subbyte,
                                  bf16_embed=True)


def stage_decode_1b(on_tpu):
    from __graft_entry__ import BFP6
    from llm_mixed_q_tpu.models import get_ptq_preparer
    from llm_mixed_q_tpu.models.hf_loader import init_llama_params
    from llm_mixed_q_tpu.models.llama.serving import (
        init_kv_cache,
        init_packed_kv_cache,
        kv_cache_pack_spec,
    )

    if on_tpu:
        hidden, inter, layers, vocab = 2048, 5632, 16, 32000
        batch, steps, reps, max_len = 8, 32, 4, 256
    else:
        hidden, inter, layers, vocab = 256, 704, 2, 1024
        batch, steps, reps, max_len = 2, 4, 1, 32

    config = llama_cfg(hidden, inter, layers, vocab, BFP6)
    params = init_llama_params(config, task="lm", seed=0)

    # packed path: sub-byte codes + scales in HBM, packed KV cache
    packed_params = jax.device_put(pack_host(params, config))
    jax.block_until_ready(packed_params)
    spec = kv_cache_pack_spec(config)
    pcache = init_packed_kv_cache(config, batch, max_len, spec)
    run_p = make_decode_run(config, False)
    dec_packed = bench_decode(run_p, packed_params, pcache, batch, steps, reps)
    RESULT["extra"]["decode_1b_tok_s_packed"] = round(dec_packed, 1)
    RESULT["value"] = round(dec_packed, 1)
    RESULT["metric"] = "decode_tokens_per_sec_per_chip_w6a6_bfp_1b"
    emit("decode1b_packed")
    log(f"1B packed decode: {dec_packed:.1f} tok/s")

    # reference serving model: is_ptq weights (fp32 stream), f32 fake-quant KV
    ptq_params = jax.device_put(get_ptq_preparer("llama")(params, config))
    jax.block_until_ready(ptq_params)
    fcache = init_kv_cache(config, batch, max_len)
    run_f = make_decode_run(config, False)
    dec_fake = bench_decode(run_f, ptq_params, fcache, batch, steps, reps)
    del ptq_params, fcache
    RESULT["extra"]["decode_1b_tok_s_fake_quant"] = round(dec_fake, 1)
    RESULT["vs_baseline"] = round(dec_packed / dec_fake, 3)
    emit("decode1b")
    log(f"1B fake decode: {dec_fake:.1f} tok/s; speedup {dec_packed/dec_fake:.2f}x")
    # free ALL 1B device buffers before the 7B stage (packed 7B is ~5.6GB
    # of a 16GB chip); prefill re-packs from the host params later
    del packed_params, pcache
    return config, params


def stage_decode_7b(on_tpu):
    from __graft_entry__ import BFP6
    from llm_mixed_q_tpu.models.hf_loader import init_llama_params
    from llm_mixed_q_tpu.models.llama.serving import (
        init_packed_kv_cache,
        kv_cache_pack_spec,
    )

    if on_tpu:
        hidden, inter, layers, vocab = 4096, 11008, 32, 32000
        batch, steps, reps, max_len = 8, 32, 3, 256
    else:
        hidden, inter, layers, vocab = 256, 704, 3, 1024
        batch, steps, reps, max_len = 2, 4, 1, 32

    config = llama_cfg(hidden, inter, layers, vocab, BFP6)
    log("init 7B params on host…")
    params = init_llama_params(config, task="lm", seed=0)
    log("packing 7B on host (sub-byte)…")
    # FLAGSHIP format is the bit-packed sub-byte store (BASELINE north star
    # "real packed sub-8-bit weights in HBM"): 6.4 code bits + 0.5 scale
    # bits/elem vs int8-codes' 10 — r4's restructured kernel + uint8
    # exponent scales made it faster than int8 as well (tools/ktune7.py)
    packed = pack_host(params, config, subbyte=True)
    del params
    log("transferring packed 7B to device…")
    packed = jax.device_put(packed)
    jax.block_until_ready(packed)

    spec = kv_cache_pack_spec(config)
    run = make_decode_run(config, False)
    log("compiling 7B decode…")
    # batch sweep: the step is weight-stream-bound, so tokens/s grows with
    # batch until compute/attention catches up; headline = best config
    # (serving engines pick their batch). vs_baseline stays the 1B-shape
    # packed/fake ratio (a fake-quant 7B needs 27GB of fp32 — doesn't fit).
    tok_s = 0.0
    best_batch = batch
    best_kv_bytes = 0
    for b in ((batch, 2 * batch, 4 * batch, 8 * batch) if on_tpu
              else (batch,)):
        if b != batch and remaining() < 300:
            break
        try:
            cache = init_packed_kv_cache(config, b, max_len, spec)
            # the attention kernel streams the WHOLE cache (codes + scales,
            # all positions — the block specs cover the full lane axis)
            # once per layer per step: per-step KV read = total cache bytes
            kv_bytes = sum(
                leaf.nbytes for leaf in jax.tree.leaves(cache)
            )
            t = bench_decode(run, packed, cache, b, steps, reps)
        except Exception as e:  # e.g. HBM OOM at the largest batch
            log(f"7B decode @batch {b} failed: {type(e).__name__}")
            if tok_s == 0.0:
                raise  # first config failing = the stage failed (ADVICE r4)
            break
        RESULT["extra"][f"decode_7b_tok_s_b{b}"] = round(t, 1)
        log(f"7B packed decode @batch {b}: {t:.1f} tok/s")
        if t > tok_s:
            tok_s, best_batch, best_kv_bytes = t, b, kv_bytes
        del cache
    batch = best_batch
    cache = None
    if tok_s <= 0.0:
        raise RuntimeError("7B decode stage produced no measurement")

    # HBM roofline for this decode: bytes streamed per step = packed linear
    # weights + bf16 lm_head + the FULL packed KV cache (read once per layer
    # per step by the attention kernel) + the per-step cache append write.
    # VERDICT r4 #2: round 4 zeroed the KV term — at batch 32 the cache is
    # ~2.7GB/step, ~40% of the weight stream; now taken from the actual
    # cache leaves.
    from llm_mixed_q_tpu.kernels.packing import (
        PackedBFP,
        PackedBFPSub,
        PackedBFPSubT,
        packed_nbytes,
    )

    wbytes = 0
    for leaf in jax.tree.leaves(
        packed, is_leaf=lambda x: isinstance(x, (PackedBFP, PackedBFPSub, PackedBFPSubT))
    ):
        if isinstance(leaf, (PackedBFP, PackedBFPSub, PackedBFPSubT)):
            wbytes += packed_nbytes(leaf)
    lm_head = 2 * vocab * hidden  # bf16 logits matmul stream (bf16_embed)
    # append write: one position of K+V codes+scales per layer per step
    kv_write = best_kv_bytes // max_len
    step_bytes = wbytes + lm_head + best_kv_bytes + kv_write
    RESULT["extra"]["decode_7b_kv_read_bytes"] = best_kv_bytes
    kind, (_, gbs_peak) = chip_peaks()
    t_step = batch / tok_s
    ach = step_bytes / t_step / 1e9
    RESULT["metric"] = "decode_tokens_per_sec_per_chip_llama7b_w6a6_bfp"
    RESULT["value"] = round(tok_s, 1)
    RESULT["extra"]["decode_7b_tok_s_packed"] = round(tok_s, 1)
    RESULT["extra"]["decode_7b_step_weight_bytes"] = step_bytes
    RESULT["extra"]["decode_7b_hbm_gbs"] = round(ach, 1)
    RESULT["extra"]["decode_7b_hbm_util"] = round(ach / gbs_peak, 3)
    RESULT["extra"]["decode_7b_tok_s_roofline"] = round(
        batch / (step_bytes / (gbs_peak * 1e9)), 1
    )
    emit("decode7b")
    log(f"7B packed decode: {tok_s:.1f} tok/s ({ach:.0f} GB/s, "
        f"{ach/gbs_peak:.0%} of HBM peak)")

    # ---- 7B admission hygiene (VERDICT r3 weak #8): slot admission cost
    # and rolling throughput at the FLAGSHIP shape, not just the 2k-hidden
    # cbatch stage. The bucket ladder is pre-compiled by warmup(); the
    # admission number prices prefill + slot write + device state scatter.
    if on_tpu and remaining() > 240:
        from llm_mixed_q_tpu.models.llama.serving import ContinuousBatcher

        # slots capped at 32: the batched-admission prefill materializes
        # f32 past_kvs for every slot row (~8.6GB at 64 slots x 7B) before
        # encoding — 64-slot serving needs the chunked prefill, not worth
        # it for this admission-latency metric
        nslots = min(batch, 32)
        srv = ContinuousBatcher(
            packed, config, num_slots=nslots, max_len=max_len,
            quantize_weights=False, max_new_tokens=16, prompt_bucket=32,
        )
        srv.warmup(buckets=[32])
        rng = np.random.default_rng(0)
        prompts = [rng.integers(2, vocab - 2, size=24) for _ in range(nslots)]
        t0 = time.perf_counter()
        for p in prompts:
            srv.submit(p)
        srv._admit()
        t_admit = (time.perf_counter() - t0) / len(prompts)
        t0 = time.perf_counter()
        done = srv.run()
        t_roll = time.perf_counter() - t0
        n_out = sum(len(v) for v in done.values())
        RESULT["extra"]["cbatch7b_admit_ms"] = round(t_admit * 1e3, 2)
        RESULT["extra"]["cbatch7b_tok_s_rolling"] = round(n_out / t_roll, 1)
        emit("decode7b_cbatch")
        log(f"7B admission {t_admit*1e3:.1f} ms/req, rolling "
            f"{n_out/t_roll:.1f} tok/s")


def stage_prefill_1b(config, params, on_tpu):
    from llm_mixed_q_tpu.models.llama import llama_for_causal_lm

    packed_params = jax.device_put(pack_host(params, config))
    jax.block_until_ready(packed_params)
    batch, seq = (4, 1024) if on_tpu else (2, 128)
    iters = 8 if on_tpu else 1
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(4):
        ids = jnp.asarray(
            rng.integers(0, config.vocab_size, size=(batch, seq)), jnp.int32
        )
        batches.append((jax.device_put(ids), jnp.ones_like(ids)))
    jax.block_until_ready(batches)

    def fwd(p, i, m, qw):
        return llama_for_causal_lm(
            p, i, m, config=config, quantize_weights=qw
        )["logits"].sum()

    def tim(fn, p):
        for i in range(2):
            ids, mask = batches[i % 4]
            float(fn(p, ids, mask))
        t0 = time.perf_counter()
        for i in range(iters):
            ids, mask = batches[i % 4]
            float(fn(p, ids, mask))
        return (time.perf_counter() - t0) / iters

    packed = jax.jit(lambda p, i, m: fwd(p, i, m, False))
    t_packed = tim(packed, packed_params)
    RESULT["extra"]["prefill_1b_tok_s_packed"] = round(batch * seq / t_packed, 1)
    emit("prefill1b_packed")

    # reference execution model for a one-shot eval: qdq weights+acts EVERY
    # forward (QAT/eval mode, reference linear.py:72-76)
    dparams = jax.device_put(params)
    jax.block_until_ready(dparams)
    fake = jax.jit(lambda p, i, m: fwd(p, i, m, True))
    t_fake = tim(fake, dparams)
    RESULT["extra"]["prefill_1b_tok_s_fake_quant"] = round(batch * seq / t_fake, 1)
    RESULT["extra"]["prefill_speedup"] = round(t_fake / t_packed, 3)
    emit("prefill1b")
    log(f"prefill packed {batch*seq/t_packed:.0f} vs fake {batch*seq/t_fake:.0f} tok/s")


def stage_cbatch(on_tpu):
    """Continuous-batching throughput under rolling admission (packed KV
    cache + fused attention kernel) vs offline batched generation of the
    same requests (VERDICT r2 weak #4: the batcher's throughput was never
    benchmarked). The batcher inherently syncs per step (admission is a
    host decision), so this also prices the tunnel RTT the on-device
    offline loop avoids."""
    from __graft_entry__ import BFP6
    from llm_mixed_q_tpu.models.hf_loader import init_llama_params
    from llm_mixed_q_tpu.models.llama.serving import (
        ContinuousBatcher,
        generate,
    )

    if on_tpu:
        hidden, inter, layers, vocab = 2048, 5632, 8, 32000
        num_slots, max_len, new_toks, nreq = 8, 256, 32, 16
    else:
        hidden, inter, layers, vocab = 256, 704, 2, 512
        num_slots, max_len, new_toks, nreq = 2, 48, 4, 4

    config = llama_cfg(hidden, inter, layers, vocab, BFP6)
    params = jax.device_put(
        pack_host(init_llama_params(config, task="lm", seed=0), config)
    )
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    lens = rng.integers(8, 32, size=nreq)
    prompts = [rng.integers(2, vocab - 2, size=int(L)) for L in lens]

    srv = ContinuousBatcher(
        params, config, num_slots=num_slots, max_len=max_len,
        quantize_weights=False, max_new_tokens=new_toks, prompt_bucket=32,
    )
    for p in prompts[:2]:  # warmup: compiles prefill/step/write_slot
        srv.submit(p)
    srv.run()
    rids = [srv.submit(p) for p in prompts]
    t0 = time.perf_counter()
    done = srv.run()
    t_cb = time.perf_counter() - t0
    n_out = sum(len(done[r]) for r in rids)
    cb_tok_s = n_out / t_cb

    # offline comparison: same requests, groups of num_slots, ragged
    # generate (prefill + on-device decode loop)
    pad = max(len(p) for p in prompts)
    t_off = 0.0
    n_off = 0
    for lo in range(0, nreq, num_slots):
        grp = prompts[lo : lo + num_slots]
        ids = np.zeros((len(grp), pad), np.int32)
        mask = np.zeros((len(grp), pad), np.int32)
        for i, p in enumerate(grp):
            ids[i, : len(p)] = p
            mask[i, : len(p)] = 1
        if lo == 0:  # warmup/compile
            generate(params, config, ids, mask, max_new_tokens=new_toks,
                     max_len=max_len, quantize_weights=False)
        t0 = time.perf_counter()
        out = generate(params, config, ids, mask, max_new_tokens=new_toks,
                       max_len=max_len, quantize_weights=False)
        t_off += time.perf_counter() - t0
        n_off += out.size
    off_tok_s = n_off / t_off

    RESULT["extra"]["cbatch_tok_s_rolling"] = round(cb_tok_s, 1)
    RESULT["extra"]["cbatch_tok_s_offline"] = round(off_tok_s, 1)
    RESULT["extra"]["cbatch_rolling_vs_offline"] = round(
        cb_tok_s / off_tok_s, 3
    )
    log(f"cbatch rolling {cb_tok_s:.1f} vs offline {off_tok_s:.1f} tok/s")


def main():
    on_tpu = jax.default_backend() != "cpu"
    kind, (tflops, gbs) = chip_peaks()
    RESULT["extra"]["device"] = kind
    log(f"backend={jax.default_backend()} device={kind} budget={BUDGET}s")

    import gc

    def stage(name, fn, min_s):
        """Run a stage inside a budget guard + exception firewall."""
        if remaining() < min_s and on_tpu:
            log(f"skipping {name} stage (budget: {remaining():.0f}s left)")
            RESULT["extra"][f"{name}_skipped"] = True
            return
        try:
            fn()
            emit(name)
        except Exception as e:
            log(f"{name} stage failed: {e!r}")
            RESULT["extra"][f"{name}_error"] = repr(e)[:200]
            emit(f"{name}_failed")
        gc.collect()

    # Order = value per second (VERDICT r2 weak #2: the Llama-7B tokens/s
    # primary metric was sacrificed to secondary stages two rounds running —
    # it now runs IMMEDIATELY after the 1B head-to-head).
    config, params = stage_decode_1b(on_tpu)
    gc.collect()

    stage("decode7b", lambda: stage_decode_7b(on_tpu), 90)
    # longctx before the remaining stages: round 4 ran it LAST and lost the
    # long-context numbers to the budget (VERDICT r4 #5)
    stage("longctx", lambda: stage_longctx(on_tpu), 150)
    stage("kernel", lambda: stage_kernel(on_tpu), 150)
    stage("cbatch", lambda: stage_cbatch(on_tpu), 150)
    stage("prefill1b", lambda: stage_prefill_1b(config, params, on_tpu), 150)
    del params
    gc.collect()

    emit("done")


if __name__ == "__main__":
    main()
