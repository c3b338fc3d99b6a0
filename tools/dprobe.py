"""Decode probe: end-to-end 1B-scale decode tok/s per packed-weight variant.

Answers VERDICT.md round-2 Weak #1 experimentally: which weight format wins
the full decode step (not just the isolated matmul — tools/kprobe.py), and
how much per-layer small-op overhead remains.

Usage: python tools/dprobe.py [variant,...] [--layers N]
Variants: subbyte, int8, fake.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import bench_decode, llama_cfg, make_decode_run
from __graft_entry__ import BFP6
from llm_mixed_q_tpu.models.hf_loader import init_llama_params
from llm_mixed_q_tpu.models.llama.pack import pack_llama_params_host
from llm_mixed_q_tpu.models.llama.serving import (
    init_kv_cache,
    init_packed_kv_cache,
    kv_cache_pack_spec,
)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = set(args[0].split(",")) if args else {"subbyte", "int8", "fake"}
    layers = 16
    for a in sys.argv[1:]:
        if a.startswith("--layers"):
            layers = int(a.split("=")[1])
    hidden, inter, vocab = 2048, 5632, 32000
    batch, steps, reps, max_len = 8, 32, 3, 256

    print(f"device={jax.devices()[0].device_kind} layers={layers}", flush=True)
    config = llama_cfg(hidden, inter, layers, vocab, BFP6)
    params = init_llama_params(config, task="lm", seed=0)
    spec = kv_cache_pack_spec(config)
    run = make_decode_run(config, False)

    results = {}
    for name, subbyte in (("subbyte", True), ("int8", False)):
        if name not in which:
            continue
        t0 = time.perf_counter()
        p = jax.device_put(pack_llama_params_host(params, config, subbyte=subbyte))
        jax.block_until_ready(p)
        print(f"{name}: packed+transferred in {time.perf_counter()-t0:.1f}s",
              flush=True)
        cache = init_packed_kv_cache(config, batch, max_len, spec)
        t0 = time.perf_counter()
        tok_s = bench_decode(run, p, cache, batch, steps, reps)
        results[name] = tok_s
        print(f"{name}: {tok_s:7.1f} tok/s  ({batch/tok_s*1e3:.2f} ms/step, "
              f"bench {time.perf_counter()-t0:.0f}s)", flush=True)
        del p, cache

    if "fake" in which:
        from llm_mixed_q_tpu.models import get_ptq_preparer

        p = jax.device_put(get_ptq_preparer("llama")(params, config))
        jax.block_until_ready(p)
        cache = init_kv_cache(config, batch, max_len)
        tok_s = bench_decode(run, p, cache, batch, steps, reps)
        results["fake"] = tok_s
        print(f"fake:    {tok_s:7.1f} tok/s  ({batch/tok_s*1e3:.2f} ms/step)",
              flush=True)
        del p, cache

    if "fake" in results:
        for k in ("subbyte", "int8"):
            if k in results:
                print(f"vs_baseline[{k}] = {results[k]/results['fake']:.3f}",
                      flush=True)


if __name__ == "__main__":
    main()
