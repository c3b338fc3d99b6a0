"""Worker process for tests/test_multihost.py — simulates one HOST of a
2-host pod on CPU (4 virtual devices per process, 8 global).

Exercises the two DCN-crossing paths BASELINE.md cares about:
  1. one QAT train step over the hybrid (dcn, data, model) mesh — the grad
     psum's dcn leg crosses the process boundary (the reference's
     Accelerate-DDP analogue, train_ddp.py:204-207);
  2. one TP-sharded prefill + decode step with the global batch sharded
     P(("dcn","data")) across processes.

Prints "MHOK <pid> loss=<loss>" on success; the parent asserts both
processes print it and agree on the loss.
"""

import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]

    import jax

    # the axon sitecustomize pre-imports jax at interpreter start, so env
    # vars are too late — force CPU through the live config (conftest.py
    # does the same)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from llm_mixed_q_tpu.parallel.distributed import (
        global_batch,
        initialize,
        make_hybrid_mesh,
        process_allgather_scalar,
    )

    n = initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
        local_device_count=4,
    )
    assert n == 2, n
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llm_mixed_q_tpu.models.hf_loader import init_llama_params
    from llm_mixed_q_tpu.models.llama import LlamaQuantizedConfig
    from llm_mixed_q_tpu.models.llama.serving import (
        decode_step,
        init_kv_cache,
        prefill_into_cache,
    )
    from llm_mixed_q_tpu.parallel import shard_params
    from llm_mixed_q_tpu.train import make_qat_train_step

    BFP6 = {
        "default": {
            "name": "block_fp",
            "bypass": False,
            "is_ptq": True,
            "bias_block_size": [16],
            "bias_exponent_bias": 127,
            "bias_exponent_width": 8,
            "bias_width": 6,
            "data_in_block_size": [1, 16],
            "data_in_exponent_bias": 127,
            "data_in_exponent_width": 8,
            "data_in_width": 6,
            "weight_block_size": [1, 16],
            "weight_exponent_bias": 127,
            "weight_exponent_width": 8,
            "weight_width": 6,
        },
        "rotary_positional_encoding": {
            "bypass": False,
            "name": "integer",
            "data_in_width": 8,
            "data_in_frac_width": 7,
        },
    }
    config = LlamaQuantizedConfig(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        quant_config=BFP6,
    )
    mesh = make_hybrid_mesh(dcn=2, data=2, model=2)

    # ---- 1. QAT step: params replicated over dcn (DDP across hosts),
    # TP over "model", batch over ("dcn","data")
    params = init_llama_params(config, task="lm", seed=0)
    params = shard_params(params, mesh)
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    step = make_qat_train_step("llama", "lm", config, optimizer, mesh)

    rng = np.random.default_rng(7)  # SAME seed: deterministic global batch
    ids_global = rng.integers(0, 96, size=(4, 16)).astype(np.int32)
    ids_local = ids_global[pid * 2 : (pid + 1) * 2]  # this host's shard
    batch = global_batch(
        mesh,
        {
            "input_ids": ids_local,
            "attention_mask": np.ones_like(ids_local),
            "labels": ids_local,
        },
    )
    params, opt_state, loss = step(params, opt_state, batch)
    loss = float(loss)
    losses = process_allgather_scalar(loss)
    assert np.allclose(losses, losses[0]), losses
    assert np.isfinite(loss), loss

    # ---- 2. TP-sharded serve: prefill + one decode step across processes
    params2 = shard_params(init_llama_params(config, task="lm", seed=0), mesh)
    b, max_len = 4, 32
    cache = jax.device_put(
        init_kv_cache(config, b, max_len),
        NamedSharding(mesh, P(None, None, ("dcn", "data"), "model", None, None)),
    )
    ids = jax.device_put(
        jnp.asarray(ids_global), NamedSharding(mesh, P(("dcn", "data")))
    )
    mask = jnp.ones_like(ids)
    logits, cache, lengths = jax.jit(
        lambda p, i, m, c: prefill_into_cache(p, i, m, c, config, True)
    )(params2, ids, mask, cache)
    tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    logits2, cache = jax.jit(
        lambda p, t, c, pos: decode_step(p, t, c, pos, config, True)
    )(params2, tok, cache, jnp.int32(16))
    ok = float(jax.jit(lambda x: jnp.isfinite(x).all().astype(jnp.float32))(logits2))
    assert ok == 1.0

    print(f"MHOK {pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
