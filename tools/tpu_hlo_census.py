"""TPU-target HLO collective census via AOT topology compilation.

VERDICT r4 missing #2: the CPU harness's HLO census showed zero async
collectives — but XLA's CPU backend never emits *-start/done pairs, so
that census could not show overlap even when the TPU compiler would
schedule it. This tool compiles the SAME TP-sharded decode and QAT steps
for a real 8-chip v5e topology (`jax.experimental.topologies` — AOT, no
devices needed) and counts the collectives the TPU compiler actually
emits, sync vs async (latency-hiding scheduler start/done pairs that
overlap with the surrounding dequant-matmul compute).

Capability matched: reference train_fsdp.py:248-257 (FSDP/DDP wrapping);
BASELINE.md ">=85% tokens/s scaling to 2 hosts".

Usage: python tools/tpu_hlo_census.py [--out FILE.json]
Prints one JSON object; exit 0 on success.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MODEL = dict(
    vocab_size=512,
    hidden_size=512,
    intermediate_size=1408,
    num_hidden_layers=4,
    num_attention_heads=4,
    max_position_embeddings=128,
)
BATCH = 32
QAT_BATCH = 16
SEQ = 128
MAX_LEN = 160
TOPOLOGY = "v5e:2x4"
MESH_SHAPE = (2, 4)  # (data, model)


def census(hlo: str) -> dict:
    colls = {}
    for op in ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all"):
        colls[op] = hlo.count(f" {op}(") + hlo.count(f" {op}.")
        colls[op + "_async"] = hlo.count(f"{op}-start")
    colls["async_total"] = sum(
        v for k, v in colls.items() if k.endswith("_async")
    )
    return colls


def main():
    out_path = None
    for i, a in enumerate(sys.argv):
        if a == "--out":
            out_path = sys.argv[i + 1]

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import optax

    from __graft_entry__ import BFP6
    from llm_mixed_q_tpu.models import get_config_cls
    from llm_mixed_q_tpu.models.hf_loader import init_llama_params
    from llm_mixed_q_tpu.models.llama.serving import (
        decode_step,
        init_kv_cache,
    )
    from llm_mixed_q_tpu.parallel.sharding import param_specs
    from llm_mixed_q_tpu.train.qat import make_qat_train_step

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=TOPOLOGY
    )
    devs = np.array(topo.devices).reshape(MESH_SHAPE)
    mesh = Mesh(devs, ("data", "model"))

    config = get_config_cls("llama")(**MODEL, quant_config=BFP6)
    # abstract params with the production TP shardings attached — AOT
    # lowering needs shardings on the avals, not real arrays
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_llama_params(config, task="lm", seed=0)
    specs = param_specs(params)
    aparams = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)
        ),
        params,
        specs,
    )

    report = {"topology": TOPOLOGY, "mesh": "data=2 x model=4",
              "model": MODEL}

    # ---- TP decode step (same program the scaling harness times) --------
    cache_shape = jax.eval_shape(
        lambda: init_kv_cache(config, BATCH, MAX_LEN)
    )
    cache_spec = P(None, None, "data", "model")
    acache = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, cache_spec)
        ),
        cache_shape,
    )
    tok = jax.ShapeDtypeStruct(
        (BATCH, 1), jnp.int32,
        sharding=NamedSharding(mesh, P("data", None)),
    )
    pos = jax.ShapeDtypeStruct(
        (BATCH,), jnp.int32, sharding=NamedSharding(mesh, P("data")),
    )
    step = jax.jit(
        lambda p, t, c, q: decode_step(p, t, c, q, config, False)
    )
    hlo = step.lower(aparams, tok, acache, pos).compile().as_text()
    report["decode_hlo_collectives"] = census(hlo)

    # ---- QAT train step -------------------------------------------------
    optimizer = optax.adamw(1e-4)
    aopt = jax.eval_shape(optimizer.init, aparams)
    batch = {
        "input_ids": jax.ShapeDtypeStruct(
            (QAT_BATCH, SEQ), jnp.int32,
            sharding=NamedSharding(mesh, P("data", None)),
        ),
        "attention_mask": jax.ShapeDtypeStruct(
            (QAT_BATCH, SEQ), jnp.int32,
            sharding=NamedSharding(mesh, P("data", None)),
        ),
        "labels": jax.ShapeDtypeStruct(
            (QAT_BATCH, SEQ), jnp.int32,
            sharding=NamedSharding(mesh, P("data", None)),
        ),
    }
    qstep = make_qat_train_step("llama", "lm", config, optimizer, mesh)
    qhlo = qstep.lower(aparams, aopt, batch).compile().as_text()
    report["qat_hlo_collectives"] = census(qhlo)

    out = json.dumps(report)
    if out_path:
        Path(out_path).write_text(out)
    print(out, flush=True)


if __name__ == "__main__":
    main()
