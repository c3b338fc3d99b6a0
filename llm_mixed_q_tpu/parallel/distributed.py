"""Multi-host runtime: jax.distributed wiring + hybrid (dcn, data, model) mesh.

The reference trains multi-process via HF Accelerate DDP/FSDP over NCCL
(reference train_ddp.py:204-207, train_fsdp.py:248-257) — one process per
GPU, torchrun/accelerate-launch environment wiring. TPU-native equivalent:

- ``initialize()`` wraps ``jax.distributed.initialize`` (coordinator
  address + process id from args or the standard env vars); a no-op for
  single-process runs so all call sites can wire it unconditionally.
- ``make_hybrid_mesh(dcn, data, model)`` builds a 3-axis mesh whose leading
  "dcn" axis crosses process (= host/slice) boundaries ONLY: devices are
  grouped by ``process_index`` so that "data" and "model" stay inside a
  slice and their collectives ride ICI, while the "dcn" axis carries only
  data-parallel gradient psums — the slow-network-friendly layout
  (scaling-book recipe: DP across DCN, TP/FSDP within the slice).

Batch spec: ``P(("dcn", "data"))`` — the global batch shards over hosts and
over the intra-slice data axis. Param specs from ``parallel.sharding`` are
unchanged: "model"-sharded leaves are replicated across "dcn" (XLA emits a
grad psum over (dcn, data) whose dcn leg is the only DCN traffic per step).

Tested without a pod: two local CPU processes, each with 4 virtual devices
(``tests/test_multihost.py``) run one QAT step and one sharded packed-decode
step across the process boundary.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_count: int | None = None,
) -> int:
    """Initialize the multi-process runtime; returns ``process_count``.

    No-op (returns 1) when neither args nor the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a TPU
    pod metadata environment jax autodetects) request multi-process.
    ``local_device_count`` forces N virtual CPU devices per process (CPU
    simulation of a pod; must be set before any jax backend use).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    if coordinator_address is None and num_processes in (None, 1):
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        f"jax.distributed up: process {jax.process_index()}/{jax.process_count()}"
    )
    return jax.process_count()


def make_hybrid_mesh(
    dcn: int | None = None, data: int = 1, model: int = 1, devices=None
) -> Mesh:
    """(dcn, data, model) mesh with the "dcn" axis = process boundary.

    Devices are ordered by (process_index, id) so that each [data, model]
    sub-grid is entirely within one process/slice — intra-slice collectives
    never cross DCN. Single-process callers get dcn=1 and may use this
    everywhere ``make_mesh`` is used.
    """
    if devices is None:
        devices = jax.devices()
    if dcn is None:
        dcn = max(
            len({d.process_index for d in devices}), 1
        )
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    need = dcn * data * model
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    arr = np.asarray(devs[:need]).reshape(dcn, data, model)
    # every [data, model] plane must live in ONE process, else "ICI" axes
    # would secretly cross DCN
    for s in range(dcn):
        procs = {d.process_index for d in arr[s].flat}
        assert len(procs) == 1 or len({d.process_index for d in devs}) == 1, (
            f"dcn slice {s} spans processes {procs}; "
            f"pick data*model = devices-per-process"
        )
    return Mesh(arr, axis_names=("dcn", "data", "model"))


def batch_spec_hybrid() -> P:
    """Global-batch sharding over hosts x intra-slice data axis."""
    return P(("dcn", "data"))


def global_batch(mesh: Mesh, local_batch: dict) -> dict:
    """Assemble a GLOBAL batch from per-process local shards.

    Each process passes its local [local_bs, ...] arrays; the returned
    jax.Arrays are globally [local_bs * process_count, ...] sharded
    P(("dcn","data")) — the multi-host analogue of a DataLoader with a
    DistributedSampler (reference train_fsdp.py uses accelerate's).
    """
    spec = batch_spec_hybrid()
    out = {}
    for key, local in local_batch.items():
        local = np.asarray(local)
        global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
        sharding = NamedSharding(mesh, spec)
        out[key] = jax.make_array_from_process_local_data(
            sharding, local, global_shape
        )
    return out


def process_allgather_scalar(x: float) -> np.ndarray:
    """All-gather one host scalar across processes (metric aggregation —
    the analogue of the reference's cross-rank metric gather+dedup,
    train_fsdp.py:574-597). Works single-process too."""
    if jax.process_count() == 1:
        return np.asarray([x])
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.float32(x)))
