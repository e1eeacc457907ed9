"""Device mesh and sharding helpers.

The reference's only parallelism is single-process DataParallel over GPUs
with synchronized BatchNorm callbacks (trainers/pix2pix_trainer.py:23-26;
SURVEY §2.10). TPU-native replacement: a 1-D `data` mesh axis; the batch is
sharded over it, parameters are replicated, and XLA inserts the gradient
all-reduce and the (global) batch-stat reductions automatically when the
train step is jitted with these shardings. A `model` axis is reserved so
tensor-parallel sharding can be layered in without API changes.

Multi-host: `maybe_init_distributed(opt)` (called by train.py before any
device query) brings up jax.distributed; create_mesh() then spans all
processes over DCN and the same jitted step runs unchanged — each host feeds
its `process_shard` slice of the global batch and
`make_global_batch`/`shard_batch` assemble the sharded global arrays from the
per-host pieces. The reference's analogue is single-process DataParallel
(README.md:83 trains batch 32 over 8 GPUs on one host); this scales the same
recipe across hosts with XLA DCN collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(opt) -> bool:
    """Bring up the jax.distributed runtime when --distributed is set (or the
    JAX_COORDINATOR_ADDRESS env is present). Must run before jax.devices().
    Returns True when running multi-process."""
    import os
    want = bool(getattr(opt, "distributed", False)) or bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not want:
        return jax.process_count() > 1
    kw = {}
    coord = getattr(opt, "coordinator_address", "") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS", "")
    if coord:
        kw["coordinator_address"] = coord
    if getattr(opt, "num_processes", -1) >= 0:
        kw["num_processes"] = opt.num_processes
    if getattr(opt, "process_id", -1) >= 0:
        kw["process_id"] = opt.process_id
    # straggler tolerance: hosts can take minutes to reach initialize()
    # (container start, imports, contended CPUs) and to drain final
    # saves before shutdown — the jax default 300s deadlines kill the
    # whole job when one host lags either barrier
    t = int(getattr(opt, "dist_timeout_s", 900) or 900)
    kw["initialization_timeout"] = t
    kw["shutdown_timeout_seconds"] = t
    # the coordination client FATALLY aborts (C++ LOG(FATAL), uncatchable)
    # ~50s after RegisterTask if the coordinator port is not even bound
    # yet — initialization_timeout does not cover connection-refused. So
    # non-coordinator processes first wait for the coordinator to listen.
    if coord and kw.get("process_id", 0) != 0:
        import socket
        import time as _time
        host, _, port = coord.rpartition(":")
        deadline = _time.time() + t
        while _time.time() < deadline:
            try:
                socket.create_connection((host, int(port)), timeout=5).close()
                break
            except OSError:
                _time.sleep(3)
        else:
            raise TimeoutError(
                f"coordinator {coord} not reachable within {t}s")
    jax.distributed.initialize(**kw)  # no-arg form auto-detects on TPU pods
    return jax.process_count() > 1


def process_shard(global_batch_size: int,
                  process_index: int | None = None,
                  process_count: int | None = None) -> tuple[int, int]:
    """(start, size) of this host's slice of every global batch.

    The global batch is split contiguously and equally across processes —
    required to line up with NamedSharding(P("data")) over a mesh whose
    device order is jax.devices() (process-major). batchSize must divide."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch_size % pc != 0:
        raise ValueError(
            f"global batchSize {global_batch_size} must be divisible by the "
            f"process count {pc} (each host feeds an equal contiguous shard)")
    size = global_batch_size // pc
    return pi * size, size


def create_mesh(data: int = 0, model: int = 1,
                devices=None) -> Mesh:
    """data=0 -> use all visible devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if data == 0:
        data = len(devices) // model
    devices = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devices, axis_names=("data", "model"))


_GLOBAL_MESH: Mesh | None = None


def set_global_mesh(mesh: Mesh | None) -> None:
    """Register the process-wide mesh (set by train.py/test.py/serve after
    create_mesh). Model code that needs a mesh at trace time — the
    spatial-parallel correlation's shard_map (ops/corr_sp.attend_sp) —
    resolves it here, so the Options dataclass stays hashable/serializable
    (a Mesh can't live in a frozen config)."""
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def global_mesh(model: int = 1) -> Mesh:
    """The registered mesh, or a freshly built all-devices mesh with the
    requested model-axis size (callers outside the CLIs, e.g. tests that
    jit a bare step with mesh_model>1 and never called set_global_mesh)."""
    if _GLOBAL_MESH is not None:
        return _GLOBAL_MESH
    return create_mesh(model=model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch dict with the batch dim sharded over `data`.

    Single-process: a plain sharded device_put. Multi-process: each host holds
    only its process_shard slice, and the global jax.Arrays are assembled from
    the per-host pieces (data travels host->its own devices only; no DCN)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    pc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * pc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree.map(put, batch)
