"""Multi-host (multi-process) runtime plumbing.

The reference is single-process/single-GPU (SURVEY.md §2.5); this module
supplies the pieces a multi-host TPU slice needs around the (already
host-count-agnostic) sharded step in `parallel/sharded.py`:

  * `initialize()` — `jax.distributed.initialize` entry (JAX picks up the
    TPU pod coordinator automatically on Cloud TPU; explicit args cover
    manual launches),
  * `is_coordinator()` — process-0 guard for file writes (save /
    checkpoint / TensorBoard / stdout),
  * `local_data_rows(mesh)` — which 'data' batch rows this process owns,
    so each host fetches only its cameras' ground truth per step (the
    resident device GT cache, when the dataset fits its budget, is still
    uploaded in full on every process — any view can land on any row over
    the epochs),
  * `make_global_batch(mesh, cams, gt)` — assemble per-process local
    camera/GT arrays into global `jax.Array`s matching the step's
    ('data', 'tile') shardings. Single-process: a passthrough.

Launch recipe: docs/multichip.md.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    MUST run before any other JAX call touches the backend. On Cloud TPU
    pods all three arguments are discovered from the metadata server; pass
    them explicitly for manual / CPU-fleet launches
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    are honoured as fallbacks).
    """
    global _initialized
    if _initialized:
        return
    kw = {}
    ca = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if ca:
        kw["coordinator_address"] = ca
    np_ = num_processes if num_processes is not None else os.environ.get("JAX_NUM_PROCESSES")
    if np_ is not None:
        kw["num_processes"] = int(np_)
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    jax.distributed.initialize(**kw)
    _initialized = True


def is_coordinator() -> bool:
    return jax.process_index() == 0


def local_data_rows(mesh: Mesh) -> list[int]:
    """Indices along the 'data' mesh axis whose devices this process owns.

    With the standard mesh layout (contiguous device blocks per host) each
    host owns a contiguous set of data-groups; generality costs nothing, so
    the row set is derived from the actual device→process mapping.
    """
    pid = jax.process_index()
    devs = np.asarray(mesh.devices)  # [data, tile]
    rows = []
    for d in range(devs.shape[0]):
        if any(dev.process_index == pid for dev in devs[d].ravel()):
            rows.append(d)
    return rows


def make_global_batch(mesh: Mesh, cams, gt_local: np.ndarray, rows: list[int]):
    """Build global step inputs from process-local data.

    Args:
      mesh: the ('data', 'tile') mesh.
      cams: a CameraBatch pytree with FULL batch leaves [n_data, ...] —
        camera metadata is tiny, every process constructs all of it (the
        sampler is seed-deterministic so all processes agree).
      gt_local: [len(rows), Hp, W, C] ground truth for this process's rows.
      rows: `local_data_rows(mesh)`.

    Single-process: returns (cams, gt_local) unchanged (fast path — the
    jit handles layout). Multi-process: the GT becomes a global jax.Array
    sharded ('data', 'tile'); camera leaves become global arrays sharded
    over 'data' built from the (replicated-by-construction) full batch.
    """
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return cams, jnp.asarray(gt_local)

    n_data = mesh.shape["data"]
    gt_sharding = NamedSharding(mesh, P("data", "tile"))
    global_shape = (n_data,) + tuple(gt_local.shape[1:])
    gt = jax.make_array_from_process_local_data(gt_sharding, gt_local, global_shape)

    cam_sharding = NamedSharding(mesh, P("data"))

    def leaf(x):
        x = np.asarray(x)
        local = x[np.asarray(rows)]
        return jax.make_array_from_process_local_data(cam_sharding, local, x.shape)

    cams_g = jax.tree_util.tree_map(leaf, cams)
    return cams_g, gt
