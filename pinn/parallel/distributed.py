"""Multi-host (multi-process) meshes: the DCN axis.

``pinn.parallel.mesh`` scales over the devices of ONE process (a chip
or a single-host pod slice, collectives riding ICI).  This module adds
the multi-controller tier: several processes — one per TPU host on a
pod, or CPU processes in tests — form one global mesh whose outer axis
crosses hosts (DCN) while the inner axis stays intra-host (ICI).  The
collocation-point axis shards over BOTH (it is embarrassingly parallel
and the loss reduction is a single psum tree: intra-host partials
reduce over ICI, one scalar per host crosses DCN), parameters stay
replicated — so the layout keeps the bandwidth-hungry traffic on ICI,
which is the standard recipe (scaling-book: mesh + sharding
annotations, XLA inserts the collectives).

The reference has nothing multi-process (SURVEY.md §2.5: communication
backend "None").  There is still no hand-written transport here: after
``init_distributed`` the same jitted loss/grad code runs unchanged, and
GSPMD lowers the reductions to collectives over whatever fabric
connects the devices (ICI/DCN on pods, Gloo in the CPU test tier —
tests/test_distributed.py runs a real 2-process mesh and checks
loss/grad bit-parity against the single-process oracle).

Typical pod usage (one process per host)::

    from pinn.parallel import distributed as dist
    dist.init_distributed()            # auto-detects on TPU pods
    mesh = dist.make_multihost_mesh()  # (hosts, data) axes
    X_f  = dist.shard_points_multihost(local_X_f, mesh)  # local rows in
    u    = dist.replicate_multihost(u_train, mesh)       # same on hosts
    # ... build loss on the global arrays; jit as usual.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

HOST_AXIS = "hosts"
DATA_AXIS = "data"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` passthrough.

    On TPU pods every argument auto-detects from the runtime; CPU/GPU
    fleets (and the test tier) pass coordinator/count/id explicitly.
    Call once, before the first device op.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multihost_mesh(host_axis: str = HOST_AXIS,
                        data_axis: str = DATA_AXIS) -> Mesh:
    """(num_processes, local_device_count) mesh: outer axis crosses
    hosts (DCN), inner axis is the per-host devices (ICI)."""
    n_proc = jax.process_count()
    n_local = jax.local_device_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs).reshape(n_proc, n_local),
                (host_axis, data_axis))


def shard_points_multihost(local_rows: np.ndarray, mesh: Mesh):
    """Assemble the global point array from each process's local rows,
    sharded over (hosts, data) — process p owns global rows
    [p*n_local_rows, (p+1)*n_local_rows).  Every process must
    contribute the same number of rows (pad with
    ``pad_points_with_weights`` otherwise)."""
    local_rows = np.asarray(local_rows)
    global_shape = ((local_rows.shape[0] * jax.process_count(),)
                    + local_rows.shape[1:])
    sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return jax.make_array_from_process_local_data(sharding, local_rows,
                                                  global_shape)


def replicate_multihost(arr, mesh: Mesh):
    """Fully-replicated global array; every process passes identical
    data (same seed => same numpy draws, the reference's determinism
    contract, SURVEY.md §2.5 last row)."""
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(sharding, arr, arr.shape)
