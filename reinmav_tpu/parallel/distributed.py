"""Multi-host initialisation and process-role helpers.

The reference's multi-process story is `mpirun` + mpi4py rank gating
(SURVEY.md §5: OpenMPI used only to silence logs on rank>0; gradient
averaging inside baselines).  TPU-native equivalent: one JAX process per
host, `jax.distributed.initialize()` to form the global runtime, a mesh
spanning every chip in the slice, and XLA collectives over ICI/DCN — no
application-level communication code at all.

Usage on a pod slice (same script on every host)::

    from reinmav_tpu.parallel import distributed, make_mesh
    distributed.init()                  # no-op on single host
    mesh = make_mesh()                  # spans ALL hosts' devices
    ...                                 # identical code to single-host

Data placement: build per-host batches with
:func:`host_local_batch_size` and form global arrays with
``jax.make_array_from_process_local_data`` — helpers below wrap the
common cases.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import batch_sharding


_initialized = False


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """Initialise the multi-host runtime.

    Two modes:

    * **Explicit** (any argument given): this process was deliberately
      launched as part of a multi-process run — initialisation failures
      are real misconfigurations and RAISE (a silently-degraded pod run
      would train on 1/N of the data while looking healthy).
    * **Auto-detect** (no arguments): TPU pod environments carry the
      coordinator/process metadata; if none is found this is a plain
      single-process run and ``init`` is a no-op.  Any other failure
      still raises.

    Idempotent: repeated calls after a successful initialise are no-ops.
    """
    global _initialized
    explicit = any(
        v is not None for v in (coordinator_address, num_processes, process_id)
    )
    if _initialized:
        # Re-init with explicit arguments is only a no-op when they MATCH
        # the live runtime — a conflicting second call is a real
        # misconfiguration and must raise, not be silently ignored.
        if explicit:
            if num_processes is not None and num_processes != jax.process_count():
                raise RuntimeError(
                    f"distributed.init(num_processes={num_processes}) after "
                    f"runtime already initialised with "
                    f"{jax.process_count()} processes"
                )
            if process_id is not None and process_id != jax.process_index():
                raise RuntimeError(
                    f"distributed.init(process_id={process_id}) after runtime "
                    f"already initialised as process {jax.process_index()}"
                )
        return
    if explicit and num_processes == 1:
        return  # deliberate single-process run
    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )  # raises on misconfiguration — do NOT swallow
        _initialized = True
        return
    try:
        jax.distributed.initialize()
        _initialized = True
    except ValueError as e:
        # jax raises ValueError("coordinator_address should be defined")
        # when no cluster environment is detected — the single-process
        # case.  Anything else propagates.
        if "coordinator_address" in str(e):
            return
        raise


def is_main() -> bool:
    """Host-0 gating (the MPI rank-0 check of ``run.py:177-182``)."""
    return jax.process_index() == 0


def host_local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n


def global_batch_array(mesh, host_local: np.ndarray):
    """Assemble per-host (B_local, ...) data into one global batch-sharded
    array on the mesh (identity on single host)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(host_local, sharding)
    return jax.make_array_from_process_local_data(sharding, host_local)
