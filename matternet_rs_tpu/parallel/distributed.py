"""Multi-process / multi-host initialization.

The reference is single-process (SURVEY §5: no distributed communication
backend). For multi-host TPU pods, JAX's runtime handles process discovery;
this wrapper standardizes initialization and exposes the global mesh:

* one process per host, all devices visible globally after
  :func:`initialize`,
* build/search code is unchanged — ``make_mesh()`` simply sees more
  devices; collectives ride ICI within a slice and DCN across slices
  (use :func:`matternet_rs_tpu.parallel.mesh.make_mesh_2d` to make the
  boundary explicit).
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize the distributed JAX runtime (no-op if single-process).

    With no arguments, relies on the TPU environment's auto-discovery
    (GKE/TPU-VM metadata). Returns the global device summary.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_device_count": len(jax.devices()),
        "local_device_count": jax.local_device_count(),
    }
    log.info("distributed runtime: %s", info)
    return info
