"""Multi-host initialization (the reference's ``mpiexec -n N`` analog).

The reference launches one MPI rank per core and PETSc splits the DMDA
across them (src/main.cpp:12, src/utils/world.cpp:36-46).  On TPU pods
the analog is one Python process per host, joined into a single JAX
runtime with ``jax.distributed.initialize``; afterwards
``jax.devices()`` spans every chip in the slice and the GSPMD mesh from
the ``"Mesh"`` config key shards the run across all of them — the same
code path as single-host multi-chip.

Configuration comes from the standard launcher environment (TPU pods
populate coordinator/process-id automatically; explicit values can be
passed for other fabrics):

* ``XPIC_COORDINATOR``  -> coordinator_address (``host:port``)
* ``XPIC_NUM_PROCESSES``-> num_processes
* ``XPIC_PROCESS_ID``   -> process_id
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("xpic")


def maybe_initialize_distributed() -> bool:
    """Join the multi-host runtime when requested; returns True if the
    process is part of a multi-host job.

    On TPU pod slices ``jax.distributed.initialize()`` discovers the
    coordinator from the TPU environment; elsewhere the ``XPIC_*``
    variables supply it.  Single-host runs (the common case and every
    test) skip initialization entirely.
    """
    import jax

    coord = os.environ.get("XPIC_COORDINATOR")
    nproc = os.environ.get("XPIC_NUM_PROCESSES")
    if coord is None and nproc is None:
        # Auto mode: only meaningful under a multi-host TPU launcher.
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        ):
            # Pod-shaped environments are not always real pods (tunneled
            # single-chip dev setups leak these variables); if JAX cannot
            # resolve a coordinator, run single-host rather than abort.
            try:
                jax.distributed.initialize()
            except (ValueError, RuntimeError) as exc:
                log.warning(
                    "Pod-like environment but jax.distributed.initialize "
                    "failed (%s); continuing single-host", exc,
                )
                return False
            log.info(
                "Joined multi-host runtime: process %d/%d, %d devices",
                jax.process_index(), jax.process_count(), len(jax.devices()),
            )
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc) if nproc else None,
        process_id=(
            int(os.environ["XPIC_PROCESS_ID"])
            if "XPIC_PROCESS_ID" in os.environ else None
        ),
    )
    log.info(
        "Joined multi-host runtime: process %d/%d, %d devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True
