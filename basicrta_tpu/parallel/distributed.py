"""Multi-host (pod / multi-slice) execution.

The reference scales across nodes with a Slurm job array — one residue per
job (reference scripts/create_jobs.sh:16-20, submit_tmp.slu). The TPU
equivalent is one SPMD program over every chip of a pod: each host runs
the same driver, ``jax.distributed`` wires the hosts into one runtime, and
the residue/chain lanes shard over the GLOBAL device set. Lane sharding is
collective-free, so cross-host traffic is zero during sampling; only the
final thinned-sample gather crosses DCN.

Typical launch (same command on every host; the TPU runtime supplies
coordinator/process env on Cloud TPU VMs automatically):

    python -m basicrta_tpu.cli gibbs --contacts contacts_7.0.npz \
        --multihost --ndevices 0
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["initialize", "global_lane_mesh", "is_multihost",
           "local_result_slice"]

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join this process into the global JAX runtime (idempotent).

    With no arguments, relies on the TPU runtime's automatic environment
    (Cloud TPU VMs / GKE set the coordinator for the pod slice). On other
    clusters pass the coordinator explicitly or export
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``.
    """
    global _initialized
    if _initialized:
        return
    import jax

    if jax.process_count() > 1:      # already initialized by the runtime
        _initialized = True
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True


def is_multihost() -> bool:
    import jax
    return jax.process_count() > 1


def global_lane_mesh():
    """('lanes', 'events'(=1)) mesh over every device of every host.

    Lanes placed host-major: each host's local devices hold a contiguous
    lane block, so per-host result collection (``local_result_slice``)
    needs no cross-host transfer.
    """
    import jax
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(len(devs), 1)
    return Mesh(arr, ("lanes", "events"))


def local_result_slice(n_lanes: int) -> slice:
    """Lane-index range owned by this host under ``global_lane_mesh``
    placement, for per-host persistence of an (n_lanes, ...) result."""
    import jax

    n_proc = jax.process_count()
    per = -(-n_lanes // n_proc)
    lo = jax.process_index() * per
    return slice(lo, min(lo + per, n_lanes))


def host_residue_partition(labels):
    """This host's residue subset for the recommended pod mapping.

    Residues are independent, so the best multi-host layout is the
    reference's Slurm-array shape run at device speed: every host runs the
    SAME driver over its own residue subset with its LOCAL chips (lane
    sharding via ``--ndevices 0``), writing into the shared
    ``basicrta-{cutoff}/{res}/`` tree. No cross-host arrays, no DCN
    traffic, and the failure/rerun sentinel contract
    (``missing_residues`` + ``--rerun-missing``) works unchanged across
    hosts. Round-robin by sorted order so event-count skew spreads evenly.
    """
    import jax

    labels = sorted(labels)
    n, i = jax.process_count(), jax.process_index()
    return [lab for j, lab in enumerate(labels) if j % n == i]
