"""Multi-host bring-up: ``jax.distributed`` initialization + global meshes.

The reference is a single-process binary; this framework targets TPU pods,
where each host runs one copy of the program (multi-controller SPMD) and
``jax.distributed.initialize`` wires the hosts into one global device set.
The scaling story (BASELINE.json north_star: >= 80% efficiency on 2 hosts)
rides the ``pairs`` axis — scan pairs of the ETH sweep sharded across hosts
with zero cross-pair communication — while the ``points`` axis stays inside
a host (its psums ride ICI, never DCN).

Launch recipe (one command per host)
------------------------------------
On a TPU pod slice, the TPU runtime supplies the coordination env and no
arguments are needed::

    # every host of the slice:
    python -m icp_variants_tpu eth --csv ... --mesh pairs=auto

    # in code:
    from icp_variants_tpu.parallel import distributed
    distributed.initialize()            # no-op on a single host
    mesh = distributed.global_mesh(points_per_pair=1)

On CPU/GPU clusters (or the 2-process CPU rehearsal), pass explicit
coordinates::

    distributed.initialize("host0:8476", num_processes=2, process_id=RANK)

``scripts/multihost_rehearsal.py`` is the runnable 2-process rehearsal
(exercised by tests/test_multihost.py on this machine).
"""

from __future__ import annotations

import os

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Bring up the multi-host runtime. Returns True if distributed mode is
    active, False for the single-process fallback.

    With no arguments: on TPU pods the runtime auto-detects coordinates from
    the TPU environment; elsewhere single-process mode is kept (so the same
    driver script runs on a laptop and a pod).
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and jax.distributed.is_initialized():
        return True
    if coordinator_address is None:
        # Auto-detect only where a pod/cluster environment advertises itself;
        # otherwise stay single-process.
        if not (os.environ.get("TPU_WORKER_HOSTNAMES")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
                or os.environ.get("JAX_COORDINATOR_ADDRESS")):
            return False
        jax.distributed.initialize()
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def global_mesh(points_per_pair: int = 1, devices=None):
    """A (pairs, points) mesh over ALL processes' devices.

    ``points_per_pair`` devices cooperate on each registration problem
    (tensor parallel over source points); the rest of the global device set
    becomes the embarrassingly-parallel ``pairs`` axis. Keep
    ``points_per_pair`` within one host so the psums never cross DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % points_per_pair != 0:
        raise ValueError(
            f"{n} global devices do not divide into points_per_pair="
            f"{points_per_pair}"
        )
    return jax.make_mesh(
        (n // points_per_pair, points_per_pair),
        ("pairs", "points"),
        devices=devices,
    )


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """True on the process that should write summaries/artifacts."""
    return jax.process_index() == 0
