"""Multi-host launch helper.

On a TPU pod slice every host runs the same program; this wrapper initializes
``jax.distributed`` (so all hosts see the global device set), builds the
global mesh, and reports host-local device info. The reference has no
multi-host capability at all — its only fan-out is a single-node process pool
(reference ``rl-policy-generator.py:308-321``).

Typical use::

    from pygcn_tpu.parallel.launcher import initialize_multihost
    info = initialize_multihost()           # no-op on single-host
    mesh = make_mesh([jax.device_count()], ["graph"])
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class HostInfo:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int
    distributed: bool


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> HostInfo:
    """Initialize ``jax.distributed`` when running multi-host.

    Arguments default from the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` etc. / TPU metadata); a single-host run is a
    no-op and returns local info.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    want_distributed = coordinator_address is not None or (
        num_processes is not None and num_processes > 1
    )
    distributed = False
    if want_distributed:
        kwargs = {}
        if coordinator_address:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
        distributed = True

    return HostInfo(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
        distributed=distributed,
    )
