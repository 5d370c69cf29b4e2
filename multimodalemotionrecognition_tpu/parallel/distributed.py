"""Multi-host initialization (SURVEY.md §2.2: optional DCN data parallelism).

The reference is strictly single-process; its only cross-machine mechanism is
the Redis queue.  For multi-host TPU training, JAX's own distributed runtime
supplies the process group; this helper wires it from the standard env vars
and degenerates to a no-op on a single host.

Env: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID
(or the platform's auto-detection on Cloud TPU pods).
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["maybe_initialize_distributed", "is_multi_host"]

_initialized = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host env is configured.
    Returns True when running multi-host."""
    global _initialized
    if _initialized:
        return is_multi_host()

    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n_proc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    proc_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "-1") or -1)
    )
    if not coordinator or n_proc <= 1:
        _initialized = True
        return False

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=n_proc,
        process_id=max(0, proc_id),
    )
    _initialized = True
    return True


def is_multi_host() -> bool:
    import jax

    return jax.process_count() > 1
