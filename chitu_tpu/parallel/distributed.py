"""Multi-host bring-up (reference: chitu/backend.py:88-89
init_process_group + script/srun_multi_node.sh launchers).

JAX's multi-process model replaces the reference's NCCL world: every
process runs the SAME program over a global mesh;
`jax.distributed.initialize` wires the processes to a coordinator, after
which `jax.devices()` spans all hosts and jitted programs execute SPMD
with XLA collectives over ICI/DCN. The control plane needs no in-band
task tensor (reference task.py:318-433): the engine's host-side state
machine is deterministic, so every process derives the identical schedule
from the identical request stream; `/` the serving layer feeds requests
only on the controller and re-broadcasts them (scripts/multihost_smoke.py
demonstrates the two-process localhost flow end to end).
"""

from __future__ import annotations

import os

import jax

from chitu_tpu.utils import get_logger

logger = get_logger()

_initialized = False


def maybe_initialize(cfg) -> bool:
    """Initialize jax.distributed when configured (infer.coordinator /
    num_processes / process_id, or the CHITU_TPU_COORDINATOR,
    CHITU_TPU_NUM_PROCESSES, CHITU_TPU_PROCESS_ID env vars).
    Returns True when multi-process."""
    global _initialized
    coord = cfg.infer.coordinator or os.environ.get(
        "CHITU_TPU_COORDINATOR", ""
    )
    n_proc = cfg.infer.num_processes or int(
        os.environ.get("CHITU_TPU_NUM_PROCESSES", "1")
    )
    if n_proc <= 1:
        return False
    if not coord:
        # half-configured multi-host must not silently serve 1/N of the
        # model from each process's local devices
        raise ValueError(
            f"num_processes={n_proc} but no coordinator: set "
            "infer.coordinator=host:port (or CHITU_TPU_COORDINATOR)"
        )
    if not _initialized:
        pid = cfg.infer.process_id
        if pid < 0:
            pid = int(os.environ.get("CHITU_TPU_PROCESS_ID", "0"))
        logger.info(
            "jax.distributed.initialize(%s, num_processes=%d, process_id=%d)",
            coord, n_proc, pid,
        )
        from chitu_tpu.utils.logging import init_logger

        init_logger(rank=pid)
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=n_proc,
            process_id=pid,
        )
        _initialized = True
    return True


def is_controller() -> bool:
    """Process 0 runs the scheduler + HTTP server (reference: rank-0
    special-casing, chitu_main.py:42-45, serve.py:226-233)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()
