"""Two-process CPU-mesh multi-host smoke: jax.distributed over localhost.

Validates the multi-host execution path without a pod (the strategy
SURVEY.md §4 recommends over the reference's real-NCCL-only launchers,
script/srun_multi_node.sh): two processes each expose 2 virtual CPU
devices, initialize jax.distributed against a localhost coordinator,
build ONE global tp=4 mesh spanning both processes, and run the engine —
every process executes the identical deterministic program (the
single-controller-free control plane: the schedule is a pure function of
the request stream, so no in-band task tensor is needed; reference
broadcasts an int64 tensor instead, task.py:318-433).

Run: python scripts/multihost_smoke.py          (spawns both processes)
     python scripts/multihost_smoke.py <pid>    (one process)
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 47631
N_PROC = 2
DEV_PER_PROC = 2


def worker(pid: int):
    # drop any inherited device-count flag (e.g. the test harness's 8)
    inherited = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    os.environ["XLA_FLAGS"] = " ".join(
        [f"--xla_force_host_platform_device_count={DEV_PER_PROC}"] + inherited
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC

    import dataclasses

    from chitu_tpu.config import load_config
    from chitu_tpu.engine import Engine
    from chitu_tpu.parallel import make_mesh
    from chitu_tpu.parallel.distributed import is_controller
    from chitu_tpu.task import SampleParams

    cfg = load_config(
        overrides=[
            "models=tiny-llama-debug",
            "infer.max_seq_len=128",
            "infer.max_reqs=4",
            "infer.page_size=16",
            "infer.tp_size=4",
            "infer.merge_qkv_gate_up=off",
        ]
    )
    m = dataclasses.replace(
        cfg.models, n_layers=2, dim=256, n_heads=8, n_kv_heads=4,
        inter_dim=512, vocab_size=512,
    )
    cfg = dataclasses.replace(cfg, models=m)
    mesh = make_mesh(tp=4, devices=jax.devices())
    eng = Engine(cfg, mesh=mesh)

    # identical request stream on every process -> identical schedule ->
    # identical jit calls (SPMD); only the controller reports
    p = SampleParams(temperature=0.0, max_new_tokens=5)
    req = eng.submit("multihost smoke prompt", p)
    eng.run_until_complete(max_steps=64)
    toks = list(req.async_stream.tokens)
    assert len(toks) == 5, toks
    print(
        f"[process {pid}] controller={is_controller()} tokens={toks}",
        flush=True,
    )
    if is_controller():
        print("MULTIHOST-SMOKE-OK", flush=True)


def main():
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid)],
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        for pid in range(N_PROC)
    ]
    rc = [p.wait(timeout=600) for p in procs]
    assert all(r == 0 for r in rc), rc
    print("multihost smoke: both processes completed")


if __name__ == "__main__":
    main()
