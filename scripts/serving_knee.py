"""Serving at the knee (VERDICT r4 next-6 + weak-7).

Three passes against one tiny-llama server geometry:

1. Open-loop rate sweep WITHOUT the admission SLO (the r4 baseline whose
   TTFT p50 jumped 0.17 -> 1.9 s between rate 32 and 64) — now also
   emits the server-side phase-timer attribution (/status timers) so the
   engine-vs-serving gap has a checked-in breakdown.
2. The same sweep WITH serve.admission_max_wait_s: past the knee the
   server sheds instead of queueing; TTFT p50 of ADMITTED traffic must
   stay bounded while goodput holds.
3. Deadline-policy A/B at the knee rate (scheduler.policy=deadline vs
   prefill_first, same workload).

Usage: python scripts/serving_knee.py [k=v engine overrides ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PROMPT = "Lighthouse keeper story."


def client(port: int, label: str, *args: str, extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "benchmarks", "benchmark_serving.py"),
            "--port", str(port), "--stream", "--prompt", PROMPT,
        ]
        + list(args),
        capture_output=True, text=True, timeout=1800, env=env,
    )
    if p.returncode != 0:
        print(f"{label} FAILED: {p.stderr[-800:]}", file=sys.stderr)
        return None
    s = json.loads(p.stdout.strip().splitlines()[-1])
    if extra:
        s.update(extra)
    print(json.dumps({"metric": label, **s}), flush=True)
    return s


def status(port: int) -> dict:
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/status", timeout=30
    ) as r:
        return json.loads(r.read())


def timer_delta(before: dict, after: dict) -> dict:
    out = {}
    for name, t in after.get("timers", {}).items():
        b = before.get("timers", {}).get(name, {"s": 0.0, "n": 0})
        out[name] = {
            "s": round(t["s"] - b["s"], 3),
            "n": t["n"] - b["n"],
        }
    out["shed"] = after.get("admission", {}).get("shed", 0) - before.get(
        "admission", {}
    ).get("shed", 0)
    return out


def boot(extra_overrides):
    from chitu_tpu.config import load_config
    from chitu_tpu.serve import BackgroundServer

    cfg = load_config(
        overrides=[
            "models=tiny-llama-debug",
            "infer.max_seq_len=512",
            "infer.page_size=64",
            "infer.decode_window=32",
            "infer.max_reqs=64",
            "infer.decode_buckets=64",
            "serve.port=0",
        ]
        + extra_overrides
        + [a for a in sys.argv[1:] if "=" in a]
    )
    srv = BackgroundServer(cfg, warmup=True)
    return srv, srv.start()


def sweep(port: int, tag: str):
    for rate in ("16", "32", "64", "128"):
        before = status(port)
        client(
            port, f"serving_knee_{tag}_rate{rate}",
            "--num-requests", "192", "--concurrency", "64",
            "--max-tokens", "48", "--rate", rate,
        )
        after = status(port)
        print(
            json.dumps(
                {
                    "metric": f"serving_knee_{tag}_rate{rate}_server_split",
                    **timer_delta(before, after),
                }
            ),
            flush=True,
        )


def run_pass(name: str):
    if name == "noslo":
        srv, port = boot([])
        try:
            sweep(port, "noslo")
        finally:
            srv.stop()
    elif name == "slo":
        srv, port = boot(["serve.admission_max_wait_s=0.5"])
        try:
            sweep(port, "slo0.5")
        finally:
            srv.stop()
    else:  # policy A/B at the knee rate, ragged workload
        srv, port = boot(
            [f"scheduler.policy={name}", "serve.admission_max_wait_s=0.5"]
        )
        try:
            client(
                port, f"serving_knee_policy_{name}_rate64",
                "--num-requests", "192", "--concurrency", "64",
                "--max-tokens", "48", "--rate", "64", "--ragged", "13",
            )
        finally:
            srv.stop()


def main():
    if len(sys.argv) > 1 and sys.argv[1].startswith("_pass:"):
        run_pass(sys.argv[1].split(":", 1)[1])
        return
    # each pass boots its server in a FRESH subprocess: sequential engine
    # boots in one process leak device buffers across boots (closure refs
    # defer frees to the cycle GC) and the 4th-5th boot then measures HBM
    # pressure instead of the scheduler (r5: one in-process policy run
    # showed an 85 s wall that a fresh-process rerun put at 8 s)
    for name in ("noslo", "slo", "prefill_first", "deadline"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), f"_pass:{name}"],
            timeout=3600,
        )
        if p.returncode != 0:
            print(f"pass {name} FAILED rc={p.returncode}", file=sys.stderr)


if __name__ == "__main__":
    main()
