"""Serving saturation sweep (VERDICT r3 next-6): one server boot, many
client workloads — concurrency >= 64, mixed prompt lengths, open-loop
request-rate sweep to the knee, and a prefix-cache-on shared-prefix
workload. One JSON line per point.

Usage: python scripts/serving_saturation.py [k=v engine overrides ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PROMPT = "Lighthouse keeper story."


def client(port: int, label: str, *args: str):
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
        return
    s = json.loads(p.stdout.strip().splitlines()[-1])
    print(json.dumps({"metric": label, **s}), flush=True)


def main():
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
            "infer.prefix_cache=true",
            "serve.port=0",
        ]
        + [a for a in sys.argv[1:] if "=" in a]
    )
    srv = BackgroundServer(cfg, warmup=True)
    port = srv.start()
    try:
        # closed-loop saturation at high concurrency, mixed lengths
        client(
            port, "serving_sat_conc64_ragged",
            "--num-requests", "256", "--concurrency", "64",
            "--max-tokens", "64", "--ragged", "31",
        )
        # open-loop rate sweep to the knee (uniform 64-token bursts)
        for rate in ("16", "32", "64", "128"):
            client(
                port, f"serving_sat_rate{rate}",
                "--num-requests", "192", "--concurrency", "64",
                "--max-tokens", "48", "--rate", rate,
            )
        # shared-prefix workload on a warm prefix cache: repeated system
        # block + ragged tails (only tails should prefill after wave 1);
        # sizes keep prefix + tail + budget under max_seq_len
        client(
            port, "serving_sat_shared_prefix_on",
            "--num-requests", "128", "--concurrency", "32",
            "--max-tokens", "32", "--ragged", "7", "--shared-prefix", "3",
        )
        client(
            port, "serving_sat_noprefix_ctrl",
            "--num-requests", "128", "--concurrency", "32",
            "--max-tokens", "32", "--ragged", "7",
        )
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
