"""Serving-level A/B driver: boots the engine HTTP server with the
given overrides and drives it with benchmark_serving.py in a separate
process (GIL isolation). One JSON line per run.

Usage:
  python scripts/serving_ab.py label=NAME [engine k=v ...] -- [client args]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    if "--" in sys.argv:
        cut = sys.argv.index("--")
        eng_args = sys.argv[1:cut]
        client_args = sys.argv[cut + 1 :]
    else:
        eng_args, client_args = sys.argv[1:], []
    label = "serving"
    overrides = []
    for a in eng_args:
        if a.startswith("label="):
            label = a.split("=", 1)[1]
        else:
            overrides.append(a)

    from chitu_tpu.config import load_config
    from chitu_tpu.serve import BackgroundServer

    cfg = load_config(
        overrides=[
            "models=tiny-llama-debug",
            "infer.max_seq_len=512",
            "infer.page_size=256",
            "infer.decode_window=32",
            "infer.max_reqs=16",
            "infer.decode_buckets=16",
            "serve.port=0",
        ]
        + overrides
    )
    srv = BackgroundServer(cfg, warmup=True)
    port = srv.start()
    try:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        args = [
            sys.executable,
            os.path.join(_REPO, "benchmarks", "benchmark_serving.py"),
            "--port", str(port),
        ] + (client_args or [
            "--num-requests", "64", "--concurrency", "16",
            "--max-tokens", "64", "--stream",
            "--prompt", "Write a short story about a lighthouse keeper. ",
        ])
        p = subprocess.run(
            args, capture_output=True, text=True, timeout=1800, env=env
        )
        if p.returncode != 0:
            print(p.stderr[-1500:], file=sys.stderr)
            raise SystemExit(1)
        s = json.loads(p.stdout.strip().splitlines()[-1])
    finally:
        srv.stop()
    print(json.dumps({"metric": label, **s}), flush=True)


if __name__ == "__main__":
    main()
