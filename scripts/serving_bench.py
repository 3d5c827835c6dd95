"""Boot the engine's HTTP server on the bench geometry and drive it with
benchmarks/benchmark_serving.py — produces the serving-level numbers
(TTFT / latency percentiles / output tok/s) the decode bench can't show
(reference: test/test_benchmarking_tool.sh boots a 1-GPU server then runs
benchmark_serving.py against it).

Usage: python scripts/serving_bench.py [out.json]
"""

import dataclasses
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from chitu_tpu.config import load_config  # noqa: E402
from chitu_tpu.serve import BackgroundServer  # noqa: E402


def main():
    extra = [a for a in sys.argv[1:] if "=" in a]
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
        + extra
    )
    cfg = dataclasses.replace(
        cfg, serve=dataclasses.replace(cfg.serve, port=0)
    )
    srv = BackgroundServer(cfg, warmup=True)
    port = srv.start()
    try:
        # drive from a SEPARATE process: 16 in-process client threads
        # would fight the engine dispatch thread for the GIL and measure
        # the client, not the server
        import subprocess

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"  # client never touches the chip
        env["PALLAS_AXON_POOL_IPS"] = ""  # keep sitecustomize off the tunnel
        bench = os.path.join(_REPO, "benchmarks", "benchmark_serving.py")
        from chitu_tpu.utils import get_timers

        # NOTE: the client runs its own warmup waves after this reset,
        # so the server-side totals below INCLUDE warmup traffic — use
        # them for phase ratios, not absolute per-request costs
        get_timers().reset()
        proc = subprocess.run(
            [
                sys.executable, bench,
                "--port", str(port), "--num-requests", "64",
                "--concurrency", "16", "--max-tokens", "64", "--stream",
                # the client 12x-multiplies the prompt into its word
                # pool (build_workload) and takes half: keep the seed
                # phrase short so uniform prompts stay ~110 tokens
                # (a 4x-repeated phrase overflowed max_seq_len=512 and
                # every request 400'd — r5 fix)
                "--prompt",
                "Write a short story about a lighthouse keeper.",
            ],
            capture_output=True, text=True, timeout=900, env=env,
        )
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        print(
            "server-side (incl. client warmup waves) " + get_timers().log(),
            file=sys.stderr,
        )
    finally:
        srv.stop()
    out = {"metric": "serving_http_tinyllama1.1b_bs16", **summary}
    line = json.dumps(out)
    print(line)
    outs = [a for a in sys.argv[1:] if "=" not in a]
    if outs:
        with open(outs[0], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
