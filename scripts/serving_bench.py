"""Boot the engine's HTTP server on the bench geometry and drive it with
benchmarks/benchmark_serving.py — produces the serving-level numbers
(TTFT / latency percentiles / output tok/s) the decode bench can't show
(reference: test/test_benchmarking_tool.sh boots a 1-GPU server then runs
benchmark_serving.py against it).

Usage: python scripts/serving_bench.py [out.json]
"""

import dataclasses
import json
import sys

from chitu_tpu.config import load_config
from chitu_tpu.serve import BackgroundServer

sys.path.insert(0, "benchmarks")
from benchmark_serving import run_benchmark  # noqa: E402


def main():
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
    )
    cfg = dataclasses.replace(
        cfg, serve=dataclasses.replace(cfg.serve, port=0)
    )
    srv = BackgroundServer(cfg, warmup=True)
    port = srv.start()
    try:
        summary = run_benchmark(
            "127.0.0.1", port, num_requests=64, concurrency=16,
            max_tokens=64, stream=True,
            prompt="Write a short story about a lighthouse keeper. " * 4,
        )
    finally:
        srv.stop()
    out = {"metric": "serving_http_tinyllama1.1b_bs16", **summary}
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
