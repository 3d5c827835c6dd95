"""HTTP serving benchmark client.

Capability parity with the reference's benchmark tool
(reference: benchmarks/benchmark_serving.py:62-228): drives
`/v1/chat/completions` with concurrent requests, measures TTFT / per-token
latency / output tokens-per-second / request throughput, prints a JSON
summary.

Usage:
    python benchmarks/benchmark_serving.py --host 127.0.0.1 --port 21002 \
        --num-requests 32 --concurrency 8 --max-tokens 64 [--stream]
"""

from __future__ import annotations

import argparse
import concurrent.futures as futures
import json
import time
from typing import List

import requests


def one_request(url: str, prompt: str, max_tokens: int, stream: bool):
    t0 = time.perf_counter()
    body = {
        "messages": prompt,
        "temperature": 0.0,
        "stream": stream,
        "max_tokens": max_tokens,
    }
    ttft = None
    ntok = 0
    if stream:
        with requests.post(url, json=body, stream=True, timeout=600) as r:
            if r.status_code == 403:
                # admission shed (serve.admission_max_wait_s): counted
                # separately — a shed is the server choosing bounded TTFT
                # for admitted traffic over unbounded queueing
                return dict(shed=True, total=time.perf_counter() - t0)
            r.raise_for_status()
            # chunk_size=1: iter_lines buffers 512B by default, which hides
            # real first-token latency behind client-side read coalescing
            for line in r.iter_lines(chunk_size=1):
                if not line or not line.startswith(b"data: "):
                    continue
                payload = line[6:]
                if payload == b"[DONE]":
                    break
                chunk = json.loads(payload)
                delta = chunk["choices"][0].get("delta", {})
                if delta.get("content") or delta.get("reasoning_content"):
                    if ttft is None:
                        ttft = time.perf_counter() - t0
                    ntok += 1
                if chunk.get("usage"):
                    ntok = chunk["usage"]["completion_tokens"]
    else:
        r = requests.post(url, json=body, timeout=600)
        if r.status_code == 403:
            return dict(shed=True, total=time.perf_counter() - t0)
        r.raise_for_status()
        data = r.json()
        ttft = time.perf_counter() - t0
        ntok = data["usage"]["completion_tokens"]
    total = time.perf_counter() - t0
    return dict(ttft=ttft or total, total=total, output_tokens=ntok)


def build_workload(
    num_requests: int,
    max_tokens: int,
    prompt: str,
    ragged: int = 0,
    shared_prefix: int = 0,
) -> List[tuple]:
    """[(prompt, max_tokens)] per request. `ragged` (a seed, 0 = off)
    samples per-request prompt lengths and output budgets — the mixed
    workload serving actually sees; `shared_prefix` prepends that many
    copies of a fixed system-prompt-style block (the prefix-cache-on
    regime: only each request's tail should prefill on a warm cache)."""
    import random

    base = (prompt + " ") * 12
    words = base.split()
    out = []
    rng = random.Random(ragged or 1)
    prefix = (
        "You are a meticulous assistant. Answer carefully and cite "
        "sources. " * shared_prefix
        if shared_prefix
        else ""
    )
    for i in range(num_requests):
        if ragged:
            plen = rng.randint(8, max(len(words), 9))
            mt = rng.randint(max(max_tokens // 8, 4), max_tokens)
        else:
            plen = len(words) // 2
            mt = max_tokens
        out.append((prefix + " ".join(words[:plen]), mt))
    return out


def run_benchmark(
    host: str,
    port: int,
    num_requests: int,
    concurrency: int,
    max_tokens: int,
    stream: bool,
    prompt: str,
    warmup: int = 2,
    ragged: int = 0,
    rate: float = 0.0,
    shared_prefix: int = 0,
):
    url = f"http://{host}:{port}/v1/chat/completions"
    work = build_workload(
        num_requests, max_tokens, prompt, ragged, shared_prefix
    )
    # warmup at FULL concurrency so every batch-shape variant the
    # measured phase will hit (packed-prefill / hybrid R x T buckets,
    # decode buckets) is compiled before t0 — a cold server otherwise
    # spends the first wave jit-compiling mid-traffic. Warmup draws from
    # the same workload so ragged shape variants compile too.
    wu = (work * ((concurrency // len(work)) + 1))[:concurrency]
    for _ in range(max(warmup, 1)):
        with futures.ThreadPoolExecutor(max_workers=concurrency) as ex:
            list(
                ex.map(
                    lambda w: one_request(url, w[0], w[1], stream), wu
                )
            )

    import random

    gaps = None
    if rate > 0:
        # open-loop arrivals: exponential inter-arrival gaps at `rate`
        # req/s (closed-loop concurrency hides queueing delay — the
        # saturation knee only shows under open-loop load)
        g = random.Random(17)
        gaps = [g.expovariate(rate) for _ in range(num_requests)]

    t0 = time.perf_counter()
    results: List[dict] = []
    with futures.ThreadPoolExecutor(max_workers=concurrency) as ex:
        futs = []
        for i, (p, mt) in enumerate(work):
            if gaps is not None and i > 0:
                time.sleep(gaps[i])
            futs.append(ex.submit(one_request, url, p, mt, stream))
        for f in futures.as_completed(futs):
            results.append(f.result())
    wall = time.perf_counter() - t0

    shed = [r for r in results if r.get("shed")]
    results = [r for r in results if not r.get("shed")]
    if not results:
        return {"num_requests": num_requests, "shed": len(shed),
                "error": "every request was shed"}
    out_tokens = sum(r["output_tokens"] for r in results)
    ttfts = sorted(r["ttft"] for r in results)
    totals = sorted(r["total"] for r in results)
    # without --stream the first byte IS the full response, so TTFT
    # equals total latency — mark it so readers don't compare it against
    # streamed TTFT numbers
    ttft_measured = bool(stream)

    def pct(xs, p):
        return xs[min(int(len(xs) * p), len(xs) - 1)]

    summary = {
        "num_requests": num_requests,
        "concurrency": concurrency,
        "ragged": ragged,
        "rate_req_per_s": rate or None,
        "shared_prefix": shared_prefix,
        "wall_s": round(wall, 3),
        "output_tokens": out_tokens,
        "output_tok_per_s": round(out_tokens / wall, 2),
        "req_per_s": round(num_requests / wall, 3),
        "ttft_p50_s": round(pct(ttfts, 0.5), 4) if ttft_measured else None,
        "ttft_p99_s": round(pct(ttfts, 0.99), 4) if ttft_measured else None,
        "latency_p50_s": round(pct(totals, 0.5), 4),
        "latency_p99_s": round(pct(totals, 0.99), 4),
        # admission sheds: percentiles above cover ADMITTED traffic only
        "shed": len(shed),
        "served": len(results),
    }
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=21002)
    ap.add_argument("--num-requests", type=int, default=32)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--prompt", default="Tell me about high performance computing.")
    ap.add_argument(
        "--ragged", type=int, default=0,
        help="seed for mixed prompt lengths + output budgets (0 = uniform)",
    )
    ap.add_argument(
        "--rate", type=float, default=0.0,
        help="open-loop arrival rate in req/s (0 = closed-loop)",
    )
    ap.add_argument(
        "--shared-prefix", type=int, default=0,
        help="prepend N copies of a fixed system block (prefix-cache hit "
        "workload)",
    )
    args = ap.parse_args()
    summary = run_benchmark(
        args.host,
        args.port,
        args.num_requests,
        args.concurrency,
        args.max_tokens,
        args.stream,
        args.prompt,
        ragged=args.ragged,
        rate=args.rate,
        shared_prefix=args.shared_prefix,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
