"""Diagnose SSE streaming granularity: boot the server (CPU ok), send one
streaming request, print the arrival time of every chunk relative to
request start. Used to verify tokens stream incrementally rather than in
one end-of-request burst."""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import requests  # noqa: E402

from chitu_tpu.config import load_config  # noqa: E402
from chitu_tpu.serve import BackgroundServer  # noqa: E402


def main():
    cfg = load_config(
        overrides=[
            "models=tiny-llama-debug",
            "infer.max_seq_len=512",
            "infer.page_size=256",
            "infer.decode_window=8",
            "infer.max_reqs=4",
            "infer.decode_buckets=4",
            "serve.port=0",
        ]
        + [a for a in sys.argv[1:] if "=" in a]
    )
    srv = BackgroundServer(cfg, warmup=False)
    port = srv.start()
    url = f"http://127.0.0.1:{port}/v1/chat/completions"
    try:
        body = {
            "messages": "Tell me a story.",
            "temperature": 0.0,
            "stream": True,
            "max_tokens": 32,
        }
        t0 = time.perf_counter()
        events = []
        with requests.post(url, json=body, stream=True, timeout=600) as r:
            r.raise_for_status()
            for line in r.iter_lines(chunk_size=1):
                now = time.perf_counter() - t0
                if not line or not line.startswith(b"data: "):
                    continue
                payload = line[6:]
                if payload == b"[DONE]":
                    events.append((now, "[DONE]"))
                    break
                chunk = json.loads(payload)
                delta = chunk["choices"][0].get("delta", {})
                events.append((now, delta.get("content", "")))
        for ts, content in events:
            print(f"{ts*1000:8.1f}ms  {content!r}")
        gaps = [events[i][0] - events[i - 1][0] for i in range(1, len(events))]
        print(
            f"chunks={len(events)} first={events[0][0]*1000:.1f}ms "
            f"last={events[-1][0]*1000:.1f}ms max_gap={max(gaps)*1000:.1f}ms"
        )
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
