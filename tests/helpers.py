"""Shared test fixtures: tiny model configs and engines."""

import dataclasses

from chitu_tpu.config import load_config


def tiny_cfg(**overrides):
    """A 2-layer, 128-dim llama for fast CPU tests."""
    cfg = load_config(
        overrides=[
            "models=micro-llama-debug",
            "infer.max_seq_len=128",
            "infer.max_reqs=4",
            "infer.page_size=16",
            "request.max_new_tokens=8",
        ]
    )
    m = cfg.models
    infer = cfg.infer
    sched = cfg.scheduler
    for k, v in overrides.items():
        group, _, key = k.partition(".")
        if group == "infer":
            infer = dataclasses.replace(infer, **{key: v})
        elif group == "scheduler":
            sched = dataclasses.replace(sched, **{key: v})
        elif group == "models":
            m = dataclasses.replace(m, **{key: v})
        else:
            cfg = dataclasses.replace(cfg, **{k: v})
    return dataclasses.replace(cfg, infer=infer, scheduler=sched, models=m)
