"""Model registry.

Families mirror the reference's model factory
(reference: chitu/backend.py:72-84): hf-llama (Llama-3 / Qwen2 / GLM-4 /
R1-Distill), llama (Meta checkpoints), mixtral, deepseek-v3.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_model(type_name: str):
    def deco(cls):
        _REGISTRY[type_name] = cls
        return cls

    return deco


def build_model(model_args, cfg):
    """Instantiate the model-family adapter for a model card."""
    # import for registration side effects
    from chitu_tpu.models import llama  # noqa: F401

    t = model_args.type
    if t in ("hf-llama", "llama"):
        cls = _REGISTRY["hf-llama"]
    elif t == "mixtral":
        from chitu_tpu.models import mixtral  # noqa: F401

        cls = _REGISTRY["mixtral"]
    elif t == "deepseek-v3":
        from chitu_tpu.models import deepseek_v3  # noqa: F401

        cls = _REGISTRY["deepseek-v3"]
    else:
        raise ValueError(f"unknown model type {t!r}")
    return cls(model_args, cfg)
