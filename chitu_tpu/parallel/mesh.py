"""Device mesh construction.

The reference's NCCL process-group plumbing (reference:
chitu/tensor_parallel.py:16-27, chitu/backend.py:87-101) maps to a single
`jax.sharding.Mesh` with named axes; XLA compiles the collectives over ICI.

Axis conventions used across the engine:
- "dp": data parallel (batch dim of decode; replica scale-out)
- "pp": pipeline stages (layer-stack dim; DCN-aware placement)
- "tp": tensor parallel (weight shards; also hosts expert parallelism,
  which shards the expert dim of MoE weights over the same axis)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "pp", "tp")


def make_mesh(
    dp: int = 1,
    pp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = dp * pp * tp
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for dp={dp} pp={pp} tp={tp}, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[:need]).reshape(dp, pp, tp)
    return Mesh(grid, AXES)


def mesh_from_config(cfg, devices=None) -> Optional[Mesh]:
    i = cfg.infer
    if i.dp_size * i.pp_size * i.tp_size <= 1:
        return None
    return make_mesh(i.dp_size, i.pp_size, i.tp_size, devices)
