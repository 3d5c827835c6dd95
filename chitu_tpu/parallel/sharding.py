"""Parameter / cache sharding helpers.

The sharding algebra mirrors the reference's TP layer classes
(reference: chitu/tensor_parallel.py:20-208): ColumnParallelLinear = shard
the out dim, RowParallelLinear = shard the in dim (XLA inserts the
all-reduce), VocabParallelEmbedding = shard the vocab dim. Here those
become PartitionSpecs on parameter pytrees; the model adapters declare the
spec tree (`param_partition_specs`) and this module applies it.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _axis_size(mesh: Mesh, name) -> int:
    if name is None:
        return 1
    if isinstance(name, (tuple, list)):
        out = 1
        for n in name:
            out *= mesh.shape[n]
        return out
    return mesh.shape[name]


def safe_named_sharding(
    mesh: Mesh, spec: P, shape: tuple
) -> NamedSharding:
    """NamedSharding that drops axis names whose dim isn't divisible.

    Lets one spec tree serve models whose head counts don't divide the
    mesh (e.g. 2 KV heads on tp=8 -> replicate KV), matching the
    reference's fallback of replicating small tensors.
    """
    fixed = []
    for i, name in enumerate(spec):
        if name is None:
            fixed.append(None)
            continue
        size = _axis_size(mesh, name)
        if i < len(shape) and shape[i] % size == 0:
            fixed.append(name)
        else:
            fixed.append(None)
    # spec may be shorter than rank; PartitionSpec pads with None
    return NamedSharding(mesh, P(*fixed))


def shard_params(params: Any, specs: Any, mesh: Optional[Mesh]) -> Any:
    """Place a parameter pytree according to a PartitionSpec pytree."""
    if mesh is None:
        return params

    def place(leaf, spec):
        from chitu_tpu.ops.qtensor import QTensor

        if isinstance(leaf, QTensor):
            # shard packed data by the spec; scales follow blockwise
            data_sh = safe_named_sharding(mesh, spec, leaf.data.shape)
            scale_sh = safe_named_sharding(mesh, spec, leaf.scale.shape)
            return QTensor(
                data=jax.device_put(leaf.data, data_sh),
                scale=jax.device_put(leaf.scale, scale_sh),
                zeros=(
                    jax.device_put(
                        leaf.zeros,
                        safe_named_sharding(mesh, spec, leaf.zeros.shape),
                    )
                    if leaf.zeros is not None
                    else None
                ),
                kind=leaf.kind,
                block=leaf.block,
            )
        return jax.device_put(
            leaf, safe_named_sharding(mesh, spec, leaf.shape)
        )

    from chitu_tpu.ops.qtensor import QTensor

    return jax.tree_util.tree_map(
        place, params, specs, is_leaf=lambda x: isinstance(x, QTensor)
    )


def shard_cache(arrays: dict, spec: P, mesh: Optional[Mesh]) -> dict:
    """Place KV-cache pools (shard KV-head dim over tp when divisible)."""
    if mesh is None:
        return arrays
    return {
        k: jax.device_put(v, safe_named_sharding(mesh, spec, v.shape))
        for k, v in arrays.items()
    }
