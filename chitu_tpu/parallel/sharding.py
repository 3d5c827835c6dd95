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


# arrays at or above this element count get a loud warning when a spec
# axis is dropped: silently replicating a large weight wastes per-device
# HBM exactly where sharding matters (it OOMs only at full model scale)
_REPLICATE_WARN_ELEMS = 1 << 22  # ~8 MiB at bf16


def safe_named_sharding(
    mesh: Mesh, spec: P, shape: tuple
) -> NamedSharding:
    """NamedSharding that drops axis names whose dim isn't divisible.

    Lets one spec tree serve models whose head counts don't divide the
    mesh (e.g. 2 KV heads on tp=8 -> replicate KV), matching the
    reference's fallback of replicating small tensors. Dropping an axis
    on a LARGE array is almost always a wrong spec or an odd head count
    that will OOM at scale, so it warns loudly instead of hiding it.
    """
    import math

    from chitu_tpu.utils import get_logger

    fixed = []
    for i, name in enumerate(spec):
        if i >= len(shape):
            break  # never emit spec axes beyond the array rank
        if name is None:
            fixed.append(None)
            continue
        size = _axis_size(mesh, name)
        if shape[i] % size == 0:
            fixed.append(name)
        else:
            fixed.append(None)
            if math.prod(shape) >= _REPLICATE_WARN_ELEMS:
                get_logger().warning(
                    "sharding: dropping axis %r on dim %d of shape %s "
                    "(not divisible by mesh size %d) — array REPLICATES "
                    "across that axis",
                    name, i, shape, size,
                )
    # spec may be shorter than rank; PartitionSpec pads with None
    return NamedSharding(mesh, P(*fixed))


def shard_params(params: Any, specs: Any, mesh: Optional[Mesh]) -> Any:
    """Place a parameter pytree according to a PartitionSpec pytree."""
    if mesh is None:
        return params

    def qtensor_aux_spec(data_ndim: int, spec: P, aux_ndim: int) -> P:
        """Spec for a QTensor's scale/zeros derived from the data spec.

        Blockwise / groupwise auxiliaries (fp8 [.., in/B, out(/B)], W4A16
        [.., in/G, out]) have the data's rank and the same dim semantics, so
        the data spec applies directly. Per-out-channel auxiliaries
        (W8A16/W8A8 scale [.., out]) drop the in dim: the spec keeps the
        leading axes and the out-dim axis only — a row-parallel weight
        (in dim sharded) then correctly *replicates* its scale instead of
        sharding the wrong dim."""
        entries = list(spec) + [None] * (data_ndim - len(spec))
        entries = entries[:data_ndim]
        if aux_ndim >= data_ndim:
            return P(*entries)
        # drop the second-to-last (in-features) axis
        dropped = entries[:-2] + [entries[-1]]
        return P(*dropped[:aux_ndim])

    def place(leaf, spec):
        from chitu_tpu.ops.qtensor import QTensor

        if isinstance(leaf, QTensor):
            data_sh = safe_named_sharding(mesh, spec, leaf.data.shape)
            s_spec = qtensor_aux_spec(leaf.data.ndim, spec, leaf.scale.ndim)
            scale_sh = safe_named_sharding(mesh, s_spec, leaf.scale.shape)
            zeros = None
            if leaf.zeros is not None:
                z_spec = qtensor_aux_spec(
                    leaf.data.ndim, spec, leaf.zeros.ndim
                )
                zeros = jax.device_put(
                    leaf.zeros,
                    safe_named_sharding(mesh, z_spec, leaf.zeros.shape),
                )
            def replicate(aux):
                # small per-weight side tensors needed whole on every
                # shard (activation-gather permutation, llmint8 outlier
                # channel ids + dense rows — dropping the latter would
                # silently zero the outlier correction term)
                if aux is None:
                    return None
                return jax.device_put(
                    aux, NamedSharding(mesh, P(*([None] * aux.ndim)))
                )

            return QTensor(
                data=jax.device_put(leaf.data, data_sh),
                scale=jax.device_put(leaf.scale, scale_sh),
                zeros=zeros,
                kind=leaf.kind,
                block=leaf.block,
                in_perm=replicate(leaf.in_perm),
                oc_idx=replicate(leaf.oc_idx),
                oc_w=replicate(leaf.oc_w),
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
