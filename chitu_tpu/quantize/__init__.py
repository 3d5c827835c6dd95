from chitu_tpu.quantize.transforms import (
    expand_fp8_scales_rowwise,
    is_packed_int4,
    pack_int4_storage,
    quantize_params,
    quantize_weight,
    requantize_fp8_storage, merge_moe_gate_up,
    unpack_int4_storage,
)
