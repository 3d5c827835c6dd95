from chitu_tpu.quantize.transforms import (
    quantize_params,
    quantize_weight,
    requantize_fp8_storage,
)
