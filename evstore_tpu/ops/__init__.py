from evstore_tpu.ops.interaction import dot_interaction, cat_interaction  # noqa: F401
from evstore_tpu.ops.quant import (  # noqa: F401
    quantize_int8, dequantize_int8,
    quantize_ushort, dequantize_ushort,
    quantize_int4, dequantize_int4,
)
