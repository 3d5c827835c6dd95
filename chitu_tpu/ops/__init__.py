from chitu_tpu.ops.qtensor import QTensor, QuantKind
from chitu_tpu.ops.linear import linear
