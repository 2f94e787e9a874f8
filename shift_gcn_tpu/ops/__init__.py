from shift_gcn_tpu.ops.aggregate import (  # noqa: F401
    dense_graph_aggregate,
    edge_aggregate,
    edge_aggregate_onehot,
)
from shift_gcn_tpu.ops.batchnorm import batch_norm, init_bn  # noqa: F401
from shift_gcn_tpu.ops.conv import pointwise_conv, temporal_conv  # noqa: F401
from shift_gcn_tpu.ops.spatial_shift import (  # noqa: F401
    shift_gcn_transform,
    shift_indices,
    spatial_shift,
    spatial_shift_onehot,
)
from shift_gcn_tpu.ops.temporal_shift import (  # noqa: F401
    temporal_shift,
    temporal_shift_inference,
)
from shift_gcn_tpu.ops.pallas.shift_gcn_kernel import (  # noqa: F401
    fused_shift_gcn,
)
