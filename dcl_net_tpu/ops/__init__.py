from dcl_net_tpu.ops.voxelize import (  # noqa: F401
    voxelize,
    voxelize_dense,
    point_to_voxel_index,
    point_recover,
)
from dcl_net_tpu.ops.sparse_conv import (  # noqa: F401
    dilate_mask,
    sparse_avg_pool,
    sparse_conv_transpose,
    sparse_inverse_conv,
    sparse_max_pool,
    masked_batch_norm_stats,
    dense_to_sparse,
)
from dcl_net_tpu.ops.knn import (  # noqa: F401
    knn,
    three_nn,
    three_interpolate,
    nearest_neighbor_interpolate,
    furthest_point_sample,
    ball_query,
    grouping_operation,
    gather_operation,
)
from dcl_net_tpu.ops.grid_interp import local_grid_interpolate  # noqa: F401
from dcl_net_tpu.ops.pallas_interp import pallas_nn_interpolate  # noqa: F401
