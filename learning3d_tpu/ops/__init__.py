"""Numerics + geometry core: pure-functional, jit/vmap/shard-friendly."""

from learning3d_tpu.ops import (  # noqa: F401
    geometry,
    grouping,
    invmat,
    mean_shift,
    quaternion,
    se3,
    sinc,
    so3,
    transforms,
)
from learning3d_tpu.ops.geometry import (  # noqa: F401
    farthest_point_sample,
    get_graph_feature,
    get_rri,
    index_points,
    knn,
    knn_point,
    query_ball_point,
    square_distance,
    three_interpolate,
    three_nn,
)
from learning3d_tpu.ops.grouping import (  # noqa: F401
    compute_density,
    sample_and_group,
    sample_and_group_all,
    sample_and_group_knn,
    sample_and_group_multi,
)
from learning3d_tpu.ops.sinc import sinc1, sinc2, sinc3, sinc4  # noqa: F401
