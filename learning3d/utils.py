"""Reference-named utils surface (/root/reference/utils/__init__.py:1-23)."""

from learning3d_tpu.models.pointconv import PointConvDensitySetAbstraction  # noqa: F401
from learning3d_tpu.ops.geometry import (  # noqa: F401
    angle_difference,
    farthest_point_sample,
    get_graph_feature,
    index_points,
    knn,
    knn_point,
    pc_normalize,
    query_ball_point,
    square_distance,
)
from learning3d_tpu.ops.grouping import (  # noqa: F401
    sample_and_group,
    sample_and_group_multi,
)
from learning3d_tpu.utils.svd import SVDHead  # noqa: F401
from learning3d_tpu.utils.transformer import Identity, Transformer  # noqa: F401

__all__ = [
    "SVDHead", "Transformer", "Identity", "angle_difference",
    "square_distance", "index_points", "farthest_point_sample",
    "query_ball_point", "sample_and_group", "sample_and_group_multi",
    "knn", "pc_normalize", "knn_point", "get_graph_feature",
    "PointConvDensitySetAbstraction",
]
