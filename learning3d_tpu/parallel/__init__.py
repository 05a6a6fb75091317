"""Mesh & sharding layer — the distributed backend the reference never had
(SURVEY.md §2.3): device meshes over ICI/DCN, data-parallel sharding of
cloud batches, tensor sharding of wide MLP layers, and ring-sharded
pairwise ops for the long-"sequence" (large-N) story."""

from learning3d_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_module_params,
)
from learning3d_tpu.parallel.pipeline import pipeline_apply  # noqa: F401
from learning3d_tpu.parallel.ring import (  # noqa: F401
    ring_attention,
    ring_chamfer,
    ring_knn,
    sharded_square_distance,
)
