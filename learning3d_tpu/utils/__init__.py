"""Model building blocks (flax.nnx modules + functional heads).

Capability parity with the reference's ``utils/`` layer (SURVEY.md §2.1,
utils/__init__.py:1-22): shared-MLP stacks, pooling, the DCP/PRNet
co-attention Transformer, the SVD Procrustes head, Sinkhorn, weighted
Kabsch, PointConv / CurveNet / pointnet2 blocks.
"""

from learning3d_tpu.utils.layers import MLP1d, MLP2d, Pooling  # noqa: F401
from learning3d_tpu.utils.pointnet2_modules import (  # noqa: F401
    GroupAll,
    PointnetFPModule,
    PointnetSAModule,
    PointnetSAModuleMSG,
    QueryAndGroup,
    SharedMLP,
)
from learning3d_tpu.utils.rigid import (  # noqa: F401
    kabsch,
    sinkhorn_log,
    weighted_kabsch,
)
from learning3d_tpu.utils.svd import SVDHead  # noqa: F401
from learning3d_tpu.utils.torch_import import (  # noqa: F401
    import_torch_state_dict,
    load_torch_checkpoint,
)
from learning3d_tpu.utils.transformer import Identity, Transformer  # noqa: F401
