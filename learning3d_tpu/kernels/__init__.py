"""Pallas TPU kernels for the pairwise-distance hot paths.

TPU-native replacements for the reference's three CUDA extension families
(SURVEY.md §2.2): Chamfer nearest-neighbor distance, EMD approxmatch, and
blockwise kNN. Every kernel has a pure-XLA twin used on CPU (tests) and as
a correctness oracle.
"""

from learning3d_tpu.kernels.chamfer import chamfer_distance, nn_distance  # noqa: F401
from learning3d_tpu.kernels.emd import approx_match, emd_loss  # noqa: F401
from learning3d_tpu.kernels.knn import knn_blocked  # noqa: F401
