"""Reference-named ops surface (/root/reference/ops/*.py): the se3/so3/
sinc/quaternion/invmat modules are importable as ``learning3d.ops.se3``
etc. (registered in sys.modules below), and ``transform_functions``
aliases the TPU transforms module."""

import sys

import learning3d_tpu.ops.invmat as invmat  # noqa: F401
import learning3d_tpu.ops.quaternion as quaternion  # noqa: F401
import learning3d_tpu.ops.se3 as se3  # noqa: F401
import learning3d_tpu.ops.sinc as sinc  # noqa: F401
import learning3d_tpu.ops.so3 as so3  # noqa: F401
import learning3d_tpu.ops.transforms as transform_functions  # noqa: F401

for _name, _mod in [
    ("se3", se3), ("so3", so3), ("sinc", sinc), ("quaternion", quaternion),
    ("invmat", invmat), ("transform_functions", transform_functions),
]:
    sys.modules[f"{__name__}.{_name}"] = _mod

__all__ = ["se3", "so3", "sinc", "quaternion", "invmat", "transform_functions"]
