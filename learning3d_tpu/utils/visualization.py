"""Point-cloud visualization.

The reference's test scripts use open3d windows (display_open3d,
examples/test_dcp.py:31-41). open3d isn't part of this stack's baked
environment, so the default backend is matplotlib (save-to-file friendly
for headless TPU hosts); open3d is used when importable.
"""

from __future__ import annotations

import numpy as np

_COLORS = [(0.1, 0.4, 0.9), (0.9, 0.3, 0.1), (0.2, 0.8, 0.2), (0.6, 0.2, 0.8)]


def display_clouds(*clouds, labels=None, save_path=None, s=2.0):
    """Render up to 4 clouds ((N, 3) arrays) together.

    With open3d available and no save_path, opens an interactive window
    (reference behavior); otherwise renders via matplotlib, returning the
    figure (and writing save_path if given).
    """
    clouds = [np.asarray(c).reshape(-1, 3) for c in clouds]
    if save_path is None:
        try:
            import open3d as o3d

            geoms = []
            for i, c in enumerate(clouds):
                p = o3d.geometry.PointCloud()
                p.points = o3d.utility.Vector3dVector(c.astype(np.float64))
                p.paint_uniform_color(list(_COLORS[i % len(_COLORS)]))
                geoms.append(p)
            o3d.visualization.draw_geometries(geoms)
            return None
        except ImportError:
            pass

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    for i, c in enumerate(clouds):
        name = labels[i] if labels else f"cloud {i}"
        ax.scatter(c[:, 0], c[:, 1], c[:, 2], s=s, color=_COLORS[i % len(_COLORS)], label=name)
    ax.legend()
    ax.set_box_aspect((1, 1, 1))
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


# Reference-compatible alias (examples/test_dcp.py:31).
display_open3d = display_clouds
