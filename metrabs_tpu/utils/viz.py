"""First-party pose visualization (2D overlays + matplotlib 3D scenes).

The reference delegates 3D visualization to the author's external `poseviz`
package (OpenGL, interactive); for a dependency-free equivalent this module
renders 2D skeleton overlays with cv2 and static 3D scenes with matplotlib —
enough for the demo/debug role the `--viz` flags play in the inference
scripts (`predict_tdpw.py:37,61` etc.).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

_COLORS = [(0, 200, 80), (230, 80, 0), (0, 120, 230), (200, 0, 180),
           (220, 180, 0), (0, 200, 200)]


def draw_poses_2d(image: np.ndarray, poses2d: np.ndarray,
                  edges: Sequence[Tuple[int, int]],
                  valid: Optional[np.ndarray] = None,
                  thickness: int = 2) -> np.ndarray:
    """Skeleton overlay: [P, J, 2] image-space poses onto an RGB uint8 image."""
    import cv2
    out = np.ascontiguousarray(image).copy()
    for p, pose in enumerate(np.asarray(poses2d)):
        if valid is not None and not valid[p]:
            continue
        color = _COLORS[p % len(_COLORS)]
        for i, j in edges:
            if np.any(~np.isfinite(pose[[i, j]])):
                continue
            cv2.line(out, tuple(np.round(pose[i]).astype(int)),
                     tuple(np.round(pose[j]).astype(int)), color, thickness)
        for pt in pose:
            if np.all(np.isfinite(pt)):
                cv2.circle(out, tuple(np.round(pt).astype(int)),
                           thickness + 1, (255, 255, 255), -1)
    return out


def plot_poses_3d(poses3d: np.ndarray, edges: Sequence[Tuple[int, int]],
                  out_path: Optional[str] = None,
                  valid: Optional[np.ndarray] = None,
                  world_up: Sequence[float] = (0, -1, 0),
                  image: Optional[np.ndarray] = None,
                  poses2d: Optional[np.ndarray] = None):
    """Static 3D scene of [P, J, 3] millimeter poses; optionally a side panel
    with the input image + 2D overlay. With `out_path` the figure is saved
    AND closed (None is returned) — safe in per-frame loops; without it the
    open figure is returned and the caller owns closing/showing it. The
    global backend is never switched: headless matplotlib already
    auto-selects Agg, and forcing it would break interactive sessions."""
    import matplotlib.pyplot as plt

    poses3d = np.asarray(poses3d)
    if poses3d.ndim == 2:
        poses3d = poses3d[None]
    fig = plt.figure(figsize=(12, 6) if image is not None else (6, 6))
    if image is not None:
        ax_im = fig.add_subplot(1, 2, 1)
        shown = image
        if poses2d is not None:
            shown = draw_poses_2d(image, poses2d, edges, valid)
        ax_im.imshow(shown)
        ax_im.axis('off')
        ax = fig.add_subplot(1, 2, 2, projection='3d')
    else:
        ax = fig.add_subplot(1, 1, 1, projection='3d')

    up = np.asarray(world_up, np.float32)
    # Plot in a y-up-ish frame: matplotlib z is up; map world_up to +z.
    for p, pose in enumerate(poses3d):
        if valid is not None and not valid[p]:
            continue
        color = np.asarray(_COLORS[p % len(_COLORS)]) / 255.0
        x, y, z = pose[:, 0], pose[:, 2], -pose[:, 1] if up[1] < 0 \
            else pose[:, 1]
        for i, j in edges:
            if np.any(~np.isfinite(pose[[i, j]])):
                continue
            ax.plot([x[i], x[j]], [y[i], y[j]], [z[i], z[j]],
                    color=color, linewidth=2)
        ax.scatter(x, y, z, color=color, s=8)
    ax.set_xlabel('x (mm)')
    ax.set_ylabel('depth (mm)')
    ax.set_zlabel('up (mm)')
    try:
        ax.set_box_aspect((1, 1, 1))
    except AttributeError:
        pass
    if out_path:
        fig.savefig(out_path, dpi=110, bbox_inches='tight')
        plt.close(fig)
        return None
    return fig
