"""Headless visualization (the TPU build's stand-in for the reference's
PangolinViewer, reference src/viewer/PangolinViewer.{h,cpp}).

The reference runs an OpenGL render thread (trajectory, current cloud,
keyframe axes, map points, surfel discs — PangolinViewer.h:107-156). A
TPU deployment is headless, so this module provides the same
observability as artifacts instead of a window:

  * `render_snapshot` — top-down PNG of map points + trajectory +
    keyframes (matplotlib, lazy-imported);
  * `ConsoleViewer` — the auto/step-mode frame loop controls
    (PangolinViewer.h:216-229) as a console progress line with optional
    step mode (press Enter to advance);
  * `export_state` — trajectory + map + surfels to PLY/CSV for external
    viewers (the reference's own docs recommend `evo` for trajectories).
"""
from __future__ import annotations

import os
import sys
from typing import Optional

import numpy as np

from .utils import logging_util as log


def render_snapshot(path: str, map_points: Optional[np.ndarray] = None,
                    trajectory: Optional[np.ndarray] = None,
                    keyframe_positions: Optional[np.ndarray] = None,
                    title: str = "lidar_odometry_tpu") -> bool:
    """Top-down (x, y) snapshot PNG. Returns False if matplotlib is
    unavailable (headless-minimal images)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        log.warn("[viewer] matplotlib unavailable; snapshot skipped")
        return False
    fig, ax = plt.subplots(figsize=(10, 10))
    if map_points is not None and len(map_points):
        ax.scatter(map_points[:, 0], map_points[:, 1], s=0.3, c=map_points[:, 2],
                   cmap="viridis", alpha=0.5, linewidths=0)
    if trajectory is not None and len(trajectory):
        xy = trajectory[:, :2, 3] if trajectory.ndim == 3 else trajectory[:, :2]
        ax.plot(xy[:, 0], xy[:, 1], "r-", linewidth=1.5, label="trajectory")
    if keyframe_positions is not None and len(keyframe_positions):
        ax.scatter(keyframe_positions[:, 0], keyframe_positions[:, 1],
                   s=18, c="k", marker="^", label="keyframes")
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title(title)
    ax.legend(loc="upper right")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    log.info("[viewer] snapshot saved: {}", path)
    return True


class ConsoleViewer:
    """Frame-loop controls mirroring the reference's auto/step modes
    (reference PangolinViewer.h:216-229, kitti_player.cpp:511-528)."""

    def __init__(self, step_mode: bool = False, print_every: int = 20):
        self.step_mode = step_mode
        self.print_every = print_every
        self._frame = 0

    def on_frame(self, pose: np.ndarray, n_points: int = 0,
                 n_keyframes: int = 0) -> bool:
        """Called once per processed frame; returns False to stop."""
        self._frame += 1
        if self._frame % self.print_every == 0 or self.step_mode:
            t = pose[:3, 3]
            sys.stderr.write(
                f"\r[frame {self._frame:5d}] pos=({t[0]:8.2f},{t[1]:8.2f},"
                f"{t[2]:6.2f}) pts={n_points:6d} kf={n_keyframes:4d}  ")
            sys.stderr.flush()
        if self.step_mode:
            try:
                line = input("  [step] Enter=next, q=quit: ")
                if line.strip().lower() == "q":
                    return False
            except EOFError:
                self.step_mode = False
        return True

    def finish(self):
        sys.stderr.write("\n")


def export_state(out_dir: str, estimator) -> None:
    """Dump everything the reference viewer showed: map PLY, trajectory
    CSV, keyframe poses, surfel centroids+normals."""
    from .io.ply import save_ply
    os.makedirs(out_dir, exist_ok=True)
    save_ply(os.path.join(out_dir, "map.ply"), estimator.map_points())
    traj = estimator.trajectory()
    np.savetxt(os.path.join(out_dir, "trajectory_xyz.csv"),
               traj[:, :3, 3], delimiter=",", header="x,y,z")
    with estimator._keyframes_lock:
        kf_pos = np.stack([kf.stored_pose[:3, 3] for kf in estimator.keyframes]) \
            if estimator.keyframes else np.zeros((0, 3))
    np.savetxt(os.path.join(out_dir, "keyframes_xyz.csv"), kf_pos, delimiter=",")

    # L1 surfels with normals + planarity (the reference viewer's
    # surfel-disc rendering data, PangolinViewer.h:131 / GetL1Surfels,
    # VoxelMap.cpp:405-418) — dumped for external inspection.
    from .ops.voxel_map import l1_surfels
    normals, centroids, planarity, valid = (
        np.asarray(a) for a in l1_surfels(estimator.map_state))
    v = np.asarray(valid, bool)
    surf = np.concatenate([centroids[v], normals[v],
                           planarity[v][:, None]], axis=1)
    np.savetxt(os.path.join(out_dir, "surfels.csv"), surf, delimiter=",",
               header="cx,cy,cz,nx,ny,nz,planarity")

    # Pre/post-ICP debug clouds of the last processed frame (the
    # reference viewer's update_icp_debug_clouds, PangolinViewer.h:137):
    # the same feature cloud transformed by the constant-velocity guess
    # vs the ICP-refined pose, for inspecting the last alignment.
    if (getattr(estimator, "_last_icp_guess", None) is not None
            and estimator._last_feat is not None):
        feat = np.asarray(estimator._last_feat)
        mask = np.asarray(estimator._last_mask, bool)
        pts = feat[mask]
        h = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
        pre = (h @ estimator._last_icp_guess.T)[:, :3]
        post = (h @ estimator.T_current.T)[:, :3]
        save_ply(os.path.join(out_dir, "debug_pre_icp.ply"), pre)
        save_ply(os.path.join(out_dir, "debug_post_icp.ply"), post)

    render_snapshot(os.path.join(out_dir, "snapshot.png"),
                    map_points=estimator.map_points(), trajectory=traj,
                    keyframe_positions=kf_pos)
