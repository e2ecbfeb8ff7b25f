"""Synthetic LiDAR world + scan generator.

The reference has no test data in-tree; this module provides a structured
planar world (ground + building facades — the geometry the surfel map is
designed for) and simulated scans along a trajectory, used by the
integration tests and by bench.py when no KITTI data is available.
Scans are sensor-frame point sets sampled from world surfaces within
range, with configurable noise — enough to exercise voxel filtering,
surfel extraction, ICP convergence, loop closure, and PGO end-to-end.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class Rect:
    origin: np.ndarray  # (3,)
    u: np.ndarray       # (3,) edge vector
    v: np.ndarray       # (3,) edge vector

    @property
    def area(self) -> float:
        return float(np.linalg.norm(np.cross(self.u, self.v)))


def make_world(seed: int = 0, extent: float = 120.0, n_buildings: int = 24) -> List[Rect]:
    """Ground plane + random axis-aligned building walls in [-extent, extent]^2.

    The ground is tiled (20 m tiles) so that distance-weighted scan
    sampling balances it fairly against nearby walls — one giant rect
    would swallow the sampling budget and leave x/y/yaw unobservable.
    """
    rng = np.random.default_rng(seed)
    rects: List[Rect] = []
    tile = 20.0
    n_tiles = max(int(np.ceil(2 * extent / tile)), 1)
    for i in range(n_tiles):
        for j in range(n_tiles):
            rects.append(Rect(
                np.array([-extent + i * tile, -extent + j * tile, 0.0]),
                np.array([tile, 0.0, 0.0]),
                np.array([0.0, tile, 0.0])))
    for _ in range(n_buildings):
        cx, cy = rng.uniform(-extent * 0.9, extent * 0.9, 2)
        w, d, h = rng.uniform(5, 15), rng.uniform(5, 15), rng.uniform(4, 10)
        # keep a clear corridor along the x axis for the trajectory
        if abs(cy) < 6.0:
            cy = np.sign(cy or 1.0) * (6.0 + abs(cy))
        x0, y0 = cx - w / 2, cy - d / 2
        rects += [
            Rect(np.array([x0, y0, 0.0]), np.array([w, 0, 0]), np.array([0, 0, h])),
            Rect(np.array([x0, y0 + d, 0.0]), np.array([w, 0, 0]), np.array([0, 0, h])),
            Rect(np.array([x0, y0, 0.0]), np.array([0, d, 0]), np.array([0, 0, h])),
            Rect(np.array([x0 + w, y0, 0.0]), np.array([0, d, 0]), np.array([0, 0, h])),
        ]
    return rects


def straight_trajectory(n_frames: int, step: float = 0.5, height: float = 1.8) -> np.ndarray:
    """(F, 4, 4) poses moving along +x."""
    poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    poses[:, 0, 3] = np.arange(n_frames) * step
    poses[:, 2, 3] = height
    return poses


def loop_trajectory(n_frames: int, radius: float = 40.0, height: float = 1.8,
                    revolutions: float = 1.05) -> np.ndarray:
    """(F, 4, 4) circular trajectory that closes a loop (for loop-closure
    and PGO tests)."""
    poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    theta = np.linspace(0, 2 * np.pi * revolutions, n_frames)
    for i, th in enumerate(theta):
        c, s = np.cos(th), np.sin(th)
        # heading tangent to the circle
        poses[i, :3, :3] = np.array([[-s, -c, 0], [c, -s, 0], [0, 0, 1]], np.float32)
        poses[i, 0, 3] = radius * c
        poses[i, 1, 3] = radius * s
        poses[i, 2, 3] = height
    return poses


def circuit_trajectory(n_frames: int, length: float = 120.0,
                       radius: float = 25.0, step: float = 0.65,
                       height: float = 1.8) -> np.ndarray:
    """(F, 4, 4) stadium-circuit poses (two straights + two semicircular
    ends), driven for as many laps as n_frames*step covers. KITTI-07-shaped
    workload: rotation-rich corners and full-trajectory revisits on every
    lap after the first (the hard accuracy benchmark of the round-1
    verdict). Heading is tangent to the path."""
    half = length / 2.0
    per = 2.0 * length + 2.0 * np.pi * radius
    poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    for i in range(n_frames):
        s = (i * step) % per
        if s < length:                      # bottom straight, heading +x
            x, y, phi = -half + s, -radius, 0.0
        elif s < length + np.pi * radius:   # right semicircle
            a = (s - length) / radius
            x = half + radius * np.sin(a)
            y = -radius * np.cos(a)
            phi = a
        elif s < 2 * length + np.pi * radius:  # top straight, heading -x
            x, y, phi = half - (s - length - np.pi * radius), radius, np.pi
        else:                               # left semicircle
            a = (s - 2 * length - np.pi * radius) / radius
            x = -half - radius * np.sin(a)
            y = radius * np.cos(a)
            phi = np.pi + a
        c, sn = np.cos(phi), np.sin(phi)
        poses[i, :3, :3] = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1]],
                                    np.float32)
        poses[i, 0, 3] = x
        poses[i, 1, 3] = y
        poses[i, 2, 3] = height
    return poses


def sample_scan(world: List[Rect], pose: np.ndarray, n_points: int,
                rng: np.random.Generator, max_range: float = 60.0,
                noise: float = 0.01, wall_boost: float = 4.0) -> np.ndarray:
    """Sample a sensor-frame scan: world-surface points within max_range of
    the sensor, area-weighted across surfaces, with Gaussian noise.

    `wall_boost` over-weights vertical surfaces: a spinning LiDAR
    concentrates beams near the horizon, so walls are sampled far more
    densely than the ground per unit area — without it, surfel maps lack
    the vertical constraints that make x/y/yaw observable.
    """
    sensor = pose[:3, 3]
    areas = np.array([r.area for r in world])
    # bias sampling toward surfaces near the sensor
    centers = np.stack([r.origin + 0.5 * (r.u + r.v) for r in world])
    d = np.linalg.norm(centers - sensor[None, :], axis=-1)
    normals_z = np.array([abs(np.cross(r.u, r.v)[2]) / max(r.area, 1e-9)
                          for r in world])
    vertical = normals_z < 0.5
    weights = areas / np.maximum(d, 5.0) ** 2
    weights = np.where(vertical, weights * wall_boost, weights)
    weights /= weights.sum()

    pts = np.zeros((0, 3), np.float32)
    for _ in range(8):
        need = n_points - len(pts)
        if need <= 0:
            break
        k = max(need * 2, 1024)
        ridx = rng.choice(len(world), size=k, p=weights)
        a = rng.random(k)[:, None]
        b = rng.random(k)[:, None]
        cand = np.stack([world[i].origin for i in ridx]) \
            + a * np.stack([world[i].u for i in ridx]) \
            + b * np.stack([world[i].v for i in ridx])
        keep = np.linalg.norm(cand - sensor[None, :], axis=-1) < max_range
        pts = np.concatenate([pts, cand[keep].astype(np.float32)])
    pts = pts[:n_points]
    if noise > 0:
        pts = pts + rng.standard_normal(pts.shape).astype(np.float32) * noise
    # world -> sensor frame
    R, t = pose[:3, :3], pose[:3, 3]
    return ((pts - t) @ R).astype(np.float32)
