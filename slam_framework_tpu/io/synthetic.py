"""Synthetic stereo/mono sequence generator with exact ground truth.

The reference is only ever exercised on KITTI files; this module provides the
equivalent test/benchmark input without dataset access (SURVEY.md §4: module tests on
synthetic scenes with known geometry): a random landmark field rendered as textured
sprites (strong FAST corners), painter-sorted by depth, from a smooth KITTI-like
trajectory. Rendering is host-side numpy/cv2; it feeds the same entry points a KITTI
loader would.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import cv2
import numpy as np

from slam_framework_tpu.config import CameraConfig


@dataclasses.dataclass
class SyntheticWorld:
    cam: CameraConfig
    landmarks: np.ndarray    # (L, 3) world positions
    intensities: np.ndarray  # (L,) uint8 sprite base intensity
    sizes: np.ndarray        # (L,) physical sprite half-size (meters)
    offsets: np.ndarray      # (L, 2) inner-square offset fraction (asymmetry for
                             # stable intensity-centroid orientation)
    textures: np.ndarray     # (L, 8, 8) uint8 per-landmark pattern — makes each
                             # sprite corner DISTINCT under rotation-invariant rBRIEF
                             # (flat squares alias: all 4 corners match each other)
    poses: np.ndarray        # (F, 4, 4) ground-truth Tcw per frame
    timestamps: np.ndarray   # (F,)

    @property
    def num_frames(self) -> int:
        return len(self.poses)

    def baseline_shift(self) -> np.ndarray:
        """Right-camera pose offset: x shifted by +baseline in camera frame."""
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -self.cam.baseline  # Tcw_right = T_rl @ Tcw_left, t = (-b, 0, 0)
        return T

    def render(self, frame: int, right: bool = False) -> np.ndarray:
        Tcw = self.poses[frame]
        if right:
            Tcw = self.baseline_shift() @ Tcw
        return render_sprites(
            self.landmarks, self.intensities, self.sizes, self.offsets, self.textures,
            Tcw, self.cam
        )

    def stereo_pair(self, frame: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.render(frame, False), self.render(frame, True)

    def render_depth(self, frame: int) -> np.ndarray:
        """Registered depth map for the left camera (RGB-D sensor emulation):
        painter-sorted sprite squares filled with their camera-frame z."""
        cam = self.cam
        Tcw = self.poses[frame]
        depth = np.zeros((cam.height, cam.width), np.float32)
        Xc = (Tcw[:3, :3] @ self.landmarks.T).T + Tcw[:3, 3]
        z = Xc[:, 2]
        vis = z > 0.5
        u = cam.fx * Xc[:, 0] / np.where(vis, z, 1.0) + cam.cx
        v = cam.fy * Xc[:, 1] / np.where(vis, z, 1.0) + cam.cy
        half_px = cam.fx * self.sizes / np.where(vis, z, 1.0)
        vis &= (u > -40) & (u < cam.width + 40) & (v > -40) & (v < cam.height + 40)
        vis &= half_px >= 1.0
        order = np.argsort(-z[vis])
        for i in np.nonzero(vis)[0][order]:
            hp = min(int(half_px[i]), 40)
            x0, y0 = int(round(u[i])) - hp, int(round(v[i])) - hp
            xa, ya = max(x0, 0), max(y0, 0)
            xb, yb = min(x0 + 2 * hp + 1, cam.width), min(y0 + 2 * hp + 1, cam.height)
            if xb > xa and yb > ya:
                depth[ya:yb, xa:xb] = z[i]
        return depth

    def rgbd_pair(self, frame: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.render(frame, False), self.render_depth(frame)


def render_sprites(
    landmarks: np.ndarray,
    intensities: np.ndarray,
    sizes: np.ndarray,
    offsets: np.ndarray,
    textures: np.ndarray,
    Tcw: np.ndarray,
    cam: CameraConfig,
    bg: int = 90,
) -> np.ndarray:
    """Painter-sorted textured-square sprites. Returns (H, W) uint8."""
    img = np.full((cam.height, cam.width), bg, np.uint8)
    Xc = (Tcw[:3, :3] @ landmarks.T).T + Tcw[:3, 3]
    z = Xc[:, 2]
    vis = z > 0.5
    u = cam.fx * Xc[:, 0] / np.where(vis, z, 1.0) + cam.cx
    v = cam.fy * Xc[:, 1] / np.where(vis, z, 1.0) + cam.cy
    half_px = cam.fx * sizes / np.where(vis, z, 1.0)
    vis &= (u > -40) & (u < cam.width + 40) & (v > -40) & (v < cam.height + 40)
    vis &= half_px >= 1.0
    order = np.argsort(-z[vis])  # far first
    idx = np.nonzero(vis)[0][order]
    Hh, Ww = img.shape
    for i in idx:
        hp = min(int(half_px[i]), 40)
        side = 2 * hp + 1
        # subpixel paste: render the texture with its true fractional offset via a
        # single small warpAffine. Integer-quantized pasting adds +-0.5 px of
        # observation noise that does not exist in real imagery and destabilizes
        # rotation estimation at this toy image scale.
        x0f = u[i] - hp
        y0f = v[i] - hp
        x0, y0 = int(np.floor(x0f)), int(np.floor(y0f))
        fx_, fy_ = x0f - x0, y0f - y0
        sc = side / textures[i].shape[0]
        M = np.array([[sc, 0, fx_], [0, sc, fy_]], np.float32)
        out_side = side + 1
        tile = cv2.warpAffine(
            textures[i], M, (out_side, out_side),
            flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_TRANSPARENT,
            dst=np.full((out_side, out_side), -1, np.int16).astype(np.uint8),
        )
        # interior mask: skip the 1-px border the warp leaves partially blended
        xa, ya = max(x0 + 1, 0), max(y0 + 1, 0)
        xb, yb = min(x0 + out_side - 1, Ww), min(y0 + out_side - 1, Hh)
        if xb <= xa or yb <= ya:
            continue
        img[ya:yb, xa:xb] = tile[ya - y0 : yb - y0, xa - x0 : xb - x0]
    return img


def make_world(
    num_frames: int = 100,
    cam: CameraConfig | None = None,
    seed: int = 0,
    speed: float = 1.0,
    yaw_rate: float = 0.002,
    num_landmarks: int = 6000,
    corridor_half_width: float = 14.0,
) -> SyntheticWorld:
    """Forward motion with gentle constant yaw through a corridor of landmarks.

    Landmarks are scattered in a band around the trajectory: sides, ground and
    above-horizon, between 4 and 60 m from the path — KITTI-ish geometry.
    """
    cam = cam or CameraConfig()
    rng = np.random.default_rng(seed)

    # Ground-truth camera centers along an arc; camera looks along +z (world = first cam).
    poses = []
    yaw = 0.0
    center = np.zeros(3)
    ts = []
    for f in range(num_frames):
        R_wc = np.array(
            [
                [np.cos(yaw), 0, np.sin(yaw)],
                [0, 1, 0],
                [-np.sin(yaw), 0, np.cos(yaw)],
            ]
        )
        # Tcw = [R_wc^T, -R_wc^T c]
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R_wc.T
        T[:3, 3] = -R_wc.T @ center
        poses.append(T)
        ts.append(f / cam.fps)
        center = center + R_wc @ np.array([0.0, 0.0, speed])
        yaw += yaw_rate * speed
    poses = np.stack(poses)

    # Landmarks on corridor SURFACES (two walls + ground), not a free 3D cloud:
    # image-adjacent sprites must have locally-coherent depth, or descriptor patches
    # become view-dependent (parallax shuffles overlapping sprites) and stereo/temporal
    # matching degrades far below real-scene behavior.
    path = np.stack([np.linalg.inv(p)[:3, 3] for p in poses])
    seg = rng.integers(0, num_frames, num_landmarks)
    base = path[seg]
    surface = rng.choice(3, num_landmarks, p=[0.4, 0.4, 0.2])  # 0=left wall, 1=right, 2=ground
    lateral = np.where(
        surface == 0,
        -corridor_half_width,
        np.where(surface == 1, corridor_half_width, rng.uniform(-corridor_half_width, corridor_half_width, num_landmarks)),
    )
    height = np.where(
        surface == 2,
        1.65,  # ground plane below camera (y down)
        rng.uniform(-3.0, 1.4, num_landmarks),
    )
    ahead = rng.uniform(0.0, 30.0, num_landmarks)
    # local frame of that segment
    dirs = np.zeros((num_frames, 3))
    dirs[:-1] = path[1:] - path[:-1]
    dirs[-1] = dirs[-2]
    dirs /= np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-9)
    side = np.cross(np.array([0.0, 1.0, 0.0]), dirs[seg])
    lm = base + dirs[seg] * ahead[:, None] + side * lateral[:, None]
    lm[:, 1] = height  # y-down world: positive y below camera; mix above/below horizon
    intensities = rng.integers(10, 245, num_landmarks).astype(np.uint8)
    sizes = rng.uniform(0.05, 0.2, num_landmarks).astype(np.float32)
    # offset direction fixed per landmark, magnitude ~ half the sprite
    ang = rng.uniform(0, 2 * np.pi, num_landmarks)
    offsets = 0.45 * np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
    # Unique high-contrast BAND-LIMITED pattern per landmark (see
    # SyntheticWorld.textures). Raw pixel-noise textures alias under the
    # view-dependent magnification the renderer applies — descriptors
    # decorrelate within a few frames of motion (measured: ORB per-landmark
    # min-Hamming ~90 at a 5-frame gap, for OpenCV's extractor as much as
    # ours), which starves tracking in a way real imagery does not. Smoothing
    # the noise before contrast-stretching removes the frequencies above the
    # resampling band, so a landmark's appearance is stable across scale like
    # a real-world surface patch.
    raw = rng.normal(size=(num_landmarks, 16, 16)).astype(np.float32)
    k = cv2.getGaussianKernel(7, 1.8).astype(np.float32)
    kern = k @ k.T
    tex = np.stack([cv2.filter2D(t, -1, kern, borderType=cv2.BORDER_REFLECT) for t in raw])
    lo = tex.min(axis=(1, 2), keepdims=True)
    hi = tex.max(axis=(1, 2), keepdims=True)
    textures = (10 + 235 * (tex - lo) / np.maximum(hi - lo, 1e-6)).astype(np.uint8)

    return SyntheticWorld(
        cam=cam,
        landmarks=lm.astype(np.float32),
        intensities=intensities,
        sizes=sizes,
        offsets=offsets,
        textures=textures,
        poses=poses.astype(np.float32),
        timestamps=np.asarray(ts),
    )
