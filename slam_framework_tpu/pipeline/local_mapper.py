"""Local mapping stage: point culling + local BA around each new keyframe.

TPU-native replacement for the LocalMapper thread
(reference: src/core/local_mapper.{h,cpp}): MapPointCulling (:232-256),
Optimizer::LocalBundleAdjustment (optimizer.cpp:413-716), KeyFrameCulling (:556-613).
Triangulation of new points between keyframes (CreateNewMapPoints :258-492) is less
critical for stereo (depth comes from the stereo head); it lands with the mono
pipeline. SearchInNeighbors-style fusion is implemented as position+descriptor
duplicate merging after BA.

Runs synchronously per keyframe on the host thread; the BA itself is one jitted
fixed-shape device program (optim/local_ba.py). In the reference this stage runs in
its own thread with a queue — here the bounded-staleness comes from the tracker's
sync lag instead (see pipeline/tracker.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from slam_framework_tpu.config import SlamConfig
from slam_framework_tpu.geometry.projection import Intrinsics
from slam_framework_tpu.map.arena import MapArena
from slam_framework_tpu.optim import local_ba


class LocalMapper:
    def __init__(self, cfg: SlamConfig, arena: MapArena, K: Intrinsics):
        self.cfg = cfg
        self.arena = arena
        self.K = K
        self.recent_points: list[tuple[int, int]] = []  # (pid, created_at_kf)
        self._jit_ba = jax.jit(
            functools.partial(
                local_ba.optimize,
                K=K,
                iters_first=cfg.mapping.local_ba_iters_first,
                iters_second=cfg.mapping.local_ba_iters_second,
            )
        )
        self.last_ba_stats: dict = {}

    def note_new_points(self, pids, kf: int) -> None:
        self.recent_points.extend((int(p), kf) for p in np.atleast_1d(pids))

    # ------------------------------------------------------------------ main entry

    def process_keyframe(self, kf: int) -> None:
        """ProcessNewKeyFrame + culling + local BA (local_mapper.cpp:27-87 loop)."""
        self._cull_points(kf)
        self._local_ba(kf)

    # ------------------------------------------------------------------ culling

    def _cull_points(self, current_kf: int) -> None:
        """MapPointCulling (local_mapper.cpp:232-256): drop recent points with a bad
        found/visible ratio or too few observations after 2 keyframes."""
        arena = self.arena
        keep: list[tuple[int, int]] = []
        for pid, born_kf in self.recent_points:
            if not arena.pt_valid[pid]:
                continue
            age = current_kf - born_kf
            ratio = arena.pt_n_found[pid] / max(int(arena.pt_n_visible[pid]), 1)
            if ratio < self.cfg.mapping.point_cull_found_ratio and age >= 1:
                arena.erase_point(pid)
            elif age >= 2 and arena.pt_obs_count[pid] <= 1:
                # reference uses obs<=3 here (local_mapper.cpp:246-251) with per-frame
                # observation accrual; our keyframes sync with a lag, so observations
                # accrue slower — require only that SOME second view confirmed the point.
                arena.erase_point(pid)
            elif age >= 3:
                pass  # survived probation (reference erases from the check list)
            else:
                keep.append((pid, born_kf))
        self.recent_points = keep

    # ------------------------------------------------------------------ local BA

    def _local_ba(self, kf: int) -> None:
        cfg = self.cfg
        arena = self.arena
        cap = cfg.capacity

        # Camera window: this KF + covisible, then fixed boundary cams (optimizer.cpp:416-460)
        window = [kf] + list(
            arena.covisible_keyframes(kf, min_shared=cfg.mapping.covisibility_edge_min)
        )
        window = window[: max(cap.ba_cams - 8, 1)]
        window_set = set(int(k) for k in window)

        # Points observed by window cams
        pid_set = arena.kf_point_idx[np.asarray(window, np.int64)].reshape(-1)
        pid_set = np.unique(pid_set[pid_set >= 0])
        pid_set = pid_set[arena.pt_valid[pid_set]]
        if len(pid_set) > cap.ba_points:
            # keep the most-observed points
            order = np.argsort(-arena.pt_obs_count[pid_set], kind="stable")
            pid_set = pid_set[order[: cap.ba_points]]
        if len(pid_set) == 0 or len(window) < 2:
            return

        # Boundary: cams observing these points but outside the window -> fixed
        obs_kf = arena.pt_obs_kf[pid_set]  # (n, O)
        flat = np.unique(obs_kf[obs_kf >= 0])
        boundary = [int(k) for k in flat if int(k) not in window_set and arena.kf_valid[k]]
        boundary = boundary[: cap.ba_cams - len(window)]
        cams = window + boundary
        cam_lookup = {int(c): i for i, c in enumerate(cams)}

        C, P, M, O = cap.ba_cams, cap.ba_points, cap.ba_obs, cap.ba_obs_per_point
        cam_pose = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
        cam_pose[: len(cams)] = arena.kf_pose[np.asarray(cams, np.int64)]
        cam_fixed = np.ones(C, bool)
        cam_fixed[: len(window)] = False
        # always fix the oldest cam in the problem to anchor the gauge (reference fixes
        # kf id 0 / boundary cams; with no boundary the window's oldest is pinned)
        if not boundary:
            cam_fixed[int(np.argmin([arena.kf_frame_id[c] for c in cams]))] = True
        cam_mask = np.zeros(C, bool)
        cam_mask[: len(cams)] = True

        pt_pos = np.zeros((P, 3), np.float32)
        pt_pos[: len(pid_set)] = arena.pt_pos[pid_set]
        pt_mask = np.zeros(P, bool)
        pt_mask[: len(pid_set)] = True

        # Observations from the per-point obs table (fully vectorized: the python
        # loop version cost ~200 ms per keyframe at KITTI scale)
        inv_sf2 = 1.0 / (cfg.orb.scale_factor ** (2.0 * np.arange(cfg.orb.num_levels)))
        kf_to_cam = np.full(arena.num_kfs, -1, np.int32)
        for i, c in enumerate(cams):
            kf_to_cam[c] = i
        obs_kf_tab = arena.pt_obs_kf[pid_set][:, :O]     # (P', O) capped fan-in
        obs_ft_tab = arena.pt_obs_feat[pid_set][:, :O]
        valid_tab = obs_kf_tab >= 0
        cam_tab = np.where(valid_tab, kf_to_cam[np.maximum(obs_kf_tab, 0)], -1)
        valid_tab &= cam_tab >= 0
        # flat order: point-major; rank within point = slot index
        flat_valid = valid_tab.reshape(-1)
        sel = np.nonzero(flat_valid)[0][:M]
        m = len(sel)
        pi_flat = (sel // O).astype(np.int32)
        kf_flat = obs_kf_tab.reshape(-1)[sel]
        ft_flat = obs_ft_tab.reshape(-1)[sel]
        obs_cam = np.zeros(M, np.int32)
        obs_pt = np.zeros(M, np.int32)
        obs_uv = np.zeros((M, 2), np.float32)
        obs_ur = np.full(M, -1.0, np.float32)
        obs_w = np.ones(M, np.float32)
        obs_mask = np.zeros(M, bool)
        obs_cam[:m] = cam_tab.reshape(-1)[sel]
        obs_pt[:m] = pi_flat
        obs_uv[:m] = arena.kf_xy[kf_flat, ft_flat]
        obs_ur[:m] = arena.kf_ur[kf_flat, ft_flat]
        obs_w[:m] = inv_sf2[
            np.clip(arena.kf_octave[kf_flat, ft_flat], 0, cfg.orb.num_levels - 1)
        ]
        obs_mask[:m] = True
        # per-point slot lists: rank of each obs within its point
        rank = (np.cumsum(valid_tab, axis=1) - 1).reshape(-1)[sel]
        pt_slots = np.full((P, O), -1, np.int32)
        pt_slots[pi_flat, rank] = np.arange(m, dtype=np.int32)

        prob = local_ba.BAProblem(
            cam_pose=jnp.asarray(cam_pose),
            cam_fixed=jnp.asarray(cam_fixed),
            cam_mask=jnp.asarray(cam_mask),
            pt_pos=jnp.asarray(pt_pos),
            pt_mask=jnp.asarray(pt_mask),
            obs_cam=jnp.asarray(obs_cam),
            obs_pt=jnp.asarray(obs_pt),
            obs_uv=jnp.asarray(obs_uv),
            obs_ur=jnp.asarray(obs_ur),
            obs_inv_sigma2=jnp.asarray(obs_w),
            obs_mask=jnp.asarray(obs_mask),
            pt_obs_slots=jnp.asarray(pt_slots),
        )
        res = self._jit_ba(prob)
        new_cam, new_pt, inlier = jax.device_get([res.cam_pose, res.pt_pos, res.obs_inlier])

        # Write back free cameras and all points
        for i, c in enumerate(cams):
            if not cam_fixed[i]:
                arena.kf_pose[c] = new_cam[i]
        arena.pt_pos[pid_set] = new_pt[: len(pid_set)]

        # Erase outlier observations (optimizer.cpp:670-704)
        bad = np.nonzero(obs_mask[:m] & ~inlier[:m])[0]
        n_erased = len(bad)
        for mi in bad:
            pid = int(pid_set[pi_flat[mi]])
            k, f = int(kf_flat[mi]), int(ft_flat[mi])
            if arena.kf_point_idx[k, f] == pid:
                arena.kf_point_idx[k, f] = -1
            arena._remove_observation(pid, k)
            if arena.pt_obs_count[pid] <= 1:
                arena.erase_point(pid)
        self.last_ba_stats = {
            "cams": len(cams),
            "fixed": int(cam_fixed[: len(cams)].sum()),
            "points": len(pid_set),
            "obs": m,
            "outliers": n_erased,
        }
