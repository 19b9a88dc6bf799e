"""Relocalization: BoW candidates → batched PnP RANSAC → motion-only BA.

TPU-native replacement for Tracker::Relocalization (reference:
src/core/tracker.cpp:826-991): on tracking loss, query the keyframe database for
BoW candidates (keyframe_database.cpp:179-299), match the lost frame's descriptors
against each candidate's map points (SearchByBoW, orb_matcher.cpp:133-262), solve
EPnP-RANSAC (pnp_solver.cpp — here batched-hypothesis DLT resection), refine with
motion-only BA, and accept at >= 50 inliers (tracker.cpp:977).

The reference round-robins 5 RANSAC iterations per candidate across a while-loop;
the TPU formulation runs all hypotheses of a candidate at once, so candidates are
simply tried best-score-first.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slam_framework_tpu.config import SlamConfig
from slam_framework_tpu.geometry.projection import Intrinsics
from slam_framework_tpu.map.arena import MapArena
from slam_framework_tpu.optim import pose_opt
from slam_framework_tpu.solvers import pnp


class RelocResult(NamedTuple):
    pose: np.ndarray        # (4,4) Tcw
    kf: int                 # matched keyframe
    feat_idx: np.ndarray    # frame feature indices with point associations
    point_ids: np.ndarray   # matching arena point ids
    n_inliers: int


class Relocalizer:
    MIN_BOW_MATCHES = 15    # tracker.cpp:905
    MIN_ACCEPT = 50         # tracker.cpp:977

    def __init__(self, cfg: SlamConfig, arena: MapArena, K: Intrinsics, place_rec):
        """place_rec: the LoopCloser (owns vocabulary, database, match kernels)."""
        self.cfg = cfg
        self.arena = arena
        self.K = K
        self.place_rec = place_rec
        self._key = jax.random.PRNGKey(11)
        self._jit_pnp = jax.jit(
            functools.partial(pnp.solve_pnp_ransac, K=K, min_inliers=10)
        )
        self._jit_pose_opt = jax.jit(functools.partial(pose_opt.optimize_pose, K=K))
        self._inv_sf2 = 1.0 / (
            cfg.orb.scale_factor ** (2.0 * np.arange(cfg.orb.num_levels))
        )

    def try_relocalize(self, fd_host: dict) -> Optional[RelocResult]:
        """fd_host: numpy feature block of the lost frame
        {xy (N,2), desc (N,8) u32, valid (N,), octave (N,), u_right (N,)}."""
        pr = self.place_rec
        if pr is None or pr.vocab is None:
            return None
        arena = self.arena
        N = fd_host["desc"].shape[0]

        word, _, weight = jax.device_get(
            pr._jit_bow(
                pr._tables, jnp.asarray(fd_host["desc"]), jnp.asarray(fd_host["valid"])
            )
        )[0:3]
        from slam_framework_tpu.bow.database import BowFrame

        bow = BowFrame(word, weight)
        candidates = pr.db.detect_relocalization_candidates(bow)
        if not candidates:
            return None
        # best BoW score first (the reference round-robins; scores order the tries)
        candidates = sorted(
            candidates, key=lambda c: -bow.score(pr.db.frames[c])
        )[:5]

        desc_f = jnp.asarray(fd_host["desc"])
        valid_f = jnp.asarray(fd_host["valid"])
        for cand in candidates:
            pid_c = arena.kf_point_idx[cand]
            mask_c = (pid_c >= 0) & arena.kf_feat_valid[cand]
            mask_c &= np.where(pid_c >= 0, arena.pt_valid[np.maximum(pid_c, 0)], False)
            idx, valid = jax.device_get(
                pr._jit_match(
                    desc_f, valid_f, jnp.asarray(arena.kf_desc[cand]), jnp.asarray(mask_c)
                )
            )
            rows = np.nonzero(valid)[0]
            if len(rows) < self.MIN_BOW_MATCHES:
                continue
            pids = pid_c[idx[rows]]

            pts_w = np.zeros((N, 3), np.float32)
            uv = np.zeros((N, 2), np.float32)
            inv_s2 = np.ones(N, np.float32)
            mask = np.zeros(N, bool)
            n = len(rows)
            pts_w[:n] = arena.pt_pos[pids]
            uv[:n] = fd_host["xy"][rows]
            inv_s2[:n] = self._inv_sf2[
                np.clip(fd_host["octave"][rows], 0, self.cfg.orb.num_levels - 1)
            ]
            mask[:n] = True

            self._key, sub = jax.random.split(self._key)
            res = self._jit_pnp(
                jnp.asarray(pts_w), jnp.asarray(uv), jnp.asarray(inv_s2),
                jnp.asarray(mask), key=sub,
            )
            ok = bool(jax.device_get(res.ok))
            if not ok:
                continue

            # motion-only BA on the PnP inliers (stereo rows where available)
            ur = np.full(N, -1.0, np.float32)
            ur[:n] = fd_host["u_right"][rows]
            inl = np.asarray(jax.device_get(res.inliers))
            obs = pose_opt.PoseObs(
                points_w=jnp.asarray(pts_w),
                uv=jnp.asarray(uv),
                ur=jnp.asarray(ur),
                inv_sigma2=jnp.asarray(inv_s2),
                mask=jnp.asarray(mask & inl),
            )
            opt = self._jit_pose_opt(res.pose, obs)
            pose, inliers, n_inl = jax.device_get(
                [opt.pose, opt.inliers, opt.num_inliers]
            )
            if int(n_inl) < self.MIN_ACCEPT:
                continue
            keep = inliers[:n]
            return RelocResult(
                pose=np.asarray(pose, np.float32),
                kf=int(cand),
                feat_idx=rows[keep],
                point_ids=pids[keep].astype(np.int32),
                n_inliers=int(n_inl),
            )
        return None
