"""Distributed Schur-complement bundle adjustment over a device mesh.

The multi-chip configuration mandated by SURVEY.md §5.8 / BASELINE.md: the reference
has no distributed backend (its "communication fabric" is mutexes inside one
process); the TPU-native design shards the BA problem's landmark/observation tensors
across a 1-D mesh and reduces the camera system over ICI:

  - partition: points are block-assigned to devices TOGETHER WITH all their
    observations (a point's normal-equation block and Schur contribution are then
    device-local — no cross-device gather in the inner loop);
  - cameras are replicated: the (C, 6) CG state and (C, 6, 6) preconditioner are
    identical on every device, maintained by psum-ing the per-shard partial
    reductions (optim/global_ba.py's `axis_name` hooks — 5 psums per LM iteration
    plus 1 per CG iteration, each <= C*27 floats: the all-reduce of the *reduced*
    camera system, never the raw observations);
  - the whole optimizer runs inside one jax.shard_map: XLA sees a single SPMD
    program and schedules the collectives on ICI.

Scaling model: per-device work is O(M/D) per CG iteration; the psum payload is
O(C). With M >> C·D (true for 100k-landmark maps) efficiency stays near-linear.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_framework_tpu.geometry.projection import Intrinsics
from slam_framework_tpu.optim import global_ba
from slam_framework_tpu.optim.global_ba import GlobalBAProblem, GlobalBAResult, _next_pow2


def shard_problem(prob: GlobalBAProblem, n_shards: int) -> GlobalBAProblem:
    """Repartition a (host-built) problem into n_shards device blocks.

    Points are dealt round-robin to shards (balances obs counts for maps whose
    density varies along the trajectory); each point carries its observations.
    Output arrays are the concatenation of equal-size shard blocks, ready to be
    device_put with a ('ba',)-sharded NamedSharding on axis 0.
    """
    pt_mask = np.asarray(prob.pt_mask)
    obs_mask = np.asarray(prob.obs_mask)
    obs_pt = np.asarray(prob.obs_pt)
    obs_cam = np.asarray(prob.obs_cam)
    pt_slots = np.asarray(prob.pt_obs_slots)
    C = prob.cam_pose.shape[0]
    O = pt_slots.shape[1]

    pids = np.nonzero(pt_mask)[0]
    owner_of = {}
    shard_pts = [[] for _ in range(n_shards)]
    for n_, p in enumerate(pids):
        s = n_ % n_shards
        shard_pts[s].append(p)
        owner_of[p] = s

    P_s = _next_pow2(max(max((len(sp) for sp in shard_pts), default=1), 1))
    # collect per-shard observations (a point's obs all go to its owner)
    shard_obs = [[] for _ in range(n_shards)]
    for s in range(n_shards):
        for p in shard_pts[s]:
            for o in pt_slots[p]:
                if o >= 0 and obs_mask[o]:
                    shard_obs[s].append((int(o), int(p)))
    M_s = _next_pow2(max(max((len(so) for so in shard_obs), default=1), 1))
    Oc_s = _next_pow2(
        max(
            max(
                (
                    int(np.bincount(
                        [obs_cam[o] for o, _ in so], minlength=C
                    ).max()) if so else 1
                )
                for so in shard_obs
            ),
            1,
        )
    )

    D = n_shards
    s_pt_pos = np.zeros((D * P_s, 3), np.float32)
    s_pt_mask = np.zeros(D * P_s, bool)
    s_obs_cam = np.zeros(D * M_s, np.int32)
    s_obs_pt = np.zeros(D * M_s, np.int32)
    s_obs_uv = np.zeros((D * M_s, 2), np.float32)
    s_obs_ur = np.full(D * M_s, -1.0, np.float32)
    s_obs_w = np.ones(D * M_s, np.float32)
    s_obs_mask = np.zeros(D * M_s, bool)
    s_pt_slots = np.full((D * P_s, O), -1, np.int32)
    s_cam_slots = np.full((D, C, Oc_s), -1, np.int32)

    pt_pos = np.asarray(prob.pt_pos)
    obs_uv = np.asarray(prob.obs_uv)
    obs_ur = np.asarray(prob.obs_ur)
    obs_w = np.asarray(prob.obs_inv_sigma2)

    for s in range(n_shards):
        local_pid = {p: i for i, p in enumerate(shard_pts[s])}
        base_p = s * P_s
        for p, i in local_pid.items():
            s_pt_pos[base_p + i] = pt_pos[p]
            s_pt_mask[base_p + i] = True
        base_m = s * M_s
        fill_p = np.zeros(P_s, np.int32)
        fill_c = np.zeros(C, np.int32)
        for mi, (o, p) in enumerate(shard_obs[s]):
            lp = local_pid[p]
            s_obs_cam[base_m + mi] = obs_cam[o]
            s_obs_pt[base_m + mi] = lp
            s_obs_uv[base_m + mi] = obs_uv[o]
            s_obs_ur[base_m + mi] = obs_ur[o]
            s_obs_w[base_m + mi] = obs_w[o]
            s_obs_mask[base_m + mi] = True
            s_pt_slots[base_p + lp, fill_p[lp]] = mi  # LOCAL obs index
            fill_p[lp] += 1
            c = obs_cam[o]
            s_cam_slots[s, c, fill_c[c]] = mi
            fill_c[c] += 1

    return GlobalBAProblem(
        cam_pose=prob.cam_pose,
        cam_fixed=prob.cam_fixed,
        cam_mask=prob.cam_mask,
        pt_pos=jnp.asarray(s_pt_pos),
        pt_mask=jnp.asarray(s_pt_mask),
        obs_cam=jnp.asarray(s_obs_cam),
        obs_pt=jnp.asarray(s_obs_pt),
        obs_uv=jnp.asarray(s_obs_uv),
        obs_ur=jnp.asarray(s_obs_ur),
        obs_inv_sigma2=jnp.asarray(s_obs_w),
        obs_mask=jnp.asarray(s_obs_mask),
        pt_obs_slots=jnp.asarray(s_pt_slots),
        cam_obs_slots=jnp.asarray(s_cam_slots),
    )


def optimize_global_sharded(
    sharded: GlobalBAProblem,
    mesh: Mesh,
    K: Intrinsics,
    iters_first: int = 5,
    iters_second: int = 10,
    cg_iters: int = 60,
) -> GlobalBAResult:
    """Run optimize_global as one SPMD program over mesh axis 'ba'.

    `sharded` must come from shard_problem with n_shards == mesh size. Camera
    outputs are replicated; point/obs outputs are shard-concatenated like the
    inputs.
    """
    axis = mesh.axis_names[0]
    shard = P(axis)
    repl = P()
    in_specs = GlobalBAProblem(
        cam_pose=repl, cam_fixed=repl, cam_mask=repl,
        pt_pos=shard, pt_mask=shard,
        obs_cam=shard, obs_pt=shard, obs_uv=shard, obs_ur=shard,
        obs_inv_sigma2=shard, obs_mask=shard,
        pt_obs_slots=shard, cam_obs_slots=shard,
    )
    out_specs = GlobalBAResult(
        cam_pose=repl, pt_pos=shard, obs_inlier=shard, chi2=shard, total_chi2=repl,
    )

    def body(p: GlobalBAProblem) -> GlobalBAResult:
        # inside shard_map, the leading axis block of cam_obs_slots is (1, C, Oc)
        p = p._replace(cam_obs_slots=p.cam_obs_slots[0])
        return global_ba.optimize_global(
            p, K=K, iters_first=iters_first, iters_second=iters_second,
            cg_iters=cg_iters, axis_name=axis,
        )

    fn = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs)
    )
    return fn(sharded)


def run_global_ba_dist(arena, cfg, K: Intrinsics, mesh: Mesh,
                       iters: Tuple[int, int] = (5, 10)) -> dict:
    """Full-map distributed BA + write-back: build, shard, solve over the mesh."""
    prob, cams, pids = global_ba.build_global_problem(arena, cfg)
    n = mesh.devices.size
    sharded = shard_problem(prob, n)
    res = optimize_global_sharded(sharded, mesh, K, iters_first=iters[0], iters_second=iters[1])
    new_cam = np.asarray(jax.device_get(res.cam_pose))
    new_pt = np.asarray(jax.device_get(res.pt_pos))
    s_mask = np.asarray(jax.device_get(sharded.pt_mask))
    fixed = np.asarray(jax.device_get(prob.cam_fixed))
    for i, c in enumerate(cams):
        if not fixed[i]:
            arena.kf_pose[c] = new_cam[i]
    # un-shard point positions: shard order is round-robin over `pids`
    P_s = new_pt.shape[0] // n
    for n_, p in enumerate(pids):
        s = n_ % n
        i = n_ // n
        assert s_mask[s * P_s + i]
        arena.pt_pos[p] = new_pt[s * P_s + i]
    return {
        "cams": len(cams),
        "points": len(pids),
        "devices": n,
        "chi2": float(jax.device_get(res.total_chi2)),
    }
