"""Sim3 pose-graph optimization tests (optim/pose_graph.py).

Mirrors the role of Optimizer::OptimizeEssentialGraph (reference:
src/optimizer/optimizer.cpp:718-960): given drift-corrupted keyframe poses, exact
relative-pose measurements along the trajectory plus one loop-closure edge must pull
every vertex back to ground truth (up to the fixed gauge vertex).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_framework_tpu.geometry import se3, sim3
from slam_framework_tpu.optim import pose_graph


def _circle_poses(n, radius=10.0):
    """Ground-truth Tcw for cameras on a circle looking along the tangent."""
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        center = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        fwd = np.array([-np.sin(a), np.cos(a), 0.0])
        up = np.array([0.0, 0.0, -1.0])
        left = np.cross(up, fwd)
        Rwc = np.stack([left, up, fwd], axis=1)  # columns: x,y,z cam axes in world
        Twc = np.eye(4)
        Twc[:3, :3] = Rwc
        Twc[:3, 3] = center
        poses.append(np.linalg.inv(Twc))
    return np.array(poses, np.float32)


def _sim3_from_T(T, s=1.0):
    return {
        "R": jnp.asarray(T[:3, :3]),
        "t": jnp.asarray(T[:3, 3]),
        "s": jnp.asarray(np.float32(s)),
    }


def _build_problem(n, drift_rot=0.02, drift_trans=0.05, drift_scale=0.0, seed=0):
    """Vertices = GT corrupted by accumulated drift; edges = exact GT relatives
    between consecutive vertices + one loop edge (n-1 -> 0)."""
    rng = np.random.default_rng(seed)
    gt = _circle_poses(n)

    # accumulate noisy odometry to produce drifted estimates (vertex 0 exact)
    est = [gt[0]]
    for k in range(1, n):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        noise = np.asarray(
            se3.se3_exp(
                jnp.asarray(
                    np.concatenate(
                        [
                            rng.normal(0, drift_rot, 3),
                            rng.normal(0, drift_trans, 3),
                        ]
                    ).astype(np.float32)
                )
            )
        )
        est.append(noise @ rel @ est[-1])
    est = np.array(est, np.float32)

    V = n
    E = n  # n-1 odometry edges + 1 loop edge
    sgn = np.exp(rng.normal(0, drift_scale, n)).astype(np.float32) if drift_scale else np.ones(n, np.float32)
    sgn[0] = 1.0  # vertex 0 is the fixed gauge — its scale defines the global scale

    v_R = jnp.asarray(est[:, :3, :3])
    v_t = jnp.asarray(est[:, :3, 3])
    v_s = jnp.asarray(sgn)
    e_i = np.arange(n, dtype=np.int32) % n            # i -> j edges: k -> k+1, last is loop (n-1 -> 0)
    e_j = (np.arange(n, dtype=np.int32) + 1) % n
    eR = np.zeros((E, 3, 3), np.float32)
    et = np.zeros((E, 3), np.float32)
    es = np.ones(E, np.float32)
    for k in range(E):
        Sji = gt[e_j[k]] @ np.linalg.inv(gt[e_i[k]])  # exact relative SE3 (scale 1)
        eR[k] = Sji[:3, :3]
        et[k] = Sji[:3, 3]

    prob = pose_graph.PoseGraphProblem(
        v_R=v_R,
        v_t=v_t,
        v_s=v_s,
        v_fixed=jnp.asarray(np.arange(n) == 0),
        v_mask=jnp.ones(n, bool),
        e_i=jnp.asarray(e_i),
        e_j=jnp.asarray(e_j),
        e_R=jnp.asarray(eR),
        e_t=jnp.asarray(et),
        e_s=jnp.asarray(es),
        e_mask=jnp.ones(E, bool),
        e_weight=jnp.ones(E, np.float32),
    )
    return prob, gt, est


def _pose_errors(v_R, v_t, v_s, gt):
    """Translation error of camera centers after folding scale into translation."""
    T = np.asarray(
        sim3.to_se3({"R": v_R, "t": v_t, "s": v_s})
    )
    centers = -np.einsum("nji,nj->ni", T[:, :3, :3], T[:, :3, 3])
    gt_centers = -np.einsum("nji,nj->ni", gt[:, :3, :3], gt[:, :3, 3])
    return np.linalg.norm(centers - gt_centers, axis=1)


class TestPoseGraph:
    def test_consistent_graph_zero_residual(self):
        """Exact estimates + exact measurements -> zero cost, poses unchanged."""
        prob, gt, _ = _build_problem(16, drift_rot=0.0, drift_trans=0.0)
        prob = prob._replace(v_R=jnp.asarray(gt[:, :3, :3]), v_t=jnp.asarray(gt[:, :3, 3]))
        res = pose_graph.optimize(prob, iters=3)
        assert float(res.final_cost) < 1e-8
        err = _pose_errors(res.v_R, res.v_t, res.v_s, gt)
        assert err.max() < 1e-4

    def test_corrects_accumulated_drift(self):
        """Drifted circle + one exact loop edge -> poses recover ground truth."""
        prob, gt, est = _build_problem(32, drift_rot=0.01, drift_trans=0.05)
        err_before = _pose_errors(prob.v_R, prob.v_t, prob.v_s, gt)
        res = pose_graph.optimize(prob, iters=20)
        err_after = _pose_errors(res.v_R, res.v_t, res.v_s, gt)
        assert err_before.max() > 0.1  # drift actually corrupted the estimates
        assert err_after.max() < err_before.max() * 0.05
        assert float(res.final_cost) < 1e-4

    def test_scale_drift_corrected(self):
        """Mono-style scale drift on vertices is absorbed by the Sim3 edges."""
        prob, gt, _ = _build_problem(24, drift_rot=0.005, drift_trans=0.02, drift_scale=0.05)
        res = pose_graph.optimize(prob, iters=20)
        # scales should return to ~1 (all measurements have scale 1, vertex 0 fixed at 1)
        s = np.asarray(res.v_s)
        np.testing.assert_allclose(s, 1.0, atol=0.02)
        err_after = _pose_errors(res.v_R, res.v_t, res.v_s, gt)
        assert err_after.max() < 0.15

    def test_fixed_vertex_untouched(self):
        prob, gt, est = _build_problem(12, drift_rot=0.01, drift_trans=0.03)
        res = pose_graph.optimize(prob, iters=10)
        np.testing.assert_allclose(np.asarray(res.v_R[0]), est[0, :3, :3], atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.v_t[0]), est[0, :3, 3], atol=1e-6)

    def test_masked_edges_and_vertices_ignored(self):
        """Invalid slots (padding) must not influence the solution."""
        prob, gt, _ = _build_problem(16, drift_rot=0.01, drift_trans=0.03)
        V, E = 16, 16
        pad_v, pad_e = 8, 8
        rng = np.random.default_rng(1)
        prob2 = pose_graph.PoseGraphProblem(
            v_R=jnp.concatenate([prob.v_R, jnp.tile(jnp.eye(3), (pad_v, 1, 1))]),
            v_t=jnp.concatenate([prob.v_t, jnp.asarray(rng.normal(0, 1, (pad_v, 3)), dtype=jnp.float32)]),
            v_s=jnp.concatenate([prob.v_s, jnp.ones(pad_v)]),
            v_fixed=jnp.concatenate([prob.v_fixed, jnp.ones(pad_v, bool)]),
            v_mask=jnp.concatenate([prob.v_mask, jnp.zeros(pad_v, bool)]),
            e_i=jnp.concatenate([prob.e_i, jnp.full(pad_e, V, jnp.int32)]),
            e_j=jnp.concatenate([prob.e_j, jnp.full(pad_e, V + 1, jnp.int32)]),
            e_R=jnp.concatenate([prob.e_R, jnp.tile(jnp.eye(3), (pad_e, 1, 1))]),
            e_t=jnp.concatenate([prob.e_t, jnp.asarray(rng.normal(0, 1, (pad_e, 3)), dtype=jnp.float32)]),
            e_s=jnp.concatenate([prob.e_s, jnp.ones(pad_e)]),
            e_mask=jnp.concatenate([prob.e_mask, jnp.zeros(pad_e, bool)]),
            e_weight=jnp.concatenate([prob.e_weight, jnp.ones(pad_e)]),
        )
        res = pose_graph.optimize(prob2, iters=20)
        err_after = _pose_errors(res.v_R[:V], res.v_t[:V], res.v_s[:V], gt)
        assert err_after.max() < 0.1
