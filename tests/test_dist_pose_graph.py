"""Distributed Sim3 pose graph over the simulated 8-device CPU mesh
(parallel/dist_pose_graph.py).

Reference parity target: Optimizer::OptimizeEssentialGraph
(src/optimizer/optimizer.cpp:718-960) — here edge-sharded SPMD over a mesh,
so the distributed result must match the single-device optimizer bit-for-
purpose (same GN trajectory, psum'd reductions)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from slam_framework_tpu.optim import pose_graph
from slam_framework_tpu.parallel import dist_pose_graph

from test_pose_graph import _build_problem, _pose_errors


@pytest.fixture
def mesh(cpu_mesh_devices):
    return Mesh(np.array(cpu_mesh_devices[:8]), ("pg",))


class TestDistPoseGraph:
    def test_matches_single_device(self, mesh):
        prob, gt, _ = _build_problem(24, drift_rot=0.02, drift_trans=0.08,
                                     drift_scale=0.01, seed=3)
        res_single = pose_graph.optimize(prob, iters=12, cg_iters=50)
        sharded = dist_pose_graph.shard_problem(prob, 8)
        res_dist = dist_pose_graph.optimize_sharded(sharded, mesh, iters=12,
                                                    cg_iters=50)
        r1, t1, s1 = jax.device_get([res_single.v_R, res_single.v_t, res_single.v_s])
        r2, t2, s2 = jax.device_get([res_dist.v_R, res_dist.v_t, res_dist.v_s])
        assert np.allclose(t1, t2, atol=1e-3)
        assert np.allclose(r1, r2, atol=1e-4)
        assert np.allclose(s1, s2, atol=1e-4)

    def test_corrects_drift_distributed(self, mesh):
        prob, gt, _ = _build_problem(24, drift_rot=0.02, drift_trans=0.08,
                                     drift_scale=0.01, seed=5)
        tr0 = _pose_errors(prob.v_R, prob.v_t, prob.v_s, gt).max()
        sharded = dist_pose_graph.shard_problem(prob, 8)
        res = dist_pose_graph.optimize_sharded(sharded, mesh, iters=15, cg_iters=60)
        tr1 = _pose_errors(res.v_R, res.v_t, res.v_s, gt).max()
        assert tr1 < 0.2 * tr0

    def test_matches_single_device_nondivisible(self, cpu_mesh_devices):
        """Live edge count NOT divisible by n_shards -> masked pad slots exist.
        Pads must carry identity rotations and must not fork the GN trajectory
        (the accept test tolerates reduction-shape rounding)."""
        mesh7 = Mesh(np.array(cpu_mesh_devices[:7]), ("pg",))
        prob, gt, _ = _build_problem(24, drift_rot=0.02, drift_trans=0.08,
                                     drift_scale=0.01, seed=3)
        res_single = pose_graph.optimize(prob, iters=12, cg_iters=50)
        sharded = dist_pose_graph.shard_problem(prob, 7)
        assert sharded.e_i.shape[0] > int(np.asarray(prob.e_mask).sum())  # pads exist
        # pad slots are identity rotations, not zero matrices
        live = np.asarray(sharded.e_mask)
        pads = np.asarray(sharded.e_R)[~live]
        assert np.allclose(pads, np.eye(3), atol=0)
        res_dist = dist_pose_graph.optimize_sharded(sharded, mesh7, iters=12,
                                                    cg_iters=50)
        t1, t2 = jax.device_get([res_single.v_t, res_dist.v_t])
        r1, r2 = jax.device_get([res_single.v_R, res_dist.v_R])
        assert np.allclose(t1, t2, atol=5e-3)
        assert np.allclose(r1, r2, atol=1e-3)

    def test_shard_partition_covers_all_edges(self):
        prob, _, _ = _build_problem(16, seed=1)
        sharded = dist_pose_graph.shard_problem(prob, 8)
        assert int(np.asarray(sharded.e_mask).sum()) == int(np.asarray(prob.e_mask).sum())
        assert sharded.e_i.shape[0] % 8 == 0
        # weights of live edges preserved
        assert np.isclose(
            float(np.asarray(sharded.e_weight).sum()),
            float(np.asarray(prob.e_weight)[np.asarray(prob.e_mask)].sum()),
        )
