import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.models import boards
from openimucameracalibrator_tpu.ops import lie, pnp


def make_view(rng, f=450.0, n=60, noise=0.0):
    """Random camera looking at a planar board; returns correspondences."""
    board = boards.charuco_board()
    pts = board.points[:n]
    # Camera 0.5-1.2 m in front of board center, looking back at it.
    q_wc = np.asarray(lie.quat_multiply(
        lie.so3_exp(jnp.array(rng.normal(size=3) * 0.25)),
        lie.so3_exp(jnp.array([np.pi, 0.0, 0.0]))))
    center = pts.mean(0)
    t_wc = center + np.array([rng.normal() * 0.1, rng.normal() * 0.1, rng.uniform(0.5, 1.2)])
    q_cw, t_cw = lie.se3_inverse(jnp.array(q_wc), jnp.array(t_wc))
    p_cam = np.asarray(lie.se3_act(q_cw, t_cw, jnp.array(pts)))
    uv = f * p_cam[:, :2] / p_cam[:, 2:3]
    uv = uv + rng.normal(size=uv.shape) * noise
    return pts, uv, np.asarray(q_cw), np.asarray(t_cw), p_cam


def test_homography_and_pose(rng):
    pts, uv, q_cw, t_cw, _ = make_view(rng)
    mask = jnp.ones(uv.shape[0])
    H = pnp.homography_dlt(jnp.array(pts[:, :2]), jnp.array(uv), mask)
    # H maps board (x, y) to image points (projectively).
    ph = np.concatenate([pts[:, :2], np.ones((len(pts), 1))], -1) @ np.asarray(H).T
    proj = ph[:, :2] / ph[:, 2:3]
    np.testing.assert_allclose(proj, uv, atol=1e-6)

    q_est, t_est = pnp.pose_from_homography(H, jnp.array(450.0), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(t_est), t_cw, atol=1e-6)
    dq = np.asarray(lie.quat_boxminus(q_est, jnp.array(q_cw)))
    assert np.linalg.norm(dq) < 1e-6


def test_zhang_focal(rng):
    f_true = 437.0
    Hs, ok = [], []
    for _ in range(12):
        pts, uv, _, _, _ = make_view(rng, f=f_true)
        H = pnp.homography_dlt(jnp.array(pts[:, :2]), jnp.array(uv), jnp.ones(uv.shape[0]))
        Hs.append(np.asarray(H))
        ok.append(True)
    f_est = float(pnp.zhang_focal(jnp.array(np.stack(Hs)), jnp.array(ok)))
    np.testing.assert_allclose(f_est, f_true, rtol=1e-4)


def test_pnp_dlt(rng):
    board = boards.charuco_board()
    pts3d = board.points.copy()
    # Lift some points off the plane so DLT is well-posed in 3D too.
    pts3d[::3, 2] += rng.uniform(0.05, 0.2, size=pts3d[::3, 2].shape)
    q_wc = np.asarray(lie.quat_multiply(
        lie.so3_exp(jnp.array(rng.normal(size=3) * 0.3)),
        lie.so3_exp(jnp.array([np.pi, 0.0, 0.0]))))
    t_wc = pts3d.mean(0) + np.array([0.05, -0.08, 0.9])
    q_cw, t_cw = lie.se3_inverse(jnp.array(q_wc), jnp.array(t_wc))
    p_cam = np.asarray(lie.se3_act(q_cw, t_cw, jnp.array(pts3d)))
    bearings = p_cam[:, :2] / p_cam[:, 2:3]
    q_est, t_est = pnp.pnp_dlt(jnp.array(pts3d), jnp.array(bearings),
                               jnp.ones(len(pts3d), bool))
    np.testing.assert_allclose(np.asarray(t_est), np.asarray(t_cw), atol=1e-6)
    assert np.linalg.norm(np.asarray(lie.quat_boxminus(q_est, q_cw))) < 1e-6


def test_ransac_pnp_with_outliers(rng):
    board = boards.charuco_board()
    pts3d = board.points.copy()
    pts3d[::4, 2] += rng.uniform(0.05, 0.3, size=pts3d[::4, 2].shape)
    q_wc = np.asarray(lie.so3_exp(jnp.array([np.pi, 0.05, -0.1])))
    t_wc = pts3d.mean(0) + np.array([0.0, 0.0, 0.8])
    q_cw, t_cw = lie.se3_inverse(jnp.array(q_wc), jnp.array(t_wc))
    p_cam = np.asarray(lie.se3_act(q_cw, t_cw, jnp.array(pts3d)))
    bearings = p_cam[:, :2] / p_cam[:, 2:3]
    # 25% gross outliers.
    n = len(pts3d)
    out = rng.choice(n, n // 4, replace=False)
    bearings[out] += rng.normal(size=(len(out), 2)) * 0.3
    q_est, t_est, inliers, count = pnp.ransac_pnp(
        jnp.array(pts3d), jnp.array(bearings), jnp.ones(n, bool),
        jax.random.PRNGKey(3), num_hypotheses=256, inlier_thresh=0.005)
    assert int(count) >= n - len(out) - 3
    np.testing.assert_allclose(np.asarray(t_est), np.asarray(t_cw), atol=5e-3)
    assert np.linalg.norm(np.asarray(lie.quat_boxminus(q_est, q_cw))) < 5e-3
    # Outliers excluded from the inlier set.
    assert not np.asarray(inliers)[out].any()
