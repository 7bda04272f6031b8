import jax.numpy as jnp
import numpy as np
import pytest

from openimucameracalibrator_tpu.core import camera_calibrator
from openimucameracalibrator_tpu.models import cameras
from openimucameracalibrator_tpu.utils import synthetic
from openimucameracalibrator_tpu.utils.types import CornerDataset

TRUE_PARAMS = {
    "pinhole": [437.0, 437.5, 481.0, 271.5],
    "division_undistortion": [437.13, 489.07, 270.87, -1.4386e-06],
    "extended_unified": [438.0, 438.5, 482.0, 272.0, 0.51, 1.06],
    "double_sphere": [364.0, 364.5, 480.0, 270.0, -0.2, 0.55],
    "fisheye": [435.45, 436.0, 479.12, 274.46, 0.05, 0.07, -0.11, 0.05],
}


def scene_to_dataset(scene) -> CornerDataset:
    return CornerDataset(
        times=scene.frame_times, points2d=scene.observations,
        valid=scene.obs_valid, board_points=np.asarray(scene.board.points),
        image_size=scene.image_size, fps=30.0)


@pytest.mark.parametrize("model_name", list(TRUE_PARAMS))
def test_recover_intrinsics(model_name):
    model = cameras.get_model(model_name)
    true = jnp.array(TRUE_PARAMS[model_name])
    scene = synthetic.make_intrinsics_scene(model, true, num_views=45,
                                            noise_px=0.2, seed=3)
    # Enough corners must actually be visible.
    assert scene.obs_valid.sum() > 40 * 30
    calib, details = camera_calibrator.calibrate_camera(
        scene_to_dataset(scene), model_name,
        camera_calibrator.CameraCalibratorOptions(grid_size=0.01))
    # Final mean reprojection error at the injected-noise floor.
    assert calib.mean_reproj_error < 0.35, calib.mean_reproj_error
    got = calib.params
    want = np.asarray(true)
    # Functional equivalence: recovered model must project like the true
    # one over the observed field of view (raw parameters can be coupled —
    # e.g. the double-sphere (f, xi, alpha) family — so compare actions).
    # Central-camera gauge: a principal-point shift trades against a small
    # rotation, so align the two models by their best relative rotation
    # (Kabsch over bearings at the same pixels) before comparing.
    obs_uv = scene.observations[scene.obs_valid][::7]
    dirs_t = np.asarray(model.unproject(true, jnp.array(obs_uv)))
    dirs_e = np.asarray(model.unproject(jnp.array(got), jnp.array(obs_uv)))
    U, _, Vt = np.linalg.svd(dirs_e.T @ dirs_t)
    R = U @ np.diag([1, 1, np.linalg.det(U @ Vt)]) @ Vt  # dirs_t -> dirs_e frame
    uv_true, ok_t = model.project(true, jnp.array(dirs_t))
    uv_est, ok_e = model.project(jnp.array(got), jnp.array(dirs_t @ R.T))
    ok = np.asarray(ok_t & ok_e)
    d = np.linalg.norm(np.asarray(uv_true - uv_est), axis=-1)[ok]
    # Loose bound under noise: distortion tails are weakly constrained at
    # the FOV edge (the strong, exact check is the noise-free test below).
    assert np.percentile(d, 95) < 2.5, (model_name, np.percentile(d, 95))


@pytest.mark.parametrize("model_name", list(TRUE_PARAMS))
def test_recover_intrinsics_noise_free(model_name):
    """Without pixel noise the recovery must be essentially exact."""
    model = cameras.get_model(model_name)
    true = jnp.array(TRUE_PARAMS[model_name])
    scene = synthetic.make_intrinsics_scene(model, true, num_views=30,
                                            noise_px=0.0, seed=11)
    calib, details = camera_calibrator.calibrate_camera(
        scene_to_dataset(scene), model_name,
        camera_calibrator.CameraCalibratorOptions(grid_size=0.01))
    assert calib.mean_reproj_error < 1e-3, calib.mean_reproj_error
    np.testing.assert_allclose(
        calib.params[model.param_groups["focal"]],
        np.asarray(true)[model.param_groups["focal"]], atol=0.1)
    np.testing.assert_allclose(
        calib.params[model.param_groups["pp"]],
        np.asarray(true)[model.param_groups["pp"]], atol=0.1)


def test_min_views_guard():
    model = cameras.get_model("pinhole")
    scene = synthetic.make_intrinsics_scene(model, jnp.array(TRUE_PARAMS["pinhole"]),
                                            num_views=6, seed=5)
    with pytest.raises(ValueError):
        camera_calibrator.calibrate_camera(scene_to_dataset(scene), "pinhole")


def test_distortion_aware_init_fisheye():
    """The division-model lambda grid init (ops/pnp.radial_division_init —
    the analog of the reference's Larsson radial-P4P path,
    intrinsic_initializer.cc:69-134) must give a substantially less biased
    focal than plain DLT on strongly-distorted footage."""
    model = cameras.get_model("fisheye")
    true = jnp.array(TRUE_PARAMS["fisheye"])
    scene = synthetic.make_intrinsics_scene(model, true, num_views=40,
                                            noise_px=0.2, seed=5)
    ds = scene_to_dataset(scene)
    f_plain = camera_calibrator.initialize_views(
        ds, jnp.float32, distortion_aware=False)[0]
    f_rad, _, _, _, lam = camera_calibrator.initialize_views(
        ds, jnp.float32, distortion_aware=True)
    f_true = float(true[0])
    assert abs(f_rad - f_true) <= abs(f_plain - f_true) + 1e-6
    assert abs(f_rad - f_true) / f_true < 0.10, (f_rad, f_plain)
    assert lam < 0.0  # barrel distortion -> negative division coefficient


def test_division_seed_from_radial_init():
    """division_undistortion gets its d parameter seeded by the grid search."""
    model = cameras.get_model("division_undistortion")
    true = jnp.array(TRUE_PARAMS["division_undistortion"])
    scene = synthetic.make_intrinsics_scene(model, true, num_views=40,
                                            noise_px=0.2, seed=6)
    _, _, _, _, lam = camera_calibrator.initialize_views(
        scene_to_dataset(scene), jnp.float32, distortion_aware=True)
    assert abs(lam - float(true[3])) < 7e-7, lam


def test_multi_model_batched_matches_sequential():
    """One compiled multi-model batch (padded params + lax.switch
    projection, vmapped 3-stage BA) recovers each model like the
    per-model path (BASELINE configs[1] "multi-model batched
    intrinsics"; no reference analog — one CameraCalibrator per run)."""
    names = ["pinhole", "division_undistortion", "double_sphere"]
    jobs = []
    for i, name in enumerate(names):
        model = cameras.get_model(name)
        scene = synthetic.make_intrinsics_scene(
            model, jnp.array(TRUE_PARAMS[name]), num_views=45, noise_px=0.2,
            seed=3 + i)
        jobs.append((name, scene_to_dataset(scene)))
    opts = camera_calibrator.CameraCalibratorOptions(grid_size=0.01)
    results = camera_calibrator.calibrate_camera_batch(jobs, opts)
    assert len(results) == len(jobs)
    for (name, ds), (calib, details) in zip(jobs, results):
        assert calib.model_name == name
        assert calib.mean_reproj_error < 0.35, (name, calib.mean_reproj_error)
        want = np.asarray(TRUE_PARAMS[name])
        got = np.asarray(calib.params)
        assert got.shape == want.shape
        if name == "double_sphere":
            # (f, xi) has near-equivalent mirror families over a finite
            # FOV; the family-invariant near-axis magnification f/(1+xi)
            # is what must be recovered.
            mag_got = got[0] / (1.0 + got[4])
            mag_want = want[0] / (1.0 + want[4])
            assert abs(mag_got - mag_want) / mag_want < 0.02, (got, want)
        else:
            # focal within 1%.
            assert abs(got[0] - want[0]) / want[0] < 0.01, (name, got, want)
        # principal point within 2 px.
        np.testing.assert_allclose(got[2], want[2], atol=2.0)
