import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openimucameracalibrator_tpu.models import cameras

# Realistic-ish parameter sets for a 960x540 GoPro-like camera
# (values near BASELINE.md intrinsics rows).
PARAMS = {
    "pinhole": [440.0, 442.0, 480.0, 270.0],
    "pinhole_radtan": [440.0, 442.0, 480.0, 270.0, -0.05, 0.01, -0.002, 0.001, -0.0005],
    "division_undistortion": [437.0, 489.0, 270.9, -1.43e-06],
    "double_sphere": [342.0, 344.0, 472.0, 273.0, -0.215, 0.513],
    "extended_unified": [438.0, 440.0, 489.0, 272.0, 0.51, 1.06],
    "fov": [440.0, 441.0, 480.0, 270.0, 0.93],
    "fisheye": [435.0, 436.0, 479.0, 274.0, 0.05, 0.07, -0.11, 0.05],
}


def sample_points(rng, n=256, max_angle_deg=50):
    """Random points in front of the camera within a view cone."""
    ang = np.deg2rad(max_angle_deg) * np.sqrt(rng.uniform(size=n))
    az = rng.uniform(0, 2 * np.pi, size=n)
    d = rng.uniform(0.5, 5.0, size=n)
    x = np.sin(ang) * np.cos(az)
    y = np.sin(ang) * np.sin(az)
    z = np.cos(ang)
    return np.stack([x, y, z], -1) * d[:, None]


@pytest.mark.parametrize("name", list(PARAMS))
def test_project_unproject_roundtrip(name, rng):
    model = cameras.get_model(name)
    params = jnp.array(PARAMS[name])
    pts = sample_points(rng, max_angle_deg=45 if name != "pinhole" else 35)
    uv, valid = model.project(params, jnp.array(pts))
    assert np.asarray(valid).all()
    bearing = model.unproject(params, uv)
    want = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(bearing), want, atol=5e-7)


@pytest.mark.parametrize("name", list(PARAMS))
def test_unproject_project_roundtrip(name, rng):
    model = cameras.get_model(name)
    params = jnp.array(PARAMS[name])
    uv = np.stack([rng.uniform(200, 760, 128), rng.uniform(100, 440, 128)], -1)
    bearing = model.unproject(params, jnp.array(uv))
    uv2, valid = model.project(params, bearing)
    np.testing.assert_allclose(np.asarray(uv2)[np.asarray(valid)], uv[np.asarray(valid)], atol=1e-5)


@pytest.mark.parametrize("name", list(PARAMS))
def test_projection_jacobians_finite(name, rng):
    model = cameras.get_model(name)
    params = jnp.array(PARAMS[name])
    pts = jnp.array(sample_points(rng, n=8, max_angle_deg=40))

    def proj_flat(pp, pt):
        return model.project(pp, pt)[0]

    Jp = jax.vmap(lambda pt: jax.jacobian(proj_flat, argnums=0)(params, pt))(pts)
    Jx = jax.vmap(lambda pt: jax.jacobian(proj_flat, argnums=1)(params, pt))(pts)
    assert np.isfinite(np.asarray(Jp)).all()
    assert np.isfinite(np.asarray(Jx)).all()


@pytest.mark.parametrize("name", list(PARAMS))
def test_projection_jacobian_matches_fd(name, rng):
    model = cameras.get_model(name)
    params = np.array(PARAMS[name])
    pt = sample_points(rng, n=1, max_angle_deg=30)[0]

    J = np.asarray(jax.jacobian(lambda pp: model.project(pp, jnp.array(pt))[0])(jnp.array(params)))
    for k in range(len(params)):
        h = max(1e-7, 1e-7 * abs(params[k]))
        pp = params.copy(); pp[k] += h
        pm = params.copy(); pm[k] -= h
        fd = (np.asarray(model.project(jnp.array(pp), jnp.array(pt))[0])
              - np.asarray(model.project(jnp.array(pm), jnp.array(pt))[0])) / (2 * h)
        np.testing.assert_allclose(J[:, k], fd, atol=1e-4, rtol=1e-4)


def test_division_undistortion_matches_pinhole_at_zero_distortion(rng):
    pts = sample_points(rng, n=32, max_angle_deg=30)
    uv_pin, _ = cameras.pinhole_project(jnp.array([437.0, 437.0, 480.0, 270.0]), jnp.array(pts))
    uv_div, _ = cameras.divundist_project(jnp.array([437.0, 480.0, 270.0, 0.0]), jnp.array(pts))
    np.testing.assert_allclose(np.asarray(uv_div), np.asarray(uv_pin), atol=1e-9)


def test_fisheye_matches_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    params = PARAMS["fisheye"]
    K = np.array([[params[0], 0, params[2]], [0, params[1], params[3]], [0, 0, 1.0]])
    D = np.array(params[4:8])
    pts = sample_points(rng, n=64, max_angle_deg=60)
    want, _ = cv2.fisheye.projectPoints(
        pts.reshape(1, -1, 3), np.zeros(3), np.zeros(3), K, D)
    got, _ = cameras.fisheye_project(jnp.array(params), jnp.array(pts))
    np.testing.assert_allclose(np.asarray(got), want.reshape(-1, 2), atol=1e-6)


def test_aliases():
    assert cameras.get_model("DIVISION_UNDISTORTION").name == "division_undistortion"
    assert cameras.get_model("KB").name == "fisheye"
    assert cameras.get_model("EUCM").name == "extended_unified"
