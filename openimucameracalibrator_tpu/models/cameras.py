"""The seven camera models as pure, batched ``project``/``unproject`` pairs.

TPU-native replacement for the TheiaSfM camera-model classes the reference
dispatches over inside its Ceres functors (/root/reference
include/OpenCameraCalibrator/basalt_spline/ceres_calib_split_residuals.h:
247-270 and src/io/read_camera_calibration.cc:36-120). Models (matching
python/run_gopro_calibration.py:28-31 plus FOV, which the reference Readme
lists but never wires up — we support it fully):

==================  =========================================  ============
name                parameters                                  reference
==================  =========================================  ============
pinhole             [fx, fy, cx, cy]                            PINHOLE
pinhole_radtan      [fx, fy, cx, cy, k1, k2, k3, p1, p2]        PINHOLE_RADIAL_TANGENTIAL
division_undist     [f, cx, cy, d]                              DIVISION_UNDISTORTION
double_sphere       [fx, fy, cx, cy, xi, alpha]                 DOUBLE_SPHERE
extended_unified    [fx, fy, cx, cy, alpha, beta]               EXTENDED_UNIFIED
fov                 [fx, fy, cx, cy, w]                         FOV
fisheye             [fx, fy, cx, cy, k1, k2, k3, k4]            FISHEYE (Kannala-Brandt)
==================  =========================================  ============

Every function broadcasts over leading batch dims, is jit/vmap/grad-safe
(no data-dependent Python control flow; iterative inversions use a fixed
iteration count), and returns a ``valid`` mask instead of the reference's
sentinel 1e10 residuals (ceres_calib_split_residuals.h:272-274) — invalid
projections are masked out of the loss by the solver.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
from openimucameracalibrator_tpu.utils import precision

_EPS = 1e-9


@dataclasses.dataclass(frozen=True)
class CameraModel:
    name: str
    param_names: Sequence[str]
    project: Callable  # (params (...,P), p_cam (...,3)) -> (uv (...,2), valid (...,))
    unproject: Callable  # (params (...,P), uv (...,2)) -> bearing (...,3) unit norm
    init_params: Callable  # (f, cx, cy) -> (P,) initial parameter vector

    @property
    def num_params(self) -> int:
        return len(self.param_names)

    @property
    def param_groups(self) -> Dict[str, list]:
        """Indices by role, for the staged BA schedule (focal/pp/distortion).

        Mirrors the reference's per-stage SetParameterBlockVariable choices
        (camera_calibrator.cc:131-219): stage 1 frees focal+distortion,
        stage 2 frees the principal point, stage 3 frees everything.
        """
        groups = {"focal": [], "pp": [], "dist": []}
        for i, n in enumerate(self.param_names):
            if n in ("fx", "fy", "f"):
                groups["focal"].append(i)
            elif n in ("cx", "cy"):
                groups["pp"].append(i)
            else:
                groups["dist"].append(i)
        return groups


def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) > _EPS, b, jnp.where(b >= 0, _EPS, -_EPS))


def _norm3(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


# --- pinhole ---------------------------------------------------------------

def pinhole_project(params, p):
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    u = fx * _safe_div(x, z) + cx
    v = fy * _safe_div(y, z) + cy
    return jnp.stack([u, v], -1), z > _EPS


def pinhole_unproject(params, uv):
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    return _norm3(jnp.stack([mx, my, jnp.ones_like(mx)], -1))


# --- pinhole + radial-tangential (OpenCV "plumb bob") ----------------------

def radtan_project(params, p):
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    k1, k2, k3, p1, p2 = (params[..., i] for i in range(4, 9))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    xn = _safe_div(x, z)
    yn = _safe_div(y, z)
    r2 = xn * xn + yn * yn
    rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = xn * rad + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
    yd = yn * rad + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
    return jnp.stack([fx * xd + cx, fy * yd + cy], -1), z > _EPS


def radtan_unproject(params, uv):
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    k1, k2, k3, p1, p2 = (params[..., i] for i in range(4, 9))
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy
    # Fixed-point undistortion (8 iterations, the usual OpenCV scheme).
    xn, yn = xd, yd
    for _ in range(8):
        r2 = xn * xn + yn * yn
        rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
        dy = p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
        xn = (xd - dx) / rad
        yn = (yd - dy) / rad
    return _norm3(jnp.stack([xn, yn, jnp.ones_like(xn)], -1))


# --- division-undistortion (one-parameter division model, pixel space) -----

def divundist_project(params, p):
    f, cx, cy, d = (params[..., i] for i in range(4))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    xu = f * _safe_div(x, z)  # undistorted pixel, principal-point relative
    yu = f * _safe_div(y, z)
    ru2 = xu * xu + yu * yu
    # Solve r_u = r_d / (1 + d r_d^2) for r_d; scale s = r_d / r_u.
    disc = 1.0 - 4.0 * d * ru2
    disc = jnp.maximum(disc, 0.0)
    denom = 1.0 + jnp.sqrt(disc)
    s = 2.0 / denom  # == (1 - sqrt(disc)) / (2 d ru2), numerically stable form
    return jnp.stack([s * xu + cx, s * yu + cy], -1), (z > _EPS) & (1.0 - 4.0 * d * ru2 > 0)


def divundist_unproject(params, uv):
    f, cx, cy, d = (params[..., i] for i in range(4))
    xd = uv[..., 0] - cx
    yd = uv[..., 1] - cy
    rd2 = xd * xd + yd * yd
    w = 1.0 + d * rd2
    return _norm3(jnp.stack([_safe_div(xd, w) / f, _safe_div(yd, w) / f, jnp.ones_like(xd)], -1))


# --- double sphere (Usenko et al. 2018) ------------------------------------

def ds_project(params, p):
    fx, fy, cx, cy, xi, alpha = (params[..., i] for i in range(6))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    d1 = jnp.sqrt(x * x + y * y + z * z)
    zeta = xi * d1 + z
    d2 = jnp.sqrt(x * x + y * y + zeta * zeta)
    denom = alpha * d2 + (1.0 - alpha) * zeta
    u = fx * _safe_div(x, denom) + cx
    v = fy * _safe_div(y, denom) + cy
    w1 = jnp.where(alpha > 0.5, (1.0 - alpha) / jnp.maximum(alpha, _EPS),
                   alpha / jnp.maximum(1.0 - alpha, _EPS))
    w2 = (w1 + xi) / jnp.sqrt(jnp.maximum(2.0 * w1 * xi + xi * xi + 1.0, _EPS))
    return jnp.stack([u, v], -1), (denom > _EPS) & (z > -w2 * d1)


def ds_unproject(params, uv):
    fx, fy, cx, cy, xi, alpha = (params[..., i] for i in range(6))
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    r2 = mx * mx + my * my
    inner = 1.0 - (2.0 * alpha - 1.0) * r2
    mz = (1.0 - alpha * alpha * r2) / (alpha * jnp.sqrt(jnp.maximum(inner, _EPS)) + 1.0 - alpha)
    k = (mz * xi + jnp.sqrt(jnp.maximum(mz * mz + (1.0 - xi * xi) * r2, _EPS))) / jnp.maximum(mz * mz + r2, _EPS)
    vec = jnp.stack([k * mx, k * my, k * mz - xi], -1)
    return _norm3(vec)


# --- extended unified (EUCM) -----------------------------------------------

def eucm_project(params, p):
    fx, fy, cx, cy, alpha, beta = (params[..., i] for i in range(6))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    d = jnp.sqrt(beta * (x * x + y * y) + z * z)
    denom = alpha * d + (1.0 - alpha) * z
    u = fx * _safe_div(x, denom) + cx
    v = fy * _safe_div(y, denom) + cy
    w = jnp.where(alpha > 0.5, (1.0 - alpha) / jnp.maximum(alpha, _EPS),
                  alpha / jnp.maximum(1.0 - alpha, _EPS))
    return jnp.stack([u, v], -1), (denom > _EPS) & (z > -w * d)


def eucm_unproject(params, uv):
    fx, fy, cx, cy, alpha, beta = (params[..., i] for i in range(6))
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    r2 = mx * mx + my * my
    inner = 1.0 - (2.0 * alpha - 1.0) * beta * r2
    mz = (1.0 - beta * alpha * alpha * r2) / (alpha * jnp.sqrt(jnp.maximum(inner, _EPS)) + 1.0 - alpha)
    return _norm3(jnp.stack([mx, my, mz], -1))


# --- FOV (Devernay & Faugeras) ---------------------------------------------

def fov_project(params, p):
    fx, fy, cx, cy, w = (params[..., i] for i in range(5))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r = jnp.sqrt(x * x + y * y)
    tanwhalf = jnp.tan(0.5 * w)
    theta = jnp.arctan2(2.0 * r * tanwhalf, z)
    mul = _safe_div(theta, w * jnp.maximum(r, _EPS))
    mul = jnp.where(r > _EPS, mul, _safe_div(2.0 * tanwhalf, w * jnp.maximum(z, _EPS)))
    return jnp.stack([fx * x * mul + cx, fy * y * mul + cy], -1), jnp.abs(w) > _EPS


def fov_unproject(params, uv):
    fx, fy, cx, cy, w = (params[..., i] for i in range(5))
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    rd = jnp.sqrt(mx * mx + my * my)
    tanwhalf = jnp.tan(0.5 * w)
    # r_undist/z = tan(rd*w) / (2 tan(w/2)); build the bearing directly.
    sin_t = jnp.sin(rd * w)
    cos_t = jnp.cos(rd * w)
    scale = jnp.where(rd > _EPS, _safe_div(sin_t, 2.0 * tanwhalf * rd), w / (2.0 * tanwhalf))
    return _norm3(jnp.stack([scale * mx, scale * my, cos_t], -1))


# --- fisheye (Kannala-Brandt / OpenCV fisheye, 4 coefficients) -------------

def fisheye_project(params, p):
    fx, fy, cx, cy, k1, k2, k3, k4 = (params[..., i] for i in range(8))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    thetad = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = jnp.where(r > _EPS, thetad / jnp.maximum(r, _EPS), _safe_div(1.0, z))
    return jnp.stack([fx * x * scale + cx, fy * y * scale + cy], -1), theta < jnp.pi - 1e-3


def fisheye_unproject(params, uv):
    fx, fy, cx, cy, k1, k2, k3, k4 = (params[..., i] for i in range(8))
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    thetad = jnp.sqrt(mx * mx + my * my)
    # Newton iterations for theta from thetad (fixed count, jit-safe).
    theta = thetad
    for _ in range(6):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - thetad
        df = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2 + t2 * (7.0 * k3 + t2 * 9.0 * k4)))
        theta = theta - _safe_div(f, df)
    scale = jnp.where(thetad > _EPS, jnp.sin(theta) / jnp.maximum(thetad, _EPS), 1.0)
    return _norm3(jnp.stack([scale * mx, scale * my, jnp.cos(theta)], -1))


# ---------------------------------------------------------------------------

def _init(n_extra, *extra_defaults):
    def fn(f, cx, cy, dtype=None):
        base = [f, f, cx, cy]
        return jnp.array(base + list(extra_defaults), dtype=precision.resolve(dtype))
    return fn


def _init_divundist(f, cx, cy, dtype=None):
    return jnp.array([f, cx, cy, 0.0], dtype=precision.resolve(dtype))


CAMERA_MODELS: Dict[str, CameraModel] = {
    "pinhole": CameraModel(
        "pinhole", ("fx", "fy", "cx", "cy"), pinhole_project, pinhole_unproject, _init(0)),
    "pinhole_radtan": CameraModel(
        "pinhole_radtan", ("fx", "fy", "cx", "cy", "k1", "k2", "k3", "p1", "p2"),
        radtan_project, radtan_unproject, _init(5, 0.0, 0.0, 0.0, 0.0, 0.0)),
    "division_undistortion": CameraModel(
        "division_undistortion", ("f", "cx", "cy", "d"),
        divundist_project, divundist_unproject, _init_divundist),
    "double_sphere": CameraModel(
        "double_sphere", ("fx", "fy", "cx", "cy", "xi", "alpha"),
        ds_project, ds_unproject, _init(2, 0.0, 0.5)),
    "extended_unified": CameraModel(
        "extended_unified", ("fx", "fy", "cx", "cy", "alpha", "beta"),
        eucm_project, eucm_unproject, _init(2, 0.5, 1.0)),
    "fov": CameraModel(
        "fov", ("fx", "fy", "cx", "cy", "w"), fov_project, fov_unproject, _init(1, 0.85)),
    "fisheye": CameraModel(
        "fisheye", ("fx", "fy", "cx", "cy", "k1", "k2", "k3", "k4"),
        fisheye_project, fisheye_unproject, _init(4, 0.0, 0.0, 0.0, 0.0)),
}

# Abbreviations used by the reference CLI (python/utils.py:11-26).
MODEL_ALIASES = {
    "PINHOLE": "pinhole", "PH": "pinhole",
    "PINHOLE_RADIAL_TANGENTIAL": "pinhole_radtan", "PHRT": "pinhole_radtan",
    "DIVISION_UNDISTORTION": "division_undistortion", "DIVUN": "division_undistortion",
    "DOUBLE_SPHERE": "double_sphere", "DS": "double_sphere",
    "EXTENDED_UNIFIED": "extended_unified", "EUCM": "extended_unified",
    "FOV": "fov",
    "FISHEYE": "fisheye", "KB": "fisheye",
}


def get_model(name: str) -> CameraModel:
    key = name if name in CAMERA_MODELS else MODEL_ALIASES.get(name.upper(), name.lower())
    return CAMERA_MODELS[key]
