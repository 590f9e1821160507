"""Closed-form single-gaussian checks — an analytic anchor for the EWA
projection and compositing math, independent of the oracle renderers."""
import math

import numpy as np
import pytest
import jax.numpy as jnp

from gs_tpu.core.camera import make_camera
from gs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
from gs_tpu.core.project import LOWPASS, preprocess
from gs_tpu.core.sh import rgb2sh
from gs_tpu.render import render


def single_gaussian(s, z, opacity=0.8, color=(1.0, 0.0, 0.0)):
    return GaussianParams(
        xyz=jnp.array([[0.0, 0.0, z]]),
        sh_dc=jnp.asarray(rgb2sh(np.array([color]))[:, None, :], jnp.float32),
        sh_rest=jnp.zeros((1, 0, 3)),
        log_scale=jnp.full((1, 3), math.log(s)),
        quat=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        logit_opacity=inverse_sigmoid(jnp.full((1, 1), opacity)),
    )


def centered_camera(w=64, h=64, fov=math.pi / 2):
    return make_camera(np.eye(3), np.zeros(3), fov, fov, w, h)


def test_ewa_closed_form():
    """Isotropic gaussian on the optical axis: cov2d = (f*s/z)^2 + lowpass,
    conic = 1/that, radius = ceil(3*sqrt(that))."""
    s, z = 0.1, 4.0
    cam = centered_camera()
    p = single_gaussian(s, z)
    proj = preprocess(p, cam, active_sh_degree=0)
    f = float(cam.focal_x)                       # = 32 / tan(45deg) = 32
    expected_var = (f * s / z) ** 2 + LOWPASS
    conic = np.asarray(proj.conic)[0]
    assert conic[0] == pytest.approx(1.0 / expected_var, rel=1e-5)
    assert conic[2] == pytest.approx(1.0 / expected_var, rel=1e-5)
    assert conic[1] == pytest.approx(0.0, abs=1e-7)
    # radius uses the reference's clamped eigen-discriminant
    # (sqrt(max(0.1, mid^2 - det)), ref: SURVEY.md §2.3-N1), which inflates
    # isotropic radii slightly vs the naive 3*sigma
    mid = expected_var
    det = expected_var ** 2
    lam = mid + math.sqrt(max(0.1, mid * mid - det))
    assert int(proj.radius[0]) == math.ceil(3.0 * math.sqrt(lam))
    # projected center: ((ndc+1)*S-1)/2 with ndc=0 -> (S-1)/2 = 31.5
    np.testing.assert_allclose(np.asarray(proj.mean2d)[0], [31.5, 31.5],
                               atol=1e-4)
    assert float(proj.depth[0]) == pytest.approx(z)
    assert float(proj.opacity[0]) == pytest.approx(0.8, rel=1e-6)


def test_pixel_alpha_closed_form():
    """Rendered pixel = c*alpha + bg*(1-alpha) with
    alpha = op * exp(-0.5 * d^2 / var) at pixel-center distance d."""
    s, z, op = 0.15, 4.0, 0.6
    cam = centered_camera()
    p = single_gaussian(s, z, opacity=op, color=(1.0, 0.0, 0.0))
    bg = jnp.asarray([0.0, 0.0, 1.0])
    out = render(cam, p, bg, active_sh_degree=0, backend="binned",
                 dup_capacity=1024, max_per_tile=32, chunk=16)
    img = np.asarray(out.image)
    f = float(cam.focal_x)
    var = (f * s / z) ** 2 + LOWPASS
    for (px, py) in [(31, 31), (31, 35), (27, 31), (25, 25)]:
        d2 = (px - 31.5) ** 2 + (py - 31.5) ** 2
        alpha = op * math.exp(-0.5 * d2 / var)
        if alpha < 1.0 / 255.0:
            alpha = 0.0
        assert img[0, py, px] == pytest.approx(alpha, abs=1e-5)
        assert img[2, py, px] == pytest.approx(1.0 - alpha, abs=1e-5)
    # invdepth at center = alpha_center / z
    a_c = op * math.exp(-0.5 * 0.5 / var)   # center pixel is 0.5px off axis
    assert np.asarray(out.invdepth)[0, 31, 31] == pytest.approx(
        a_c / z, rel=1e-4)
    assert np.asarray(out.final_T)[31, 31] == pytest.approx(1 - a_c, rel=1e-5)


def test_two_gaussian_over_compositing():
    """Front-to-back: C = c1*a1 + c2*a2*(1-a1) + bg*(1-a1)(1-a2)."""
    cam = centered_camera()
    op1, op2 = 0.7, 0.5
    p = GaussianParams(
        xyz=jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 5.0]]),
        sh_dc=jnp.asarray(rgb2sh(np.array([[1.0, 0, 0], [0, 1.0, 0]]))[:, None, :],
                          jnp.float32),
        sh_rest=jnp.zeros((2, 0, 3)),
        log_scale=jnp.full((2, 3), math.log(0.5)),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
        logit_opacity=inverse_sigmoid(jnp.array([[op1], [op2]])),
    )
    out = render(cam, p, jnp.zeros(3), active_sh_degree=0, backend="binned",
                 dup_capacity=4096, max_per_tile=64, chunk=16)
    img = np.asarray(out.image)
    f = float(cam.focal_x)
    d2 = 2 * 0.5 ** 2                       # center pixel offset
    a1 = op1 * math.exp(-0.5 * d2 / ((f * 0.5 / 3.0) ** 2 + LOWPASS))
    a2 = op2 * math.exp(-0.5 * d2 / ((f * 0.5 / 5.0) ** 2 + LOWPASS))
    assert img[0, 31, 31] == pytest.approx(a1, rel=1e-4)
    assert img[1, 31, 31] == pytest.approx(a2 * (1 - a1), rel=1e-4)
    assert np.asarray(out.final_T)[31, 31] == pytest.approx(
        (1 - a1) * (1 - a2), rel=1e-4)
