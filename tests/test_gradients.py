"""Tests of the gradient-waveform toolkit.

Oracles match the reference suite (disimpy/tests/test_gradients.py): exact
b-value of a known waveform, PGSE invariants, rotation directions, and the
Camino scheme-file round trip (the reference's `camino.scheme` fixture is
regenerated from the recipe at test_gradients.py:115-124).
"""

import numpy as np
import numpy.testing as npt
import pytest

from disimpy_tpu import gradients, utils


def example_gradient(n_t=1000, amplitude=0.1, lobe=200):
    T = 80e-3
    gradient = np.zeros((1, n_t, 3))
    gradient[0, 1 : lobe + 1, 0] = amplitude
    gradient[0, -(lobe + 1) : -1, 0] = -amplitude
    dt = T / (gradient.shape[1] - 1)
    return gradient, dt


def test_interpolate_gradient_preserves_b_and_range():
    gradient, dt = example_gradient()
    n_t = int(1e5)
    interp_g, interp_dt = gradients.interpolate_gradient(gradient, dt, n_t)
    npt.assert_equal(interp_g.shape, (1, n_t, 3))
    npt.assert_almost_equal(interp_dt, dt * gradient.shape[1] / n_t)
    npt.assert_almost_equal(np.max(interp_g), np.max(gradient))
    npt.assert_almost_equal(np.min(interp_g), np.min(gradient))
    npt.assert_almost_equal(
        gradients.calc_b(interp_g, interp_dt) / gradients.calc_b(gradient, dt), 1
    )


def test_interpolate_gradient_matches_np_interp():
    rng = np.random.default_rng(0)
    gradient = rng.standard_normal((3, 17, 3))
    dt = 1e-4
    n_t = 53
    ours, new_dt = gradients.interpolate_gradient(gradient, dt, n_t)
    T = dt * (gradient.shape[1] - 1)
    for m in range(3):
        for a in range(3):
            ref = np.interp(
                np.linspace(0, T, n_t),
                np.linspace(0, T, gradient.shape[1]),
                gradient[m, :, a],
            )
            npt.assert_allclose(ours[m, :, a], ref, atol=1e-12)


def test_calc_q_is_cumulative_trapezoid():
    gradient, dt = example_gradient()
    q = gradients.calc_q(gradient, dt)
    npt.assert_equal(q.shape, gradient.shape)
    trapezoid = getattr(np, "trapezoid", None) or np.trapz
    for i in np.linspace(0, gradient.shape[1] - 1, 10).astype(int):
        npt.assert_almost_equal(
            q[:, i - 1, :],
            gradients.GAMMA * trapezoid(gradient[:, 0:i, :], dx=dt, axis=1),
        )


def test_calc_b_known_value():
    gradient, dt = example_gradient()
    b = gradients.calc_b(gradient, dt)
    npt.assert_almost_equal(b / 1.07507347e10, 1)


def test_set_b():
    gradient, dt = example_gradient()
    gradient = np.concatenate([gradient for _ in range(5)], axis=0)
    scaled_g = gradients.set_b(gradient, dt, 1e9)
    npt.assert_equal(np.isclose(gradients.calc_b(scaled_g, dt), 1e9), True)
    bs = np.arange(5) * 1e10
    scaled_g = gradients.set_b(gradient, dt, bs)
    npt.assert_equal(np.isclose(gradients.calc_b(scaled_g, dt), bs), True)
    # Now measurement 0 has b = 0 and can no longer be rescaled.
    with pytest.raises(Exception):
        gradients.set_b(scaled_g, dt, 1e9)


def test_rotate_gradient():
    gradient, _ = example_gradient()
    k = np.array([0.1, 0.5, -0.9])
    R = utils.vec2vec_rotmat(np.array([1, 0, 0]), k)
    rotated_g = gradients.rotate_gradient(gradient, R[np.newaxis])
    d = rotated_g[0, 5, :]
    npt.assert_almost_equal(k / np.linalg.norm(k), d / np.linalg.norm(d))
    with pytest.raises(ValueError):
        gradients.rotate_gradient(gradient, np.ones((1, 3, 3)))


def test_pgse_invariants():
    delta = 15e-3
    DELTA = 50e-3
    bvals = np.array([1e9, 2e9, 3e9])
    bvecs = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    n_t = int(1e4)
    gradient, dt = gradients.pgse(delta, DELTA, n_t, bvals, bvecs)
    npt.assert_equal(gradient.shape, (len(bvals), n_t, 3))
    npt.assert_equal(np.all(gradient[:, 0, :] == 0), True)
    npt.assert_equal(np.all(gradient[:, -1, :] == 0), True)
    npt.assert_almost_equal(np.sum(gradient, axis=1), 0)
    resolution = np.finfo(float).resolution
    for i in range(3):
        first_half = np.abs(gradient[i, : n_t // 2, :]) > resolution
        second_half = np.abs(gradient[i, n_t // 2 :, :]) > resolution
        npt.assert_almost_equal(np.sum(first_half) * dt, delta, 5)
        npt.assert_almost_equal(np.sum(second_half) * dt, delta, 5)
    npt.assert_almost_equal(gradients.calc_b(gradient, dt) / 1e9, bvals / 1e9)
    npt.assert_almost_equal(
        gradient[:, 1] / np.linalg.norm(gradient[:, 1], axis=1), bvecs
    )


def test_camino_scheme_file_roundtrip(tmp_path):
    # Regenerated from the reference fixture's construction recipe
    # (disimpy/tests/test_gradients.py:115-124).
    gradient = np.zeros((1, 100, 3))
    gradient[0, 1:30, 0] = 1
    gradient[0, 70:99, 0] = -1
    T = 80e-3
    n_t = int(1e3)
    dt = T / (gradient.shape[1] - 1)
    gradient, dt = gradients.interpolate_gradient(gradient, dt, n_t)
    bs = np.linspace(0, 3e9, 100)
    gradient = np.concatenate([gradient for _ in bs], axis=0)
    gradient = gradients.set_b(gradient, dt, bs)

    path = str(tmp_path / "camino.scheme")
    gradients.save_camino_scheme_file(path, gradient, dt)
    loaded_g, loaded_dt = gradients.load_camino_scheme_file(path)
    npt.assert_almost_equal(loaded_g, gradient)
    npt.assert_almost_equal(loaded_dt, dt)


def test_load_camino_scheme_file_rejects_bad_input(tmp_path):
    bad_header = tmp_path / "bad_header.scheme"
    bad_header.write_text("VERSION: BVECTOR\n1 0.001 0 0 0\n")
    with pytest.raises(Exception, match="GRADIENT_WAVEFORM"):
        gradients.load_camino_scheme_file(str(bad_header))
    mixed_dt = tmp_path / "mixed_dt.scheme"
    mixed_dt.write_text(
        "VERSION: GRADIENT_WAVEFORM\n2 0.001 0 0 0 0 0 0\n2 0.002 0 0 0 0 0 0\n"
    )
    with pytest.raises(Exception, match="time step duration"):
        gradients.load_camino_scheme_file(str(mixed_dt))


def test_ogse_invariants():
    delta = 10e-3
    DELTA = 20e-3
    frequency = 500.0  # 5 full periods per lobe
    bvals = np.array([0.5e9, 1e9])
    bvecs = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    n_t = int(2e4)
    for waveform in ("sin", "cos"):
        gradient, dt = gradients.ogse(
            delta, DELTA, frequency, n_t, bvals, bvecs, waveform=waveform
        )
        npt.assert_equal(gradient.shape, (2, n_t, 3))
        npt.assert_almost_equal(gradient[:, 0, :], 0)
        npt.assert_almost_equal(gradient[:, -1, :], 0)
        # Spin-echo condition: zero zeroth moment.
        npt.assert_almost_equal(
            np.sum(gradient, axis=1) * dt / np.max(np.abs(gradient)), 0, 6
        )
        npt.assert_almost_equal(gradients.calc_b(gradient, dt) / 1e9, bvals / 1e9)
        # Measurement direction.
        peak = np.argmax(np.abs(gradient[1, :, 2]))
        assert abs(gradient[1, peak, 2]) > 0
        npt.assert_almost_equal(gradient[1, peak, 0], 0)
    with pytest.raises(ValueError):
        gradients.ogse(delta, DELTA, frequency, n_t, bvals, bvecs, waveform="square")
