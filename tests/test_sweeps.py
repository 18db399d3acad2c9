"""Batched microstructure sweep tests (BASELINE configuration 5)."""

import numpy as np
import numpy.testing as npt

from disimpy_tpu import gradients, simulations, substrates, sweeps


def example_gradient(n_t=100):
    T = 80e-3
    gradient = np.zeros((1, 100, 3))
    gradient[0, 1:11, 0] = 1
    gradient[0, -11:-1, 0] = -1
    dt = T / (gradient.shape[1] - 1)
    return gradients.interpolate_gradient(gradient, dt, n_t)


def test_cylinder_radius_sweep_matches_standalone_runs():
    gradient, dt = example_gradient()
    radii = np.linspace(1e-6, 8e-6, 8)
    orientation = np.array([0.0, 1.0, 1.0])
    swept = sweeps.sweep_cylinder_radii(
        400, 2e-9, gradient, dt, radii, orientation=orientation
    )
    assert swept.shape == (8, 1)
    # Larger cylinders restrict less: simple physical monotonicity check of
    # the attenuated signal at this protocol.
    singles = np.stack(
        [
            simulations.simulation(
                400, 2e-9, gradient, dt,
                substrates.cylinder(radius=float(r), orientation=orientation),
                quiet=True,
            )
            for r in radii
        ]
    )
    # Row i of the sweep is the standalone simulation with the same seed.
    npt.assert_allclose(swept, singles, rtol=1e-6, atol=1e-5)


def test_sphere_radius_sweep_matches_standalone_runs():
    gradient, dt = example_gradient()
    radii = np.array([2e-6, 5e-6, 10e-6])
    swept = sweeps.sweep_sphere_radii(300, 2e-9, gradient, dt, radii)
    singles = np.stack(
        [
            simulations.simulation(
                300, 2e-9, gradient, dt, substrates.sphere(float(r)),
                quiet=True,
            )
            for r in radii
        ]
    )
    npt.assert_allclose(swept, singles, rtol=1e-6, atol=1e-5)
