"""Additional physics oracles beyond the ported unit suite.

- The diffraction-minimum check from the reference's validation notebook
  (docs/source/validation.ipynb cells 10-11): for narrow-pulse PGSE in a
  cylinder of radius r, the signal has its first minimum at
  ``q = 0.61 * 2 * pi / r``.
- iter_exc semantics: walkers that exhaust the collision-iteration budget
  are warned about and excluded from the signal
  (reference simulations.py:1405-1421).
"""

import warnings

import numpy as np
import numpy.testing as npt
import pytest

from disimpy_tpu import gradients, simulations, substrates


def _diffraction_minimum(n_s, n_t=int(3e3), delta=3e-4, DELTA=0.3):
    radius = 10e-6
    diffusivity = 2e-9
    gradient = np.zeros((1, int(1e6), 3))
    T = delta + DELTA
    dt = T / (gradient.shape[1] - 1)
    n_lobe = int(np.round(delta / dt))
    gradient[0, 1:n_lobe, 0] = 1.0
    gradient[0, -n_lobe:-1, 0] = -1.0
    gradient, dt = gradients.interpolate_gradient(gradient, dt, n_t)
    # The pulse must survive the resampling: delta below ~2 output samples
    # would leave an (almost) all-zero waveform that set_b rejects.
    assert delta / dt >= 2.0
    # Sweep q around the expected first diffraction minimum.
    q_min_expected = 0.61 * 2 * np.pi / radius
    qs = np.linspace(0.6 * q_min_expected, 1.4 * q_min_expected, 41)
    # b = q^2 (DELTA - delta/3) with q in rad/m
    bs = qs**2 * (DELTA - delta / 3)
    gradient = np.concatenate([gradient for _ in bs], axis=0)
    gradient = gradients.set_b(gradient, dt, bs)
    substrate = substrates.cylinder(radius=radius, orientation=np.array([0, 0, 1.0]))
    signals = simulations.simulation(
        n_s, diffusivity, gradient, dt, substrate, quiet=True
    )
    q_at_min = qs[np.argmin(signals)]
    # The minimum must localize at 0.61 * 2 pi / r (within the sweep grid).
    npt.assert_allclose(q_at_min, q_min_expected, rtol=0.06)


@pytest.mark.slow
def test_cylinder_diffraction_minimum():
    # delta = 1 ms keeps the narrow-pulse condition (delta << r^2/D = 50 ms)
    # while spanning ~10 samples of the resampled waveform; the original
    # delta = 0.1 ms fell between output samples and zeroed the pulse.
    _diffraction_minimum(int(2e5), n_t=int(5e3), delta=1e-3, DELTA=0.5)


def test_cylinder_diffraction_minimum_small():
    _diffraction_minimum(int(2e4))


def test_iter_exc_warns_and_excludes():
    # max_iter=1 with heavy collisions: some walkers exhaust the budget,
    # trigger the warning, and drop out of the signal denominator.
    n_s, n_t = 200, 20
    gradient = np.zeros((1, n_t, 3))
    dt = 1e-3  # step ~3.5 um in a 5 um sphere: everyone collides
    substrate = substrates.sphere(5e-6)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        signals = simulations.simulation(
            n_s, 2e-9, gradient, dt, substrate, max_iter=1, quiet=True,
            all_signals=True,
        )
    assert any("Maximum number of iterations" in str(w.message) for w in caught)
    n_excluded = np.isnan(signals[0]).sum()
    assert n_excluded > 0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        total = simulations.simulation(
            n_s, 2e-9, gradient, dt, substrate, max_iter=1, quiet=True
        )
    npt.assert_almost_equal(total[0], np.nansum(signals[0]), 3)
