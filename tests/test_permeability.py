"""Permeable-membrane physics (perm_prob > 0 exercises the crossing path).

The reference implements permeability as a per-collision transmission
probability (disimpy/simulations.py:986-997); these tests pin the
macroscopic consequences on both engines: perm_prob=0 is exactly
impermeable, perm_prob=1 is transparent (free-diffusion displacement
statistics), and intermediate values interpolate monotonically.
"""

import numpy as np
import numpy.testing as npt

from disimpy_tpu import meshes, simulations, substrates
from disimpy_tpu.engine import config

D = 2e-9
RADIUS = 5e-6


def _run(perm_prob, n_s=1500, n_t=120, fused=False, seed=123):
    vertices, faces = meshes.icosphere(radius=RADIUS, subdivisions=2)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([4, 4, 4]), quiet=True, perm_prob=perm_prob,
    )
    gradient = np.zeros((1, n_t, 3))
    dt = 2e-4  # step ~0.49 um; sphere radius ~10 steps
    try:
        if fused:
            config.use_fused = True
            config.pallas_interpret = True
        else:
            config.use_fused = False
        _, pos = simulations.simulation(
            n_s, D, gradient, dt, substrate, final_pos=True, quiet=True,
            seed=seed,
        )
    finally:
        config.use_fused = None
        config.pallas_interpret = False
    centre = np.asarray(substrate.voxel_size) / 2
    r = np.linalg.norm(pos - centre, axis=1)
    return r


def test_escape_fraction_monotone_in_permeability():
    r0 = _run(0.0)
    r_half = _run(0.5)
    r1 = _run(1.0)
    esc0 = float((r0 > RADIUS * 1.001).mean())
    esc_half = float((r_half > RADIUS * 1.001).mean())
    esc1 = float((r1 > RADIUS * 1.001).mean())
    assert esc0 == 0.0  # exactly impermeable
    assert 0.05 < esc_half < esc1  # strictly interpolating
    # perm_prob=1 displacement statistics match unrestricted diffusion:
    # E[r^2] about the centre = E[r_init^2] (uniform ball: 3R^2/5) + 6 D T.
    n_t, dt = 120, 2e-4
    expected_rms = np.sqrt(3 * RADIUS**2 / 5 + 6 * D * n_t * dt)
    npt.assert_allclose(np.sqrt((r1**2).mean()), expected_rms, rtol=0.1)


def test_fused_and_classic_agree_on_permeability():
    # Small ensemble: the fused engine runs in Pallas interpret mode here.
    n_s, n_t = 800, 60
    r_classic = _run(0.5, n_s=n_s, n_t=n_t)
    r_fused = _run(0.5, n_s=n_s, n_t=n_t, fused=True)
    esc_c = float((r_classic > RADIUS * 1.001).mean())
    esc_f = float((r_fused > RADIUS * 1.001).mean())
    # Different RNG streams: agreement at Monte Carlo resolution.
    assert esc_c > 0.02
    npt.assert_allclose(esc_f, esc_c, atol=4 * np.sqrt(esc_c / n_s) + 0.01)
