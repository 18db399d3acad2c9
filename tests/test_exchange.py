"""Exchange statistics and T2 relaxation weighting (TPU-native extensions).

The reference tracks nothing per compartment; these features are built on
membrane-transit counting in the stepping engine (engine/stepping.py
``_resolve_mesh_hits`` crossed mask -> engine/core.py ``track="exchange"``
scan carry). Tests pin:

- uniform (scalar) T2 is an exact global ``exp(-T / T2)`` factor,
- impermeable runs report zero transits and pure-intra dwell,
- the relaxation-weighted signal is exactly consistent with the reported
  dwell steps (same trajectory ensemble, b = 0),
- tracked compartment parity agrees with geometric re-classification of
  the final positions,
- validation errors for malformed arguments.
"""

import numpy as np
import numpy.testing as npt
import pytest

from disimpy_tpu import meshes, simulations, substrates

D = 2e-9
RADIUS = 5e-6


def _sphere_substrate(perm_prob, init_pos="intra"):
    vertices, faces = meshes.icosphere(radius=RADIUS, subdivisions=2)
    return substrates.mesh(
        vertices, faces, periodic=True, init_pos=init_pos,
        n_sv=np.array([4, 4, 4]), quiet=True, perm_prob=perm_prob,
    )


def test_uniform_t2_scales_signal():
    n_s, n_t = 400, 60
    gradient = np.ones((2, n_t, 3)) * 1e-3
    dt = 2e-4
    t2 = 80e-3
    substrate = substrates.free()
    base = simulations.simulation(n_s, D, gradient, dt, substrate, quiet=True)
    weighted = simulations.simulation(
        n_s, D, gradient, dt, substrate, quiet=True, relaxation=t2
    )
    npt.assert_allclose(weighted, base * np.exp(-n_t * dt / t2), rtol=1e-6)


def test_impermeable_no_transits_and_pure_intra_weight():
    n_s, n_t = 300, 50
    gradient = np.zeros((1, n_t, 3))
    dt = 2e-4
    substrate = _sphere_substrate(0.0)
    t2_intra, t2_extra = 30e-3, 200e-3
    signals, stats = simulations.simulation(
        n_s, D, gradient, dt, substrate, quiet=True,
        relaxation=(t2_intra, t2_extra), exchange_stats=True,
    )
    npt.assert_array_equal(stats["crossings"], 0)
    npt.assert_array_equal(stats["intra_steps"], n_t)
    npt.assert_array_equal(stats["intra_fraction"], 1.0)
    # b = 0: every phase is 0, so the signal is exactly the weight sum.
    npt.assert_allclose(
        signals[0], n_s * np.exp(-n_t * dt / t2_intra), rtol=1e-5
    )


def test_permeable_weight_consistent_with_dwell():
    n_s, n_t = 400, 80
    gradient = np.zeros((1, n_t, 3))
    dt = 2e-4
    substrate = _sphere_substrate(0.5)
    t2_intra, t2_extra = 25e-3, 150e-3
    signals, stats = simulations.simulation(
        n_s, D, gradient, dt, substrate, quiet=True, seed=11,
        relaxation=(t2_intra, t2_extra), exchange_stats=True,
    )
    assert stats["crossings"].max() > 0  # membrane is actually permeable
    assert 0.0 < stats["intra_fraction"].mean() < 1.0
    # Exact consistency: with b = 0 the signal equals the sum of the
    # weights implied by the reported dwell steps.
    k = stats["intra_steps"].astype(float)
    w = np.exp(-(dt / t2_intra) * k - (dt / t2_extra) * (n_t - k))
    npt.assert_allclose(signals[0], w.sum(), rtol=1e-5)


def test_tracked_parity_matches_final_geometry():
    n_s, n_t = 300, 60
    gradient = np.zeros((1, n_t, 3))
    dt = 2e-4
    substrate = _sphere_substrate(0.5)
    (signals, pos, stats) = simulations.simulation(
        n_s, D, gradient, dt, substrate, quiet=True, seed=5,
        final_pos=True, exchange_stats=True,
    )
    # Wrap the (periodic, unwrapped) final positions into the home voxel
    # and re-classify geometrically: inside <=> started intra and made an
    # even number of transits.
    voxel = np.asarray(substrate.voxel_size)
    wrapped = pos - np.floor(pos / voxel) * voxel
    classify = simulations._make_intra_classifier(substrate)
    inside = classify(wrapped)
    expected = (stats["crossings"] % 2) == 0  # started intra
    mismatch = float((inside != expected).mean())
    # Epsilon surface offsets can leave a spin ambiguously close to the
    # membrane; allow a tiny disagreement rate.
    assert mismatch < 0.01


def test_exchange_stats_free_substrate_zeros():
    n_s, n_t = 100, 20
    gradient = np.zeros((1, n_t, 3))
    signals, stats = simulations.simulation(
        n_s, D, gradient, 1e-4, substrates.free(), quiet=True,
        exchange_stats=True,
    )
    npt.assert_array_equal(stats["crossings"], 0)
    npt.assert_array_equal(stats["intra_steps"], 0)


def test_relaxation_validation():
    gradient = np.zeros((1, 10, 3))
    with pytest.raises(ValueError):
        simulations.simulation(
            10, D, gradient, 1e-4, substrates.free(), quiet=True,
            relaxation=(30e-3, 100e-3),  # pair needs a mesh substrate
        )
    with pytest.raises(ValueError):
        simulations.simulation(
            10, D, gradient, 1e-4, substrates.free(), quiet=True,
            relaxation=-1.0,
        )
    with pytest.raises(ValueError):
        simulations.simulation(
            10, D, gradient, 1e-4, substrates.free(), quiet=True,
            relaxation=(1.0, 2.0, 3.0),
        )
    with pytest.raises(ValueError):
        simulations.simulation(
            10, D, gradient, 1e-4, substrates.free(), quiet=True,
            exchange_stats="yes",
        )
