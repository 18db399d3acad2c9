"""Irregular-geometry fixtures from the reference test suite.

The reference ships two mesh fixtures it uses only in uncollected
``manual_test__*`` visual checks (disimpy/tests/test_substrates.py:317,403):
``fibre_mesh.pkl`` (1,436 triangles of undulating fibres, vertices not
anchored at the origin) and ``example_mesh.pkl`` (10,000 irregular
triangles). Here they run through the actual engines so the irregular
geometries the reference merely renders are covered by automated physics
checks: engine agreement, confinement, and packer coverage on meshes with
non-uniform triangle sizes and off-origin coordinates.
"""

import pickle

import numpy as np
import numpy.testing as npt
import pytest

from disimpy_tpu import gradients, simulations, substrates
from disimpy_tpu.engine import config


def load_mesh(oracles_dir, name):
    with open(oracles_dir / name, "rb") as f:
        m = pickle.load(f)
    return np.asarray(m["vertices"]), np.asarray(m["faces"])


def test_fibre_mesh_engine_parity(oracles_dir):
    """Fused (interpret-mode kernel) vs classic engine on the fibre bundle:
    statistically identical signals despite the mesh's negative vertex
    coordinates (exercises the AABB shift) and irregular triangle sizes."""
    vertices, faces = load_mesh(oracles_dir, "fibre_mesh.pkl")
    assert vertices.min() < 0  # the fixture's defining quirk
    n_s, n_t, n_b = 800, 40, 4
    bs = np.linspace(1, 2e9, n_b)
    T = 40e-3
    gradient = np.zeros((1, 400, 3))
    gradient[0, 1:150, 1] = 1
    gradient[0, -150:-1, 1] = -1
    gradient = np.concatenate([gradient for _ in bs], axis=0)
    gradient, dt = gradients.interpolate_gradient(gradient, T / 399, n_t)
    gradient = gradients.set_b(gradient, dt, bs)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, n_sv=np.array([5, 5, 5]), quiet=True
    )
    try:
        config.use_fused = True
        config.pallas_interpret = True
        s_f = simulations.simulation(
            n_s, 2e-9, gradient, dt, substrate, quiet=True, seed=7
        )
    finally:
        config.use_fused = None
        config.pallas_interpret = False
    try:
        config.use_fused = False
        s_c = simulations.simulation(
            n_s, 2e-9, gradient, dt, substrate, quiet=True, seed=7
        )
    finally:
        config.use_fused = None
    assert np.all(np.isfinite(s_f)) and np.all(s_f <= n_s)
    # Different RNG layouts -> statistical agreement at MC tolerance.
    npt.assert_allclose(s_f / n_s, s_c / n_s, atol=4 / np.sqrt(n_s))


def test_example_mesh_confinement(oracles_dir):
    """10,000-triangle irregular mesh, non-periodic: reflective voxel walls
    keep every walker inside the voxel regardless of mesh watertightness
    (reference contract, disimpy/simulations.py mesh step kernel)."""
    vertices, faces = load_mesh(oracles_dir, "example_mesh.pkl")
    n_s, n_t = 200, 15
    gradient = np.ones((1, n_t, 3))
    substrate = substrates.mesh(
        vertices, faces, periodic=False, n_sv=np.array([10, 10, 10]), quiet=True
    )
    signals, pos = simulations.simulation(
        n_s, 2e-9, gradient, 5e-4, substrate, final_pos=True, quiet=True, seed=3
    )
    assert np.all(np.isfinite(signals))
    voxel = np.asarray(substrate.voxel_size)
    npt.assert_equal(np.all(pos >= 0), True)
    npt.assert_equal(np.all(pos <= voxel), True)


@pytest.mark.slow
def test_example_mesh_engine_parity_slow(oracles_dir):
    """Fused vs classic statistical agreement on the 10,000-tri fixture."""
    vertices, faces = load_mesh(oracles_dir, "example_mesh.pkl")
    n_s, n_t = 1000, 40
    gradient, dt = gradients.pgse(
        5e-3, 25e-3, n_t, np.array([1e9]), np.array([[1.0, 0, 0]])
    )
    substrate = substrates.mesh(
        vertices, faces, periodic=True, n_sv=np.array([10, 10, 10]), quiet=True
    )
    try:
        config.use_fused = True
        config.pallas_interpret = True
        s_f = simulations.simulation(
            n_s, 2e-9, gradient, dt, substrate, quiet=True, seed=5
        )
    finally:
        config.use_fused = None
        config.pallas_interpret = False
    try:
        config.use_fused = False
        s_c = simulations.simulation(
            n_s, 2e-9, gradient, dt, substrate, quiet=True, seed=5
        )
    finally:
        config.use_fused = None
    npt.assert_allclose(s_f / n_s, s_c / n_s, atol=4 / np.sqrt(n_s))
