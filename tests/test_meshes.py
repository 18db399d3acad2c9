"""Tests of the procedural mesh generators and engine dtype modes."""

import numpy as np
import numpy.testing as npt

from disimpy_tpu import gradients, meshes, simulations, substrates


def surface_is_closed(vertices, faces):
    """A closed orientable surface has every edge shared by exactly 2
    triangles."""
    edges = {}
    for tri in faces:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            e = tuple(sorted((tri[a], tri[b])))
            edges[e] = edges.get(e, 0) + 1
    return all(v == 2 for v in edges.values())


def test_icosphere():
    vertices, faces = meshes.icosphere(radius=3e-6, subdivisions=2)
    assert faces.shape == (320, 3)
    npt.assert_allclose(np.linalg.norm(vertices, axis=1), 3e-6, rtol=1e-10)
    assert surface_is_closed(vertices, faces)


def test_cylinder_mesh_closed():
    vertices, faces = meshes.cylinder_mesh(
        1e-6, 5e-6, n_facets=12, n_segments=3, closed=True
    )
    assert surface_is_closed(vertices, faces)
    # Radial extent and length.
    r = np.linalg.norm(vertices[:, :2], axis=1)
    npt.assert_allclose(r.max(), 1e-6)
    npt.assert_allclose(vertices[:, 2].max() - vertices[:, 2].min(), 5e-6)


def test_cylinder_array_mesh_counts():
    vertices, faces = meshes.cylinder_array_mesh(
        1e-6, 3e-6, grid=(2, 3), n_facets=8, n_segments=2
    )
    assert faces.shape == (2 * 3 * 8 * 2 * 2, 3)
    assert faces.max() == len(vertices) - 1


def test_icosphere_intra_seeding_and_confinement(oracles_dir):
    # End-to-end: a closed icosphere must confine intra-seeded walkers.
    vertices, faces = meshes.icosphere(radius=4e-6, subdivisions=2)
    substrate = substrates.mesh(
        vertices, faces, False, init_pos="intra",
        n_sv=np.array([6, 6, 6]), quiet=True,
    )
    gradient = np.zeros((1, 50, 3))
    signals, pos = simulations.simulation(
        300, 2e-9, gradient, 5e-5, substrate, final_pos=True, quiet=True
    )
    center = np.asarray(substrate.voxel_size) / 2
    radii = np.linalg.norm(pos - center, axis=1)
    npt.assert_equal(np.max(radii) < 4e-6 * 1.001, True)


def test_float64_mode_matches_float32():
    gradient = np.zeros((2, 60, 3))
    gradient[:, 1:30, 0] = 0.05
    gradient[:, 30:59, 0] = -0.05
    dt = 1e-3
    substrate = substrates.sphere(5e-6)
    s32 = simulations.simulation(
        400, 2e-9, gradient, dt, substrate, quiet=True, dtype="float32"
    )
    s64 = simulations.simulation(
        400, 2e-9, gradient, dt, substrate, quiet=True, dtype="float64"
    )
    # Same seed, same streams: float64 refines, does not change, the result.
    npt.assert_allclose(s64 / 400, s32 / 400, atol=2e-3)
