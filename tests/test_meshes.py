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


def test_float64_mode_physics():
    # float64 draws a different (f64) threefry stream, so compare against
    # physics, not against the float32 run: free diffusion follows
    # exp(-b D) in either precision.
    n_s = int(1e4)
    bs = np.linspace(1, 2e9, 10)
    gradient = np.zeros((1, 100, 3))
    gradient[0, 1:11, 0] = 1
    gradient[0, -11:-1, 0] = -1
    dt = 80e-3 / 99
    gradient = np.concatenate([gradient for _ in bs], axis=0)
    gradient, dt = gradients.interpolate_gradient(gradient, dt, 200)
    gradient = gradients.set_b(gradient, dt, bs)
    signals = simulations.simulation(
        n_s, 2e-9, gradient, dt, substrates.free(), quiet=True, dtype="float64"
    )
    npt.assert_almost_equal(signals / n_s, np.exp(-bs * 2e-9), 2)
    # Restricted: sphere signal in f64 agrees with f32 statistically.
    substrate = substrates.sphere(5e-6)
    g2 = gradient[:3]
    s64 = simulations.simulation(
        n_s, 2e-9, g2, dt, substrate, quiet=True, dtype="float64"
    )
    s32 = simulations.simulation(
        n_s, 2e-9, g2, dt, substrate, quiet=True, dtype="float32"
    )
    npt.assert_allclose(s64 / n_s, s32 / n_s, atol=0.04)


def test_engine_regrids_pathological_cell_width():
    """When user cells are much narrower than one step, the engine's
    acceleration grid re-grids (the (1/width + 2)^3 traversal stencil at
    large dt is pathological); the substrate's own CSR grid is untouched."""
    import jax.numpy as jnp

    from disimpy_tpu import meshes, substrates
    from disimpy_tpu.engine import mesh_accel

    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    sub = substrates.mesh(
        vertices, faces, True, n_sv=np.array([10, 10, 10]), quiet=True
    )
    step_l = float(np.sqrt(6 * 2e-9 * 2.1e-3))  # voxel ~2 steps wide
    spec = mesh_accel.pack_mesh(sub, 1 / step_l, jnp.float32)
    assert max(spec.n_sv) <= 4  # re-gridded far below the user's 10
    assert max(spec.spans) <= 4  # sane stencil
    assert tuple(np.asarray(sub.n_sv)) == (10, 10, 10)  # substrate untouched
    # and a fine-step case keeps the user's grid
    step_l = float(np.sqrt(6 * 2e-9 * 8e-5))
    spec2 = mesh_accel.pack_mesh(sub, 1 / step_l, jnp.float32)
    assert spec2.n_sv == (10, 10, 10)


def test_stl_roundtrip(tmp_path):
    from disimpy_tpu import meshes

    v, f = meshes.icosphere(radius=5e-6, subdivisions=1)
    path = str(tmp_path / "m.stl")
    meshes.save_stl(path, v, f)
    v2, f2 = meshes.load_stl(path)
    # Triangle soup equality: same set of triangles (vertex merge may
    # reorder indices).
    t1 = np.sort(v[f].reshape(len(f), -1), axis=0)
    t2 = np.sort(v2[f2].reshape(len(f2), -1), axis=0)
    np.testing.assert_allclose(t2, t1, rtol=1e-6)
    # and the loaded mesh builds a working substrate
    from disimpy_tpu import substrates

    sub = substrates.mesh(v2, f2, True, n_sv=np.array([2, 2, 2]), quiet=True)
    assert sub.type == "mesh"


def test_stl_ascii_and_ply(tmp_path):
    from disimpy_tpu import meshes

    # hand-written ASCII STL: one unit triangle
    stl = tmp_path / "a.stl"
    stl.write_text(
        "solid t\n facet normal 0 0 1\n  outer loop\n"
        "   vertex 0 0 0\n   vertex 1 0 0\n   vertex 0 1 0\n"
        "  endloop\n endfacet\nendsolid t\n"
    )
    v, f = meshes.load_stl(str(stl))
    assert len(f) == 1 and len(v) == 3
    # hand-written ASCII PLY: unit square as a quad (fan-triangulated)
    ply = tmp_path / "a.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2 3\n"
    )
    v, f = meshes.load_ply(str(ply))
    assert v.shape == (4, 3) and f.shape == (2, 3)
