"""Pallas mesh-kernel correctness tests (interpret mode on CPU).

The sorted-run Pallas kernel must reproduce the XLA gather-based query
exactly (same hits, same distances, same normals up to sign) and produce the
same physics end-to-end.
"""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from disimpy_tpu import meshes, simulations, substrates
from disimpy_tpu.engine import config, mesh_accel, pallas_mesh


@pytest.fixture
def sphere_spec():
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=2)
    substrate = substrates.mesh(
        vertices, faces, True, n_sv=np.array([4, 4, 4]), quiet=True
    )
    step_l = float(np.sqrt(6 * 2e-9 * 8e-5))
    spec = mesh_accel.pack_mesh(substrate, 1 / step_l, jnp.float32)
    assert spec.spans == (1, 1, 1)  # halo layout required by the kernel
    return substrate, spec, step_l


def test_pallas_query_matches_xla(sphere_spec):
    substrate, spec, step_l = sphere_spec
    rng = np.random.RandomState(1)
    n = 700  # deliberately not a multiple of the 128-lane tile
    voxel = np.asarray(substrate.voxel_size) / step_l
    r0 = jnp.asarray(
        (rng.random_sample((n, 3)) * 1.4 - 0.2) * voxel, jnp.float32
    )
    direction = rng.standard_normal((n, 3))
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)
    direction = jnp.asarray(direction, jnp.float32)
    rem = jnp.asarray(rng.random_sample(n).astype(np.float32))

    d_xla, n_xla = mesh_accel.nearest_hit(spec, r0, direction, rem)
    table = pallas_mesh.pallas_table(spec)
    d_pl, n_pl = pallas_mesh.nearest_hit_pallas(
        spec, r0, direction, rem, table, interpret=True
    )
    d_xla, d_pl = np.asarray(d_xla), np.asarray(d_pl)
    rem = np.asarray(rem)
    hits_xla, hits_pl = d_xla <= rem, d_pl <= rem
    npt.assert_equal(hits_pl, hits_xla)
    assert hits_xla.sum() > 20  # the case actually exercises collisions
    m = hits_xla
    npt.assert_allclose(d_pl[m], d_xla[m], atol=1e-6)
    alignment = np.abs(np.sum(np.asarray(n_pl)[m] * np.asarray(n_xla)[m], axis=1))
    npt.assert_allclose(alignment, 1.0, atol=1e-5)


def test_equidistant_tie_break_returns_single_triangle_normal():
    """Two triangles sharing an edge, hit exactly on the edge: both register
    at the same f32 distance, and the returned normal must be one triangle's
    normal (a unit vector) — not a component-wise mix of the two."""
    # Tent over the y-axis ridge with unequal slopes. Normals:
    # n1 = (-0.6, 0, -0.8), n2 = (-0.8, 0, 0.6). A component-wise max over
    # minimizers would fabricate (-0.6, 0, 0.6) (norm 0.85).
    t1 = [0, 0, 0, 0, 1, 0, 1, 0, -0.75]
    n1 = np.array([-0.6, 0.0, -0.8])
    t2 = [0, 0, 0, 0, 1, 0, -1, 0, -4.0 / 3.0]
    n2 = np.array([-0.8, 0.0, 0.6])
    K = 128
    tri_cols = np.zeros((16, K), np.float32)
    tri_cols[:9, 0] = t1
    tri_cols[9:12, 0] = n1
    tri_cols[:9, 1] = t2
    tri_cols[9:12, 1] = n2
    spin_rows = np.zeros((pallas_mesh.BLOCK, 8), np.float32)
    # Ray from below the ridge straight up: hits the shared edge at d = 1.
    spin_rows[0] = [0.0, 0.5, -1.0, 0.0, 0.0, 1.0, 2.0, 0.0]
    d, nx, ny, nz = pallas_mesh._mt_block(
        jnp.asarray(spin_rows), jnp.asarray(tri_cols)
    )
    d = np.asarray(d)[0, 0]
    normal = np.array([np.asarray(c)[0, 0] for c in (nx, ny, nz)])
    npt.assert_allclose(d, 1.0, atol=1e-6)
    npt.assert_allclose(np.linalg.norm(normal), 1.0, atol=1e-6)
    assert (
        np.allclose(np.abs(normal @ n1), 1.0, atol=1e-6)
        or np.allclose(np.abs(normal @ n2), 1.0, atol=1e-6)
    ), normal


def test_pallas_end_to_end_physics(sphere_spec, oracles_dir):
    substrate, _, _ = sphere_spec
    import pickle

    with open(oracles_dir / "cylinder_mesh_closed.pkl", "rb") as f:
        m = pickle.load(f)
    from disimpy_tpu import gradients

    n_s, n_t = int(2e3), int(2e2)
    bs = np.linspace(1, 3e9, 10)
    T = 70e-3
    gradient = np.zeros((1, 700, 3))
    gradient[0, 1:300, 0] = 1
    gradient[0, -300:-1, 0] = -1
    gradient = np.concatenate([gradient for _ in bs], axis=0)
    gradient, dt = gradients.interpolate_gradient(gradient, T / 699, n_t)
    gradient = gradients.set_b(gradient, dt, bs)
    mesh_sub = substrates.mesh(
        m["vertices"],
        m["faces"],
        True,
        init_pos="intra",
        n_sv=np.array([10, 10, 10]),
        quiet=True,
    )
    try:
        config.use_pallas = True
        config.pallas_interpret = True
        sig_pl, pos_pl = simulations.simulation(
            n_s, 2e-9, gradient, dt, mesh_sub, final_pos=True, quiet=True
        )
    finally:
        config.use_pallas = None
        config.pallas_interpret = False
    sig_xla, pos_xla = simulations.simulation(
        n_s, 2e-9, gradient, dt, mesh_sub, final_pos=True, quiet=True
    )
    # Same seed, same RNG stream, same collision results -> same physics.
    npt.assert_allclose(pos_pl, pos_xla, atol=1e-11)
    npt.assert_allclose(sig_pl, sig_xla, atol=n_s * 1e-4)
