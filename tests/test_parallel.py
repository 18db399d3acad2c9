"""Multi-device sharding tests (8 virtual CPU devices, see conftest)."""

import numpy as np
import numpy.testing as npt
import pytest

import jax

from disimpy_tpu import gradients, meshes, simulations, substrates
from disimpy_tpu.parallel import sharding


def example_gradient(n_t=100):
    T = 80e-3
    gradient = np.zeros((1, 100, 3))
    gradient[0, 1:11, 0] = 1
    gradient[0, -11:-1, 0] = -1
    dt = T / (gradient.shape[1] - 1)
    return gradients.interpolate_gradient(gradient, dt, n_t)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return sharding.spin_mesh(8)


def test_spin_mesh_shapes(mesh8):
    assert mesh8.devices.size == 8
    assert sharding.padded_spin_count(17, mesh8) == 24
    assert sharding.padded_spin_count(16, mesh8) == 16


def test_sharded_free_simulation_matches_single_device(mesh8):
    gradient, dt = example_gradient()
    substrate = substrates.free()
    kwargs = dict(quiet=True)
    single = simulations.simulation(
        512, 2e-9, gradient, dt, substrate, **kwargs
    )
    sharded = simulations.simulation(
        512, 2e-9, gradient, dt, substrate, devices=mesh8, **kwargs
    )
    # Partitionable threefry: identical physics regardless of device layout.
    npt.assert_allclose(sharded, single, rtol=1e-5)


def test_sharded_sphere_with_padding(mesh8):
    # 500 is not divisible by 8: exercises the spin-padding path.
    gradient, dt = example_gradient()
    substrate = substrates.sphere(5e-6)
    single = simulations.simulation(500, 2e-9, gradient, dt, substrate, quiet=True)
    sharded = simulations.simulation(
        500, 2e-9, gradient, dt, substrate, devices=mesh8, quiet=True
    )
    npt.assert_allclose(sharded, single, rtol=1e-4, atol=1e-3)


def test_sharded_fused_engine_matches_single_device(mesh8):
    """The fused engine under shard_map: per-shard sorts and kernel
    launches with globally-offset walker ids must reproduce the
    single-device fused run (the RNG streams are id-keyed, so physics is
    independent of the device count)."""
    from disimpy_tpu.engine import config

    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, n_sv=np.array([2, 2, 2]), quiet=True
    )
    gradient, dt = example_gradient(20)
    kwargs = dict(final_pos=True, quiet=True)
    try:
        config.use_fused = True
        config.pallas_interpret = True
        s1, p1 = simulations.simulation(
            250, 2e-9, gradient, dt, substrate, **kwargs
        )
        s8, p8 = simulations.simulation(
            250, 2e-9, gradient, dt, substrate, devices=mesh8, **kwargs
        )
    finally:
        config.use_fused = None
        config.pallas_interpret = False
    assert s8.shape == (1,) and p8.shape == (250, 3)
    # Identical id-keyed streams; only the per-tile re-centering origin
    # (f32 rounding) differs between shardings.
    npt.assert_allclose(p8, p1, atol=1e-10)
    npt.assert_allclose(s8, s1, rtol=1e-5, atol=1e-6)


def test_sharded_classic_tracking_permeable_sphere(mesh8):
    """Exchange tracking on the classic engine under GSPMD (permeable
    analytic sphere): compartment state is just more sharded scan carry,
    so statistics must be bit-identical to the single-device run."""
    gradient, dt = example_gradient(30)
    substrate = substrates.sphere(5e-6, perm_prob=0.3)
    kwargs = dict(quiet=True, exchange_stats=True)
    s1, st1 = simulations.simulation(
        250, 2e-9, gradient, dt, substrate, **kwargs
    )
    s8, st8 = simulations.simulation(
        250, 2e-9, gradient, dt, substrate, devices=mesh8, **kwargs
    )
    assert st1["crossings"].max() > 0
    npt.assert_array_equal(st8["crossings"], st1["crossings"])
    npt.assert_array_equal(st8["intra_steps"], st1["intra_steps"])
    npt.assert_allclose(s8, s1, rtol=1e-5, atol=1e-6)


def test_sharded_fused_transit_tracking_matches_single_device(mesh8):
    """Fused transit tracking under shard_map: the per-shard kernels count
    membrane transits with globally-offset walker ids, so the exchange
    statistics must be identical to the single-device fused run."""
    from disimpy_tpu.engine import config

    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([2, 2, 2]), quiet=True, perm_prob=0.5,
    )
    gradient, dt = example_gradient(20)
    kwargs = dict(quiet=True, exchange_stats=True)
    try:
        config.use_fused = True
        config.pallas_interpret = True
        s1, st1 = simulations.simulation(
            250, 2e-9, gradient, dt, substrate, **kwargs
        )
        s8, st8 = simulations.simulation(
            250, 2e-9, gradient, dt, substrate, devices=mesh8, **kwargs
        )
    finally:
        config.use_fused = None
        config.pallas_interpret = False
    assert st1["crossings"].max() > 0
    npt.assert_array_equal(st8["crossings"], st1["crossings"])
    npt.assert_array_equal(st8["intra_steps"], st1["intra_steps"])
    npt.assert_allclose(s8, s1, rtol=1e-5, atol=1e-6)


def test_sharded_mesh_simulation_matches_single_device(mesh8):
    """The hardest sharded path: the mesh bounce machinery under GSPMD.

    Same seed, single device vs 8 virtual devices: the counter-based RNG is
    partitionable, so positions and signals must match to rounding (the
    signal reduction order differs across shardings).
    """
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, n_sv=np.array([2, 2, 2]), quiet=True
    )
    gradient, dt = example_gradient(50)
    # 250 is not divisible by 8: exercises spin padding under the mesh path.
    kwargs = dict(final_pos=True, quiet=True)
    s1, p1 = simulations.simulation(
        250, 2e-9, gradient, dt, substrate, **kwargs
    )
    s8, p8 = simulations.simulation(
        250, 2e-9, gradient, dt, substrate, devices=mesh8, **kwargs
    )
    assert s8.shape == (1,) and p8.shape == (250, 3)
    # Positions match to f32 rounding of the um-scale coordinates (~1e-11
    # m): the XLA query's reduction/re-centering order differs between
    # shardings by an ulp on a handful of grazing bounces.
    npt.assert_allclose(p8, p1, atol=1e-11)
    npt.assert_allclose(s8, s1, rtol=1e-5, atol=1e-6)
