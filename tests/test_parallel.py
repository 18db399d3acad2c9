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


def test_sharded_mesh_simulation(mesh8):
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, n_sv=np.array([2, 2, 2]), quiet=True
    )
    gradient, dt = example_gradient(50)
    signals, pos = simulations.simulation(
        256,
        2e-9,
        gradient,
        dt,
        substrate,
        devices=mesh8,
        final_pos=True,
        quiet=True,
    )
    assert signals.shape == (1,)
    assert np.isfinite(signals).all()
    assert pos.shape == (256, 3)
