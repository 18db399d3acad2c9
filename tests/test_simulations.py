"""Physics and integration tests of the simulation driver.

Oracles and tolerances match the reference suite
(disimpy/tests/test_simulations.py:363-832): analytic free-diffusion decay,
MISST matrix-method signals for restricted diffusion, confinement / leak
assertions, sampler distributions, and seed reproducibility.

The default tier runs reduced-size versions that keep the same tolerances
statistically meaningful; the ``slow`` marker selects the reference's
full-size configurations (run with ``pytest -m slow``).
"""

import pickle

import numpy as np
import numpy.testing as npt
import pytest
from scipy.stats import kstest

from disimpy_tpu import gradients, simulations, substrates, utils

SEED = 123
DIFFUSIVITY = 2e-9


def example_gradient(n_t=100):
    T = 80e-3
    gradient = np.zeros((1, 100, 3))
    gradient[0, 1:11, 0] = 1
    gradient[0, -11:-1, 0] = -1
    dt = T / (gradient.shape[1] - 1)
    return gradients.interpolate_gradient(gradient, dt, n_t)


def misst_protocol_gradient(small_delta_ms, bs, n_t=int(1e3)):
    """The PGSE protocols whose MISST solutions are vendored as oracles."""
    if small_delta_ms == 30:
        T, n0, lobe = 70e-3, 700, 300
    else:  # small_delta = 1 ms
        T, n0, lobe = 41e-3, 410, 10
    gradient = np.zeros((1, n0, 3))
    gradient[0, 1:lobe, 0] = 1
    gradient[0, -lobe:-1, 0] = -1
    gradient = np.concatenate([gradient for _ in bs], axis=0)
    dt = T / (n0 - 1)
    gradient, dt = gradients.interpolate_gradient(gradient, dt, n_t)
    gradient = gradients.set_b(gradient, dt, bs)
    return gradient, dt


def load_mesh(oracles_dir, name):
    with open(oracles_dir / name, "rb") as f:
        mesh = pickle.load(f)
    return mesh["vertices"], mesh["faces"]


# ---------------------------------------------------------------------------
# Validation and samplers.
# ---------------------------------------------------------------------------


def test_simulation_validation():
    gradient, dt = example_gradient()
    substrate = substrates.free()
    ok = dict(
        n_walkers=10,
        diffusivity=DIFFUSIVITY,
        gradient=gradient,
        dt=dt,
        substrate=substrate,
        quiet=True,
    )
    for bad in (
        dict(n_walkers=0),
        dict(n_walkers=1.5),
        dict(diffusivity=0.0),
        dict(diffusivity=1),
        dict(gradient=gradient[0]),
        dict(gradient=gradient.astype(int)),
        dict(gradient="g"),
        dict(dt=-1.0),
        dict(dt=1),
        dict(substrate="s"),
        dict(seed=-1),
        dict(seed=1.5),
        dict(traj=5),
        dict(quiet=1),
        dict(cuda_bs=0),
        dict(max_iter=0),
    ):
        with pytest.raises(ValueError):
            simulations.simulation(**{**ok, **bad})


def test__fill_circle():
    np.random.seed(SEED)
    radius = 5e-6
    N = int(1e5)
    points = simulations._fill_circle(N, radius)
    r = np.linalg.norm(points, axis=1)
    npt.assert_equal(np.max(r) < radius, True)
    npt.assert_almost_equal(np.mean(points, axis=0), 0)
    # Radial CDF of a uniform disc is (rho / R)^2.
    _, p = kstest((r / radius) ** 2, "uniform")
    assert p > 1e-3


def test__fill_sphere():
    np.random.seed(SEED)
    radius = 5e-6
    N = int(1e5)
    points = simulations._fill_sphere(N, radius)
    r = np.linalg.norm(points, axis=1)
    npt.assert_equal(np.max(r) < radius, True)
    npt.assert_almost_equal(np.mean(points, axis=0), 0)
    # Radial CDF of a uniform ball is (rho / R)^3.
    _, p = kstest((r / radius) ** 3, "uniform")
    assert p > 1e-3


def test__fill_ellipsoid():
    np.random.seed(SEED)
    N = int(1e5)
    semiaxes = np.array([10e-6, 2e-6, 5e-6])
    points = simulations._fill_ellipsoid(N, semiaxes)
    npt.assert_equal(np.all(np.max(points, axis=0) < semiaxes), True)
    npt.assert_equal(np.all(np.min(points, axis=0) > -semiaxes), True)
    npt.assert_almost_equal(np.mean(points, axis=0), 0)
    u = np.sum((points / semiaxes) ** 2, axis=1) ** 1.5
    _, p = kstest(u, "uniform")
    assert p > 1e-3


def test__initial_positions_cylinder():
    np.random.seed(SEED)
    N = int(1e3)
    r = 5e-6
    R = utils.vec2vec_rotmat(np.array([1.0, 0, 0]), np.array([0, 1.0, 0]))
    pos = simulations._initial_positions_cylinder(N, r, R)
    R_inv = np.linalg.inv(R)
    npt.assert_almost_equal(pos[:, 1], np.zeros(N))
    npt.assert_almost_equal((R_inv @ pos.T)[0], np.zeros(N))


def test__initial_positions_ellipsoid():
    np.random.seed(SEED)
    N = int(1e3)
    r = 5e-6
    R = utils.vec2vec_rotmat(np.array([1.0, 0, 0]), np.array([0, 1.0, 0]))
    semiaxes = np.array([r, r, 1e-22])
    pos = simulations._initial_positions_ellipsoid(N, semiaxes, R)
    R_inv = np.linalg.inv(R)
    npt.assert_almost_equal(pos[:, 2], np.zeros(N))
    npt.assert_almost_equal((R_inv @ pos.T)[2], np.zeros(N))


def _check_fill_mesh_combo(vertices, faces, n_sv, periodic, padding, n_s=int(5e3)):
    substrate = substrates.mesh(
        vertices, faces, periodic, padding=padding, n_sv=n_sv, quiet=True
    )
    r = (substrate.voxel_size - padding * 2) / 2
    points = simulations._fill_mesh(n_s, substrate, True, seed=SEED)
    points = points - (r + padding)
    npt.assert_equal(np.max(np.linalg.norm(points, axis=1)) < np.max(r), True)
    npt.assert_almost_equal(np.mean(points, axis=0), np.zeros(3))
    points = simulations._fill_mesh(n_s, substrate, False, seed=SEED)
    points = points - (r + padding)
    npt.assert_equal(np.min(np.linalg.norm(points, axis=1)) > 0.9 * np.min(r), True)
    npt.assert_almost_equal(np.mean(points, axis=0), np.zeros(3))


def test__fill_mesh(oracles_dir):
    vertices, faces = load_mesh(oracles_dir, "sphere_mesh.pkl")
    for n_sv, periodic, padding in [
        (np.array([10, 10, 10]), True, np.zeros(3)),
        (np.array([10, 10, 10]), False, np.zeros(3) + 1e-6),
        (np.array([1, 5, 20]), False, np.zeros(3)),
        (np.array([1, 1, 1]), True, np.zeros(3) + 1e-6),
    ]:
        _check_fill_mesh_combo(vertices, faces, n_sv, periodic, padding)


@pytest.mark.slow
def test__fill_mesh_full_matrix(oracles_dir):
    vertices, faces = load_mesh(oracles_dir, "sphere_mesh.pkl")
    for n_sv in [np.array([1, 1, 1]), np.array([1, 5, 20]), np.array([10, 10, 10])]:
        for periodic in [True, False]:
            for padding in [np.zeros(3), np.zeros(3) + 1e-6]:
                _check_fill_mesh_combo(vertices, faces, n_sv, periodic, padding)


# ---------------------------------------------------------------------------
# Reproducibility and output modes.
# ---------------------------------------------------------------------------


def test_seed_reproducibility():
    gradient, dt = example_gradient()
    substrate = substrates.sphere(5e-6)
    kwargs = dict(quiet=True)
    s1 = simulations.simulation(500, DIFFUSIVITY, gradient, dt, substrate, **kwargs)
    s2 = simulations.simulation(500, DIFFUSIVITY, gradient, dt, substrate, **kwargs)
    npt.assert_equal(s1, s2)
    s3 = simulations.simulation(
        500, DIFFUSIVITY, gradient, dt, substrate, seed=7, **kwargs
    )
    npt.assert_equal(np.all(s1 != s3), True)


def test_mesh_uniform_seeding_device():
    # init_pos="uniform" seeds walkers ON DEVICE (threefry keyed by the
    # simulation seed; no host sampling or position upload). Contract:
    # same seed => bit-identical simulation, different seed => different,
    # and the ensemble covers the voxel uniformly.
    vertices, faces = substrates._aabb_to_mesh(
        np.zeros(3), np.full(3, 10e-6)
    )
    substrate = substrates.mesh(
        vertices, faces, periodic=True, n_sv=np.array([3, 3, 3]),
        init_pos="uniform", quiet=True,
    )
    gradient = np.zeros((1, 4, 3))
    gradient[0, 1, 0] = 10.0  # unbalanced, O(1) phase spread over the voxel
    dt = 5e-5  # step_l ~ 0.77 um << voxel
    n_s = 4096
    s1, p1 = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, quiet=True, final_pos=True
    )
    s2, p2 = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, quiet=True, final_pos=True
    )
    npt.assert_equal(s1, s2)
    npt.assert_equal(p1, p2)
    s3 = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, seed=7, quiet=True
    )
    assert np.all(s1 != s3)
    # Uniform start + independent displacements modulo the periodic voxel
    # stays exactly uniform: check per-axis coverage of the voxel.
    for axis in range(3):
        u = (p1[:, axis] % 10e-6) / 10e-6
        assert kstest(u, "uniform").pvalue > 1e-4


def test_all_signals_and_final_pos():
    gradient, dt = example_gradient()
    substrate = substrates.free()
    n_s = 200
    total = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, quiet=True
    )
    per_spin = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, quiet=True, all_signals=True
    )
    npt.assert_equal(per_spin.shape, (gradient.shape[0], n_s))
    npt.assert_almost_equal(np.nansum(per_spin, axis=1), total, 4)
    signals, pos = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, quiet=True, final_pos=True
    )
    npt.assert_equal(pos.shape, (n_s, 3))
    npt.assert_almost_equal(signals, total)


def test_add_noise_to_data():
    data = np.ones(10000)
    sigma = 0.1
    noisy = simulations.add_noise_to_data(data, sigma, seed=SEED)
    assert noisy.shape == data.shape
    assert np.all(noisy >= 0)
    npt.assert_almost_equal(np.mean(noisy), 1.0, 2)
    noisy2 = simulations.add_noise_to_data(data, sigma, seed=SEED)
    npt.assert_equal(noisy, noisy2)


# ---------------------------------------------------------------------------
# Free diffusion.
# ---------------------------------------------------------------------------


def _free_diffusion_check(n_s, n_t):
    gradient, dt = example_gradient()
    bs = np.linspace(1, 2e9, 100)
    gradient = np.concatenate([gradient for _ in bs], axis=0)
    gradient, dt = gradients.interpolate_gradient(gradient, dt, n_t)
    gradient = gradients.set_b(gradient, dt, bs)
    substrate = substrates.free()
    signals = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, quiet=True
    )
    npt.assert_almost_equal(signals / n_s, np.exp(-bs * DIFFUSIVITY), 2)


def test_free_diffusion():
    _free_diffusion_check(int(2e4), int(3e2))


@pytest.mark.slow
def test_free_diffusion_full():
    _free_diffusion_check(int(1e5), int(1e3))


def test_free_diffusion_trajectories(tmp_path):
    n_s = int(1e4)
    n_t = int(1e2)
    gradient, dt = example_gradient(n_t)
    traj_file = str(tmp_path / "example_traj.txt")
    simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrates.free(), traj=traj_file, quiet=True
    )
    trajectories = np.loadtxt(traj_file)
    npt.assert_equal(trajectories.shape, (n_t + 1, n_s * 3))
    trajectories = trajectories.reshape((n_t + 1, n_s, 3))
    npt.assert_equal(np.prod(trajectories[0, :, :] == 0), 1)
    npt.assert_almost_equal(np.mean(trajectories[-1], axis=0), 0, 5)


# ---------------------------------------------------------------------------
# Analytic restricted substrates.
# ---------------------------------------------------------------------------


def test_sphere_trajectories_confined(tmp_path):
    n_s, n_t = int(1e2), int(1e2)
    gradient, dt = example_gradient(n_t)
    radius = 5e-6
    traj_file = str(tmp_path / "traj.txt")
    simulations.simulation(
        n_s,
        DIFFUSIVITY,
        gradient,
        dt,
        substrates.sphere(radius),
        traj=traj_file,
        quiet=True,
    )
    trajectories = np.loadtxt(traj_file).reshape((n_t + 1, n_s, 3))
    max_pos = np.max(np.linalg.norm(trajectories, axis=2))
    # Strictly confined up to float32 arithmetic: a near-tangential graze
    # amplifies rounding in the quadratic intersection (cancellation in the
    # discriminant), overshooting the wall by up to ~1e-4 step lengths
    # (~4e-11 m here; the engine default is float32, the reference float64).
    step_l = np.sqrt(6 * DIFFUSIVITY * dt)
    npt.assert_equal(max_pos < radius + 1e-2 * step_l, True)
    npt.assert_almost_equal(max_pos, radius)


def test_cylinder_trajectories_confined(tmp_path):
    n_s, n_t = int(1e2), int(1e2)
    gradient, dt = example_gradient(n_t)
    traj_file = str(tmp_path / "traj.txt")
    for radius in [1e-6, 5e-6, 1e-3]:
        simulations.simulation(
            n_s,
            DIFFUSIVITY,
            gradient,
            dt,
            substrates.cylinder(radius=radius, orientation=np.array([1.0, 0, 0])),
            traj=traj_file,
            quiet=True,
        )
        trajectories = np.loadtxt(traj_file).reshape((n_t + 1, n_s, 3))
        max_pos = np.max(np.linalg.norm(trajectories[..., 1:], axis=2))
        # See the sphere test: float32 tangential-graze overshoot bound.
        step_l = np.sqrt(6 * DIFFUSIVITY * dt)
        npt.assert_equal(max_pos < radius + 1e-2 * step_l, True)
        npt.assert_almost_equal(max_pos, radius)


def test_ellipsoid_trajectories_and_sphere_equivalence(tmp_path):
    n_s, n_t = int(1e2), int(1e2)
    gradient, dt = example_gradient(n_t)
    radius = 5e-6
    traj_file = str(tmp_path / "traj.txt")
    signals = simulations.simulation(
        n_s,
        DIFFUSIVITY,
        gradient,
        dt,
        substrates.ellipsoid(np.ones(3) * radius),
        traj=traj_file,
        quiet=True,
    )
    trajectories = np.loadtxt(traj_file).reshape((n_t + 1, n_s, 3))
    max_pos = np.max(np.linalg.norm(trajectories, axis=2))
    # Strictly confined up to float32 arithmetic: a near-tangential graze
    # amplifies rounding in the quadratic intersection (cancellation in the
    # discriminant), overshooting the wall by up to ~1e-4 step lengths
    # (~4e-11 m here; the engine default is float32, the reference float64).
    step_l = np.sqrt(6 * DIFFUSIVITY * dt)
    npt.assert_equal(max_pos < radius + 1e-2 * step_l, True)
    npt.assert_almost_equal(max_pos, radius)
    # A sphere is the equal-semiaxes ellipsoid: same seed, same initial
    # positions, same step directions -> signals agree to float32 noise.
    signals_sphere = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrates.sphere(radius), quiet=True
    )
    npt.assert_almost_equal(signals / n_s, signals_sphere / n_s, 3)


def _misst_check(kind, small_delta_ms, n_s, n_t=int(1e3), decimal=2):
    bs = np.linspace(1, 3e9, 100)
    gradient, dt = misst_protocol_gradient(small_delta_ms, bs, n_t)
    if kind == "sphere":
        substrate = substrates.sphere(radius=5e-6)
    else:
        substrate = substrates.cylinder(orientation=np.array([0, 0, 1.0]), radius=5e-6)
    signals = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, quiet=True
    )
    misst = np.loadtxt(
        f"tests/oracles/misst_{kind}_signal_smalldelta_{small_delta_ms}ms"
        "_bigdelta_40ms_radius_5um.txt"
    )
    npt.assert_almost_equal(signals / n_s, misst, decimal)


def test_sphere_vs_misst():
    _misst_check("sphere", 30, int(2e4), n_t=int(5e2))


def test_cylinder_vs_misst():
    _misst_check("cylinder", 30, int(2e4), n_t=int(5e2))


@pytest.mark.slow
def test_sphere_vs_misst_full():
    _misst_check("sphere", 30, int(1e5))
    _misst_check("sphere", 1, int(1e5))


@pytest.mark.slow
def test_cylinder_vs_misst_full():
    _misst_check("cylinder", 30, int(1e5))
    _misst_check("cylinder", 1, int(1e5))


def test_cylinder_rotation_invariance():
    n_s, n_t = int(1e4), int(2e2)
    gradient, dt = example_gradient()
    bs = np.linspace(1, 3e9, 20)
    gradient = np.concatenate([gradient for _ in bs], axis=0)
    gradient, dt = gradients.interpolate_gradient(gradient, dt, n_t)
    gradient = gradients.set_b(gradient, dt, bs)
    substrate = substrates.cylinder(orientation=np.array([1.0, 0, 1.0]), radius=5e-6)
    signals_1 = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, quiet=True
    )
    substrate = substrates.cylinder(orientation=-np.array([1.0, 0, 1.0]), radius=5e-6)
    signals_2 = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, quiet=True
    )
    # Antiparallel orientations describe the same cylinder: identical result.
    npt.assert_almost_equal(signals_1 / n_s, signals_2 / n_s)
    # A very large cylinder is effectively free diffusion. 4e4 spins keep
    # the Monte Carlo noise (~sigma/sqrt(n)) safely under the 2-decimal
    # tolerance (the reference's own version uses 1e5,
    # disimpy/tests/test_simulations.py:572-587).
    n_free = int(4e4)
    substrate = substrates.cylinder(orientation=-np.array([1.0, 0, 0]), radius=1e-3)
    signals_3 = simulations.simulation(
        n_free, DIFFUSIVITY, gradient, dt, substrate, quiet=True
    )
    npt.assert_almost_equal(signals_3 / n_free, np.exp(-bs * DIFFUSIVITY), 2)


# ---------------------------------------------------------------------------
# Mesh substrate.
# ---------------------------------------------------------------------------


def _mesh_cylinder_misst_check(
    oracles_dir, periodic, padding, n_sv, n_s=int(1e4), n_t=int(1e3)
):
    vertices, faces = load_mesh(oracles_dir, "cylinder_mesh_closed.pkl")
    bs = np.linspace(1, 3e9, 100)
    gradient, dt = misst_protocol_gradient(30, bs, n_t)
    substrate = substrates.mesh(
        vertices,
        faces,
        periodic,
        padding=padding,
        init_pos="intra",
        n_sv=n_sv,
        quiet=True,
    )
    signals, pos = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate, final_pos=True, quiet=True
    )
    misst = np.loadtxt(
        "tests/oracles/misst_cylinder_signal_smalldelta_30ms_bigdelta_40ms"
        "_radius_5um.txt"
    )
    npt.assert_almost_equal(signals / n_s, misst, 2)
    # Leak checks: spins stay inside the closed cylinder mesh.
    r = np.max(
        np.linalg.norm(
            substrate.vertices[:, 0:2]
            - (substrate.voxel_size[0:2] - padding[0:2] * 2) / 2,
            axis=1,
        )
    )
    length = substrate.voxel_size[2]
    npt.assert_equal(np.min(pos[:, 2]) > 0, True)
    npt.assert_equal(np.max(pos[:, 2]) < length, True)
    npt.assert_equal(
        np.max(
            np.linalg.norm(
                pos[:, 0:2] - np.max(substrate.vertices, axis=0)[0:2] / 2, axis=1
            )
        )
        < r,
        True,
    )


def test_mesh_cylinder_vs_misst(oracles_dir):
    _mesh_cylinder_misst_check(
        oracles_dir,
        periodic=True,
        padding=np.zeros(3),
        n_sv=np.array([10, 10, 10]),
        n_t=int(5e2),
    )


@pytest.mark.slow
def test_mesh_cylinder_vs_misst_full_matrix(oracles_dir):
    for periodic in [True, False]:
        for padding in [np.zeros(3), np.zeros(3) + 1e-6]:
            for n_sv in [
                np.array([1, 1, 1]),
                np.array([1, 5, 20]),
                np.array([10, 10, 10]),
            ]:
                _mesh_cylinder_misst_check(oracles_dir, periodic, padding, n_sv)


def test_mesh_open_cylinder_periodic(oracles_dir):
    vertices, faces = load_mesh(oracles_dir, "cylinder_mesh_open.pkl")
    n_s = int(1e3)
    bs = np.linspace(1, 3e9, 20)
    gradient, dt = misst_protocol_gradient(30, bs, n_t=int(5e2))
    init_pos = np.zeros((n_s, 3)) + np.array([5e-6, 5e-6, 12.5e-6])
    for padding in [np.array([1e-6, 1e-6, 0])]:
        substrate = substrates.mesh(
            vertices,
            faces,
            init_pos=init_pos + padding,
            periodic=True,
            padding=padding,
            n_sv=np.array([10, 10, 10]),
            quiet=True,
        )
        signals, pos = simulations.simulation(
            n_s, DIFFUSIVITY, gradient, dt, substrate, final_pos=True, quiet=True
        )
        r = np.max(
            np.linalg.norm(
                substrate.vertices[:, 0:2]
                - (substrate.voxel_size[0:2] - padding[0:2] * 2) / 2,
                axis=1,
            )
        )
        length = substrate.voxel_size[2]
        # Spins travel beyond the voxel along the open axis...
        npt.assert_equal(np.min(pos[:, 2]) < 0, True)
        npt.assert_equal(np.max(pos[:, 2]) > length, True)
        # ...but stay confined radially.
        npt.assert_equal(
            np.max(
                np.linalg.norm(
                    pos[:, 0:2] - np.max(substrate.vertices, axis=0)[0:2] / 2, axis=1
                )
            )
            < r,
            True,
        )


@pytest.mark.slow
def test_mesh_open_cylinder_periodic_full_matrix(oracles_dir):
    vertices, faces = load_mesh(oracles_dir, "cylinder_mesh_open.pkl")
    n_s = int(1e4)
    bs = np.linspace(1, 3e9, 100)
    gradient, dt = misst_protocol_gradient(30, bs)
    init_pos = np.zeros((n_s, 3)) + np.array([5e-6, 5e-6, 12.5e-6])
    for padding in [np.zeros(3), np.array([1e-6, 1e-6, 0])]:
        for n_sv in [
            np.array([1, 1, 1]),
            np.array([1, 5, 20]),
            np.array([10, 10, 10]),
        ]:
            substrate = substrates.mesh(
                vertices,
                faces,
                init_pos=init_pos + padding,
                periodic=True,
                padding=padding,
                n_sv=n_sv,
                quiet=True,
            )
            signals, pos = simulations.simulation(
                n_s, DIFFUSIVITY, gradient, dt, substrate, final_pos=True, quiet=True
            )
            r = np.max(
                np.linalg.norm(
                    substrate.vertices[:, 0:2]
                    - (substrate.voxel_size[0:2] - padding[0:2] * 2) / 2,
                    axis=1,
                )
            )
            length = substrate.voxel_size[2]
            npt.assert_equal(np.min(pos[:, 2]) < 0, True)
            npt.assert_equal(np.max(pos[:, 2]) > length, True)
            npt.assert_equal(
                np.max(
                    np.linalg.norm(
                        pos[:, 0:2] - np.max(substrate.vertices, axis=0)[0:2] / 2,
                        axis=1,
                    )
                )
                < r,
                True,
            )


def test_mesh_neuron_no_leaks(oracles_dir):
    vertices, faces = load_mesh(oracles_dir, "neuron-model.pkl")
    n_s, n_t = int(3e2), int(5e1)
    gradient = np.ones((1, n_t, 3))
    substrate = substrates.mesh(
        vertices, faces, init_pos="intra", periodic=True, quiet=True
    )
    signals, pos = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, 1e-3, substrate, final_pos=True, quiet=True
    )
    npt.assert_equal(np.all(np.max(pos, axis=0) < substrate.voxel_size), True)
    npt.assert_equal(np.all(np.min(pos, axis=0) > 0), True)


@pytest.mark.slow
def test_mesh_neuron_no_leaks_all_dts(oracles_dir):
    vertices, faces = load_mesh(oracles_dir, "neuron-model.pkl")
    n_s, n_t = int(1e3), int(1e2)
    gradient = np.ones((1, n_t, 3))
    for dt in [1e-5, 1e-3, 1e-1]:
        substrate = substrates.mesh(
            vertices, faces, init_pos="intra", periodic=True, quiet=True
        )
        signals, pos = simulations.simulation(
            n_s, DIFFUSIVITY, gradient, dt, substrate, final_pos=True, quiet=True
        )
        npt.assert_equal(np.all(np.max(pos, axis=0) < substrate.voxel_size), True)
        npt.assert_equal(np.all(np.min(pos, axis=0) > 0), True)


def test_mesh_trajectories_and_init_pos(oracles_dir, tmp_path):
    vertices, faces = load_mesh(oracles_dir, "sphere_mesh.pkl")
    n_s, n_t = int(2e2), int(5e1)
    gradient, dt = example_gradient(n_t)
    substrate = substrates.mesh(
        vertices, faces, False, init_pos="intra", n_sv=np.array([5, 5, 5]), quiet=True
    )
    traj_file = str(tmp_path / "traj.txt")
    signals, pos = simulations.simulation(
        n_s,
        DIFFUSIVITY,
        gradient,
        dt,
        substrate,
        traj=traj_file,
        final_pos=True,
        quiet=True,
    )
    trajectories = np.loadtxt(traj_file).reshape((n_t + 1, n_s, 3))
    npt.assert_almost_equal(trajectories[-1], pos, 8)
    # Resume from the final positions via init_pos (the manual
    # checkpoint/resume path the reference supports).
    substrate2 = substrates.mesh(
        vertices,
        faces,
        False,
        init_pos=pos,
        n_sv=np.array([5, 5, 5]),
        quiet=True,
    )
    signals2 = simulations.simulation(
        n_s, DIFFUSIVITY, gradient, dt, substrate2, quiet=True
    )
    assert signals2.shape == signals.shape
