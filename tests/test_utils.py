"""Tests of the utils module (oracle: disimpy/tests/test_utils.py)."""

import numpy as np
import numpy.testing as npt

from disimpy_tpu import utils


def test_vec2vec_rotmat_aligns_vectors():
    rng = np.random.RandomState(123)
    for _ in range(1000):
        a = rng.random_sample(3) - 0.5
        b = rng.random_sample(3) - 0.5
        R = utils.vec2vec_rotmat(a, b)
        rotated = R @ a
        npt.assert_array_almost_equal(
            rotated / np.linalg.norm(rotated), b / np.linalg.norm(b)
        )
        # Proper rotation.
        npt.assert_almost_equal(np.linalg.det(R), 1.0)
        npt.assert_array_almost_equal(R.T @ R, np.eye(3))


def test_vec2vec_rotmat_degenerate_cases():
    v = np.array([0.0, 0.0, 2.0])
    npt.assert_array_almost_equal(utils.vec2vec_rotmat(v, v), np.eye(3))
    npt.assert_array_almost_equal(utils.vec2vec_rotmat(v, -v), -np.eye(3))


def test_camino_traj_roundtrip(tmp_path):
    rng = np.random.RandomState(7)
    traj = rng.random_sample((11, 5, 3)) * 1e-5
    dt = 2.5e-4
    out = str(tmp_path / "walkers.traj")
    n = utils.save_camino_traj(out, traj, dt)
    assert n == 11 * 5
    back, dt_back = utils.load_camino_traj(out)
    npt.assert_array_almost_equal(back, traj)
    npt.assert_almost_equal(dt_back, dt)
    # Byte layout: big-endian float64 header [duration, n_walkers, n_t].
    header = np.fromfile(out, dtype=">f8", count=3)
    npt.assert_allclose(header, [10 * dt, 5.0, 11.0])


def test_camino_traj_from_ascii_file(tmp_path):
    rng = np.random.RandomState(8)
    traj = rng.random_sample((4, 3, 3)) * 1e-5
    ascii_path = str(tmp_path / "traj.txt")
    with open(ascii_path, "w") as f:
        for t in range(traj.shape[0]):
            f.write(" ".join(repr(float(v)) for v in traj[t].ravel()) + "\n")
    out = str(tmp_path / "walkers.traj")
    utils.save_camino_traj(out, ascii_path, 1e-4)
    back, _ = utils.load_camino_traj(out)
    npt.assert_array_almost_equal(back, traj)
