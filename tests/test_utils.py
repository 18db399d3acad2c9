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
