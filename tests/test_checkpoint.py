"""Checkpoint/resume helper tests."""

import numpy as np
import numpy.testing as npt

from disimpy_tpu import checkpoint, gradients, simulations, substrates


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    pos = np.random.RandomState(0).random_sample((50, 3)) * 1e-5
    checkpoint.save_checkpoint(path, pos, seed=42, steps_done=100,
                               extra={"note": "segment 1"})
    ck = checkpoint.load_checkpoint(path)
    npt.assert_equal(ck["positions"], pos)
    assert ck["seed"] == 42 and ck["steps_done"] == 100
    assert ck["extra"] == {"note": "segment 1"}
    assert 0 <= ck["resume_seed"] < 2**31
    assert ck["resume_seed"] != 42
    # deterministic, and sensitive to both inputs
    assert ck["resume_seed"] == checkpoint.resume_seed(42, 100)
    assert checkpoint.resume_seed(42, 101) != ck["resume_seed"]
    assert checkpoint.resume_seed(43, 100) != ck["resume_seed"]


def test_resume_through_mesh_substrate(tmp_path):
    """A two-segment run stays leak-free and statistically consistent with
    a single run of the total length (the reference's manual resume path,
    substrates.py:175-186, made explicit)."""
    from disimpy_tpu import meshes

    n_s, n_t = 400, 60
    T = 80e-3
    g = np.zeros((1, 100, 3))
    g[0, 1:11, 0] = 1
    g[0, -11:-1, 0] = -1
    g, dt = gradients.interpolate_gradient(g, T / 99, n_t)
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)

    sub = substrates.mesh(vertices, faces, False, init_pos="intra",
                          n_sv=np.array([3, 3, 3]), quiet=True)
    _, pos1 = simulations.simulation(
        n_s, 2e-9, g[:, : n_t // 2], dt, sub, final_pos=True, quiet=True
    )
    path = str(tmp_path / "seg.npz")
    checkpoint.save_checkpoint(path, pos1, seed=123, steps_done=n_t // 2)
    ck = checkpoint.load_checkpoint(path)

    sub2 = substrates.mesh(vertices, faces, False,
                           init_pos=ck["positions"],
                           n_sv=np.array([3, 3, 3]), quiet=True)
    _, pos2 = simulations.simulation(
        n_s, 2e-9, g[:, n_t // 2:], dt, sub2, final_pos=True,
        seed=ck["resume_seed"], quiet=True,
    )
    # Confined through both segments (closed icosphere, non-periodic).
    c = np.asarray(sub.voxel_size) / 2
    assert np.linalg.norm(pos2 - c, axis=1).max() < 5e-6 * (1 + 1e-3)
    # Mean squared displacement across both segments is consistent with a
    # restricted walk of the full duration (loose statistical check).
    full_msd = ((pos2 - c) ** 2).sum(axis=1).mean()
    assert 0 < full_msd < (5e-6) ** 2
