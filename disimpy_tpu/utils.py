"""General utility functions: rotations and optional 3D visualization.

Parity with reference ``disimpy/utils.py`` (vec2vec_rotmat at utils.py:11-42,
show_traj at :45-78, show_mesh at :81-111). matplotlib is imported lazily so
the core simulator has no hard plotting dependency.
"""

import numpy as np


def vec2vec_rotmat(v, k):
    """Return the rotation matrix that rotates vector ``v`` onto vector ``k``.

    Parameters
    ----------
    v : numpy.ndarray
        1D array of length 3.
    k : numpy.ndarray
        1D array of length 3.

    Returns
    -------
    R : numpy.ndarray
        3x3 rotation matrix with ``R @ v/|v| = k/|k|``.

    Notes
    -----
    Rodrigues' rotation formula about ``v x k``. Degenerate cases follow the
    reference convention (disimpy/utils.py:29-33): parallel vectors return
    the identity, antiparallel vectors return ``-eye(3)`` (an improper
    "rotation", kept for behavior parity).
    """
    v = np.asarray(v, dtype=float)
    k = np.asarray(k, dtype=float)
    v = v / np.linalg.norm(v)
    k = k / np.linalg.norm(k)
    axis = np.cross(v, k)
    axis_norm = np.linalg.norm(axis)
    if axis_norm < np.finfo(float).eps:
        if np.linalg.norm(v - k) > np.linalg.norm(v):
            return -np.eye(3)
        return np.eye(3)
    axis = axis / axis_norm
    angle = np.arccos(np.dot(v, k))
    K = np.array(
        [
            [0.0, -axis[2], axis[1]],
            [axis[2], 0.0, -axis[0]],
            [-axis[1], axis[0], 0.0],
        ]
    )
    return np.eye(3) + np.sin(angle) * K + (1.0 - np.cos(angle)) * (K @ K)


def _require_matplotlib():
    try:
        import matplotlib.pyplot as plt  # noqa: F401
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "matplotlib is required for visualization; install the 'viz' extra"
        ) from e
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    return plt, Poly3DCollection


def show_traj(traj_file, show=True):
    """Plot random-walker trajectories saved in a trajectories file.

    Parameters
    ----------
    traj_file : str
        Path to a trajectories file: one line per time point, each line
        holding ``walker_1_x walker_1_y walker_1_z walker_2_x ...``.
    show : bool, optional
        If False, return the figure without calling ``plt.show()`` (useful
        for headless testing).

    Returns
    -------
    matplotlib.figure.Figure
    """
    plt, _ = _require_matplotlib()
    trajectories = np.loadtxt(traj_file)
    trajectories = trajectories.reshape(
        (trajectories.shape[0], trajectories.shape[1] // 3, 3)
    )
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    for i in range(trajectories.shape[1]):
        ax.plot(
            trajectories[:, i, 0],
            trajectories[:, i, 1],
            trajectories[:, i, 2],
            alpha=0.5,
        )
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    ax.ticklabel_format(style="sci", scilimits=(0, 0))
    fig.tight_layout()
    if show:  # pragma: no cover
        plt.show()
    return fig


def show_mesh(substrate, seed=123, show=True):
    """Visualize a mesh substrate's triangles with random face colours.

    Parameters
    ----------
    substrate : disimpy_tpu.substrates._Substrate
        A substrate of type "mesh".
    seed : int, optional
        Seed for the random face colours.
    show : bool, optional
        If False, return the figure without calling ``plt.show()``.

    Returns
    -------
    matplotlib.figure.Figure
    """
    plt, Poly3DCollection = _require_matplotlib()
    rng = np.random.default_rng(seed)
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    for idx in substrate.faces:
        tri = Poly3DCollection([substrate.vertices[idx]], alpha=0.5)
        tri.set_facecolor(rng.random(3))
        ax.add_collection3d(tri)
    ax.set_xlim([0, substrate.voxel_size[0]])
    ax.set_ylim([0, substrate.voxel_size[1]])
    ax.set_zlim([0, substrate.voxel_size[2]])
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    ax.ticklabel_format(style="sci", scilimits=(0, 0))
    fig.tight_layout()
    if show:  # pragma: no cover
        plt.show()
    return fig
