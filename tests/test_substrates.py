"""Tests of the substrates module.

Oracles match the reference suite (disimpy/tests/test_substrates.py): the
factory validation matrix, hand-built triangle/box overlap cases, interval
and AABB helpers, and the golden-file subdivision test (output-identical CSR
arrays for sphere_mesh with n_sv=[2, 5, 10]).
"""

import pickle

import numpy as np
import numpy.testing as npt
import pytest

from disimpy_tpu import substrates


def load_mesh(oracles_dir, name):
    with open(oracles_dir / name, "rb") as f:
        mesh = pickle.load(f)
    return mesh["vertices"], mesh["faces"]


def test_free():
    substrate = substrates.free()
    assert isinstance(substrate, substrates._Substrate)
    assert substrate.type == "free"


def test_sphere_validation():
    for bad in ("r", -5e-6, 0.0, 5):
        with pytest.raises(ValueError):
            substrates.sphere(radius=bad)
    substrate = substrates.sphere(5e-6)
    assert substrate.type == "sphere"
    assert substrate.radius == 5e-6


def test_cylinder_validation():
    orientation = np.array([1.0, 2, 0])
    for kwargs in (
        dict(radius="r", orientation=orientation),
        dict(radius=-5e-6, orientation=orientation),
        dict(radius=5e-6, orientation="o"),
        dict(radius=5e-6, orientation=np.arange(4).astype(float)),
        dict(radius=5e-6, orientation=orientation.astype(int)),
    ):
        with pytest.raises(ValueError):
            substrates.cylinder(**kwargs)
    substrate = substrates.cylinder(5e-6, orientation)
    assert substrate.type == "cylinder"
    assert substrate.radius == 5e-6
    npt.assert_equal(substrate.orientation, orientation / np.linalg.norm(orientation))


def test_ellipsoid_validation():
    semiaxes = np.array([5e-6, 1e-6, 10e-6])
    for kwargs in (
        dict(semiaxes="s"),
        dict(semiaxes=np.arange(4).astype(float)),
        dict(semiaxes=np.arange(3)),
        dict(semiaxes=semiaxes, R="R"),
        dict(semiaxes=semiaxes, R=np.eye(4)),
        dict(semiaxes=semiaxes, R=np.eye(3).astype(int)),
        dict(semiaxes=semiaxes, R=np.zeros((3, 3))),
    ):
        with pytest.raises(ValueError):
            substrates.ellipsoid(**kwargs)
    substrate = substrates.ellipsoid(semiaxes)
    npt.assert_equal(substrate.semiaxes, semiaxes)
    npt.assert_equal(substrate.R, np.eye(3))
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]]).astype(float)
    substrate = substrates.ellipsoid(semiaxes, R)
    npt.assert_equal(substrate.R, R)
    assert substrate.type == "ellipsoid"


def test_mesh_validation(oracles_dir):
    vertices, faces = load_mesh(oracles_dir, "sphere_mesh.pkl")
    bad_kwargs = [
        dict(vertices="v", faces=faces, periodic=True),
        dict(vertices=np.zeros(2), faces=faces, periodic=True),
        dict(vertices=np.zeros((1, 4)), faces=faces, periodic=True),
        dict(vertices=vertices.astype(int), faces=faces, periodic=True),
        dict(vertices=vertices, faces="f", periodic=True),
        dict(vertices=vertices, faces=np.zeros(2).astype(int), periodic=True),
        dict(vertices=vertices, faces=np.zeros((1, 4)).astype(int), periodic=True),
        dict(vertices=vertices, faces=faces.astype(float), periodic=True),
        dict(vertices=vertices, faces=faces, periodic=1),
        dict(vertices=vertices, faces=faces, periodic=True, padding="p"),
        dict(vertices=vertices, faces=faces, periodic=True, padding=np.zeros(2)),
        dict(
            vertices=vertices,
            faces=faces,
            periodic=True,
            padding=np.ones(3).astype(int),
        ),
        dict(vertices=vertices, faces=faces, periodic=True, init_pos=np.zeros(1)),
        dict(vertices=vertices, faces=faces, periodic=True, init_pos=np.zeros((1, 4))),
        dict(
            vertices=vertices,
            faces=faces,
            periodic=True,
            init_pos=np.zeros((1, 3)).astype(int),
        ),
        dict(vertices=vertices, faces=faces, periodic=True, init_pos="s"),
        dict(vertices=vertices, faces=faces, periodic=True, n_sv="n"),
        dict(vertices=vertices, faces=faces, periodic=True, n_sv=np.zeros((3, 3))),
        dict(
            vertices=vertices,
            faces=faces,
            periodic=True,
            n_sv=np.zeros(3).astype(float),
        ),
        dict(vertices=vertices, faces=faces, periodic=True, perm_prob=-5.3),
        dict(vertices=vertices, faces=faces, periodic=True, perm_prob="t"),
        dict(vertices=vertices, faces=faces, periodic=True, perm_prob=1),
        dict(vertices=vertices, faces=faces, periodic=True, perm_prob=1.00002),
    ]
    for kwargs in bad_kwargs:
        with pytest.raises(ValueError):
            substrates.mesh(quiet=True, **kwargs)
    substrate = substrates.mesh(vertices, faces, True, quiet=True)
    assert substrate.type == "mesh"


def test_mesh_voxel_construction(oracles_dir):
    vertices, faces = load_mesh(oracles_dir, "sphere_mesh.pkl")
    padding = np.full(3, 1e-6)
    substrate = substrates.mesh(vertices, faces, True, padding=padding, quiet=True)
    # Vertices shifted so AABB-min sits at padding; voxel is AABB + padding.
    npt.assert_almost_equal(np.min(substrate.vertices, axis=0), padding)
    npt.assert_almost_equal(
        substrate.voxel_size, np.max(substrate.vertices, axis=0) + padding
    )
    # Non-periodic: voxel walls appended as 8 vertices / 12 triangles.
    closed = substrates.mesh(vertices, faces, False, padding=padding, quiet=True)
    assert len(closed.vertices) == len(substrate.vertices) + 8
    assert len(closed.faces) == len(substrate.faces) + 12
    npt.assert_almost_equal(np.max(closed.vertices, axis=0), closed.voxel_size)


def test__cross_product_and_dot_product():
    rng = np.random.RandomState(123)
    for _ in range(100):
        a = rng.random_sample(3) - 0.5
        b = rng.random_sample(3) - 0.5
        npt.assert_almost_equal(substrates._cross_product(a, b), np.cross(a, b))
        npt.assert_almost_equal(substrates._dot_product(a, b), np.dot(a, b))


def test__triangle_box_overlap_hand_cases():
    triangle = np.array([[0.5, 0.7, 0.3], [0.9, 0.5, 0.2], [0.6, 0.9, 0.8]])
    box = np.array([[0.1, 0.3, 0.1], [0.4, 0.7, 0.5]])
    assert substrates._triangle_box_overlap(triangle, box) is False
    triangle = np.array([[0.4, 0.7, 0.2], [0.9, 0.5, 0.2], [0.6, 0.9, 0.2]])
    box = np.array([[0.4, 0.4, 0.3], [0.5, 0.8, 0.6]])
    assert substrates._triangle_box_overlap(triangle, box) is False
    triangle = np.array(
        [
            [0.63149023, 0.44235872, 0.77212144],
            [0.25125724, 0.00087658, 0.66026559],
            [0.8319006, 0.52731735, 0.22859846],
        ]
    )
    box = np.array(
        [
            [0.33109806, 0.16637023, 0.91545459],
            [0.79806038, 0.83915475, 0.38118002],
        ]
    )
    assert substrates._triangle_box_overlap(triangle, box) is True


def test__interval_sv_overlap():
    xs = np.arange(11).astype(float)
    npt.assert_equal(substrates._interval_sv_overlap(xs, 0, 0), (0, 1))
    npt.assert_equal(substrates._interval_sv_overlap(xs, 0, 1.5), (0, 2))
    npt.assert_equal(substrates._interval_sv_overlap(xs, 9.5, 1.5), (1, 10))
    npt.assert_equal(substrates._interval_sv_overlap(xs, -1.1, 0.5), (0, 1))
    npt.assert_equal(substrates._interval_sv_overlap(xs, 9.5, 11.5), (9, 10))
    npt.assert_equal(substrates._interval_sv_overlap(xs, 10.0, 10.0), (9, 10))
    npt.assert_equal(substrates._interval_sv_overlap(xs, 11.0, 12.0), (9, 10))


def test__triangle_aabb():
    triangle = np.array([[0.5, 0.7, 0.3], [0.9, 0.5, 0.2], [0.6, 0.9, 0.8]])
    npt.assert_equal(
        substrates._triangle_aabb(triangle),
        np.vstack((np.min(triangle, axis=0), np.max(triangle, axis=0))),
    )


def test__box_subvoxel_overlap():
    xs = np.arange(6).astype(float)
    ys = np.arange(11).astype(float)
    zs = np.arange(21).astype(float)
    box = np.array([[2.5, 5.0, 2.2], [9.2, 9.5, 20]])
    desired = np.array([[2, 5], [5, 10], [2, 20]])
    npt.assert_equal(substrates._box_subvoxel_overlap(box, xs, ys, zs), desired)


def test__mesh_space_subdivision_golden(oracles_dir):
    vertices, faces = load_mesh(oracles_dir, "sphere_mesh.pkl")
    voxel_size = np.max(vertices, axis=0)
    n_sv = np.array([2, 5, 10])
    xs, ys, zs, triangle_indices, subvoxel_indices = substrates._mesh_space_subdivision(
        vertices, faces, voxel_size, n_sv
    )
    npt.assert_almost_equal(xs, np.linspace(0, voxel_size[0], n_sv[0] + 1))
    npt.assert_almost_equal(ys, np.linspace(0, voxel_size[1], n_sv[1] + 1))
    npt.assert_almost_equal(zs, np.linspace(0, voxel_size[2], n_sv[2] + 1))
    desired_triangle_indices = np.load(oracles_dir / "desired_triangle_indices.npy")
    npt.assert_almost_equal(triangle_indices, desired_triangle_indices)
    desired_subvoxel_indices = np.load(oracles_dir / "desired_subvoxel_indices.npy")
    npt.assert_almost_equal(subvoxel_indices, desired_subvoxel_indices)


def test__aabb_to_mesh():
    box = np.array([[2.5, 5.0, 2.2], [9.2, 9.5, 20.0]])
    vertices, faces = substrates._aabb_to_mesh(box[0], box[1])
    assert vertices.shape == (8, 3)
    assert faces.shape == (12, 3)
    # The 12 triangles must tile the box surface exactly: each of the 6
    # faces is covered by triangles with the right total area.
    extents = box[1] - box[0]
    areas = 0.5 * np.linalg.norm(
        np.cross(
            vertices[faces[:, 1]] - vertices[faces[:, 0]],
            vertices[faces[:, 2]] - vertices[faces[:, 0]],
        ),
        axis=1,
    )
    surface = 2 * (
        extents[0] * extents[1] + extents[1] * extents[2] + extents[0] * extents[2]
    )
    npt.assert_almost_equal(np.sum(areas), surface)
    npt.assert_equal(np.min(vertices, axis=0), box[0])
    npt.assert_equal(np.max(vertices, axis=0), box[1])
