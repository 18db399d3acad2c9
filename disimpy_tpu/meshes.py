"""Procedural triangular-mesh generators.

Utilities for building common microstructure geometries as (vertices, faces)
arrays ready for :func:`disimpy_tpu.substrates.mesh`. The reference package
ships only pickled example meshes; these generators make it possible to
construct parameterized substrates (and large benchmark geometries)
programmatically.
"""

import numpy as np


def cylinder_mesh(radius, length, n_facets=32, n_segments=8, closed=False, axis=2):
    """Triangulated cylinder surface.

    Parameters
    ----------
    radius : float
        Cylinder radius.
    length : float
        Cylinder length along ``axis``.
    n_facets : int, optional
        Number of facets around the circumference.
    n_segments : int, optional
        Number of segments along the axis.
    closed : bool, optional
        If True, add end-cap fans so the surface is watertight.
    axis : int, optional
        Cylinder axis (0, 1, or 2).

    Returns
    -------
    vertices : numpy.ndarray of shape (n_vertices, 3)
    faces : numpy.ndarray of shape (n_faces, 3)
    """
    theta = np.linspace(0, 2 * np.pi, n_facets, endpoint=False)
    zs = np.linspace(0, length, n_segments + 1)
    ring = np.stack((radius * np.cos(theta), radius * np.sin(theta)), axis=1)
    vertices = np.concatenate(
        [np.column_stack((ring, np.full(n_facets, z))) for z in zs], axis=0
    )
    faces = []
    for s in range(n_segments):
        base = s * n_facets
        nxt = (s + 1) * n_facets
        for f in range(n_facets):
            f1 = (f + 1) % n_facets
            faces.append([base + f, base + f1, nxt + f])
            faces.append([base + f1, nxt + f1, nxt + f])
    if closed:
        bottom = len(vertices)
        top = bottom + 1
        vertices = np.vstack((vertices, [[0.0, 0.0, 0.0]], [[0.0, 0.0, length]]))
        last = n_segments * n_facets
        for f in range(n_facets):
            f1 = (f + 1) % n_facets
            faces.append([f1, f, bottom])
            faces.append([last + f, last + f1, top])
    vertices = np.asarray(vertices, dtype=float)
    faces = np.asarray(faces, dtype=int)
    if axis != 2:
        order = [0, 1, 2]
        order[axis], order[2] = order[2], order[axis]
        vertices = vertices[:, order]
    return vertices, faces


def icosphere(radius=1.0, subdivisions=2):
    """Geodesic sphere from recursive icosahedron subdivision.

    Each subdivision multiplies the face count by 4 (20 * 4^k faces).

    Returns
    -------
    vertices : numpy.ndarray of shape (n_vertices, 3)
    faces : numpy.ndarray of shape (20 * 4^subdivisions, 3)
    """
    phi = (1 + np.sqrt(5)) / 2
    vertices = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        dtype=float,
    )
    vertices /= np.linalg.norm(vertices, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ]
    )
    for _ in range(subdivisions):
        midpoint_cache = {}
        verts = list(vertices)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in midpoint_cache:
                m = (verts[a] + verts[b]) / 2
                m /= np.linalg.norm(m)
                midpoint_cache[key] = len(verts)
                verts.append(m)
            return midpoint_cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        vertices = np.asarray(verts)
        faces = np.asarray(new_faces)
    return vertices * radius, faces


def cylinder_array_mesh(
    radius,
    spacing,
    grid=(4, 4),
    length=None,
    n_facets=16,
    n_segments=4,
):
    """Square-packed array of parallel open cylinders (an axon-bundle-like
    substrate with intra- and extra-cylinder compartments).

    Cylinders run along z; use with ``periodic=True`` so walkers see an
    infinite packed bundle. Total triangles: ``grid[0] * grid[1] *
    n_facets * n_segments * 2``.

    Parameters
    ----------
    radius : float
        Cylinder radius.
    spacing : float
        Center-to-center spacing (must be > 2 * radius).
    grid : tuple of int, optional
        Number of cylinders along x and y.
    length : float, optional
        Cylinder length (defaults to ``spacing * max(grid)``).
    n_facets, n_segments : int, optional
        Tessellation resolution per cylinder.

    Returns
    -------
    vertices : numpy.ndarray
    faces : numpy.ndarray
    """
    if length is None:
        length = spacing * max(grid)
    v0, f0 = cylinder_mesh(radius, length, n_facets, n_segments, closed=False)
    all_vertices = []
    all_faces = []
    offset = 0
    for i in range(grid[0]):
        for j in range(grid[1]):
            center = np.array([(i + 0.5) * spacing, (j + 0.5) * spacing, 0.0])
            all_vertices.append(v0 + center)
            all_faces.append(f0 + offset)
            offset += len(v0)
    return np.concatenate(all_vertices), np.concatenate(all_faces)


def load_stl(path):
    """Load a triangular mesh from an STL file (binary or ASCII).

    Returns ``(vertices, faces)`` with duplicate vertices merged (STL
    stores one independent triangle per facet; simulation substrates need
    shared vertices so adjacent triangles share edges exactly).

    Parameters
    ----------
    path : str

    Returns
    -------
    vertices : numpy.ndarray of shape (n_vertices, 3)
    faces : numpy.ndarray of shape (n_triangles, 3)
    """
    with open(path, "rb") as f:
        head = f.read(5)
        f.seek(0)
        if head == b"solid":
            # Could still be binary (some exporters write "solid" headers):
            # try ASCII, fall back to binary on parse failure.
            try:
                return _dedup_triangles(_read_stl_ascii(f))
            except ValueError:
                f.seek(0)
        return _dedup_triangles(_read_stl_binary(f))


def _read_stl_ascii(f):
    import re

    text = f.read().decode("ascii", errors="replace")
    coords = re.findall(
        r"vertex\s+([-\d.eE+]+)\s+([-\d.eE+]+)\s+([-\d.eE+]+)", text
    )
    if not coords or len(coords) % 3:
        raise ValueError("not a valid ASCII STL")
    tri = np.array(coords, dtype=float).reshape(-1, 3, 3)
    return tri


def _read_stl_binary(f):
    f.seek(80)
    (n,) = np.frombuffer(f.read(4), dtype="<u4")
    data = np.frombuffer(f.read(int(n) * 50), dtype=np.uint8)
    if data.size != n * 50:
        raise ValueError("truncated binary STL")
    rec = data.reshape(int(n), 50)
    tri = (
        rec[:, 12:48].copy().view("<f4").reshape(int(n), 3, 3).astype(float)
    )
    return tri


def _dedup_triangles(tri):
    flat = tri.reshape(-1, 3)
    vertices, inverse = np.unique(flat, axis=0, return_inverse=True)
    faces = inverse.reshape(-1, 3)
    return vertices, faces


def save_stl(path, vertices, faces):
    """Write a triangular mesh as a binary STL file.

    Parameters
    ----------
    path : str
    vertices : array-like of shape (n_vertices, 3)
    faces : array-like of shape (n_triangles, 3)
    """
    vertices = np.asarray(vertices, dtype=float)
    faces = np.asarray(faces)
    tri = vertices[faces]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    normals = np.cross(e1, e2)
    norms = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.where(norms == 0, 1.0, norms)
    n = len(tri)
    rec = np.zeros(n, dtype=np.dtype(
        [("normal", "<f4", 3), ("v", "<f4", (3, 3)), ("attr", "<u2")]
    ))
    rec["normal"] = normals
    rec["v"] = tri
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(np.uint32(n).tobytes())
        f.write(rec.tobytes())


def load_ply(path):
    """Load a triangular mesh from an ASCII PLY file.

    Returns ``(vertices, faces)``. Only the x/y/z vertex properties and
    triangular faces are read; quads are fan-triangulated.
    """
    with open(path, "rb") as f:
        lines = f.read().decode("ascii", errors="replace").splitlines()
    if not lines or lines[0].strip() != "ply":
        raise ValueError(f"{path} is not a PLY file")
    n_vert = n_face = None
    props = []
    in_vertex = False
    i = 1
    fmt = None
    while i < len(lines):
        parts = lines[i].split()
        i += 1
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            in_vertex = parts[1] == "vertex"
            if parts[1] == "vertex":
                n_vert = int(parts[2])
            elif parts[1] == "face":
                n_face = int(parts[2])
        elif parts[0] == "property" and in_vertex:
            props.append(parts[-1])
        elif parts[0] == "end_header":
            break
    if fmt != "ascii":
        raise ValueError("only ASCII PLY files are supported")
    if n_vert is None or n_face is None:
        raise ValueError("PLY header missing vertex/face elements")
    ix, iy, iz = (props.index(a) for a in ("x", "y", "z"))
    vert_rows = lines[i:i + n_vert]
    vertices = np.array(
        [[float(r.split()[j]) for j in (ix, iy, iz)] for r in vert_rows]
    )
    faces = []
    for r in lines[i + n_vert:i + n_vert + n_face]:
        parts = [int(x) for x in r.split()]
        k, idx = parts[0], parts[1:]
        for j in range(1, k - 1):  # fan triangulation
            faces.append([idx[0], idx[j], idx[j + 1]])
    return vertices, np.array(faces, dtype=int)
