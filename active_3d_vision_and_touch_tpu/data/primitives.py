"""Procedural object meshes.

The reference trains on a ~26k-object subset of the ABC CAD dataset
downloaded at setup time (``download_data.sh``); in this framework objects
can also be *generated*: watertight procedural shapes (deformed spheres,
rounded boxes, superquadrics) with matched scale/centering, so the full
pipeline — simulation, dataset dumps, training, policies — runs with zero
external downloads.  Real meshes drop in through the same
``scale_points`` preprocessing (``core.mesh.scale_points``).
"""

from __future__ import annotations

import numpy as np

from active_3d_vision_and_touch_tpu.core.mesh import Mesh, scale_points


def icosphere(subdivisions: int = 3) -> Mesh:
    """Unit icosphere by repeated edge-midpoint subdivision."""
    t = (1.0 + 5**0.5) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdivisions):
        edge_mid: dict[tuple[int, int], int] = {}
        new_faces = []
        verts_list = list(verts)

        def midpoint(a: int, b: int) -> int:
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = verts_list[a] + verts_list[b]
                m = m / np.linalg.norm(m)
                verts_list.append(m)
                edge_mid[key] = len(verts_list) - 1
            return edge_mid[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces)
    return Mesh(verts.astype(np.float32), faces.astype(np.int32))


def _radial_field(directions: np.ndarray, rng: np.random.Generator, bumps: int):
    """Smooth positive radial modulation from random spherical gaussians."""
    centers = rng.normal(size=(bumps, 3))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    amps = rng.uniform(-0.55, 0.8, size=bumps)
    widths = rng.uniform(2.0, 8.0, size=bumps)
    cos = directions @ centers.T  # (V, bumps)
    field = 1.0 + (amps * np.exp(widths * (cos - 1.0))).sum(axis=1)
    return np.maximum(field, 0.3)


def bumpy_sphere(rng: np.random.Generator, subdivisions: int = 3) -> Mesh:
    base = icosphere(subdivisions)
    d = base.verts / np.linalg.norm(base.verts, axis=1, keepdims=True)
    r = _radial_field(d, rng, bumps=int(rng.integers(3, 12)))
    verts = d * r[:, None]
    verts = verts * rng.uniform(0.5, 1.0, size=(1, 3))  # anisotropic squash
    return Mesh(verts.astype(np.float32), base.faces)


def superquadric(
    rng: np.random.Generator, resolution: int = 28
) -> Mesh:
    """Closed superquadric surface mesh (lat/long grid, poles welded)."""
    e1 = float(rng.uniform(0.2, 2.2))
    e2 = float(rng.uniform(0.2, 2.2))
    ax = rng.uniform(0.25, 1.0, size=3)

    def sgnpow(x, p):
        return np.sign(x) * np.abs(x) ** p

    eta = np.linspace(-np.pi / 2, np.pi / 2, resolution)
    omega = np.linspace(-np.pi, np.pi, resolution, endpoint=False)
    E, O = np.meshgrid(eta, omega, indexing="ij")
    x = ax[0] * sgnpow(np.cos(E), e1) * sgnpow(np.cos(O), e2)
    y = ax[1] * sgnpow(np.cos(E), e1) * sgnpow(np.sin(O), e2)
    z = ax[2] * sgnpow(np.sin(E), e1)
    verts = np.stack([x, y, z], -1).reshape(-1, 3)
    faces = []
    for i in range(resolution - 1):
        for j in range(resolution):
            j2 = (j + 1) % resolution
            a = i * resolution + j
            b = i * resolution + j2
            c = (i + 1) * resolution + j
            d = (i + 1) * resolution + j2
            faces += [[a, b, c], [b, d, c]]
    return Mesh(verts.astype(np.float32), np.asarray(faces, np.int32))


def rounded_box(rng: np.random.Generator, subdivisions: int = 3) -> Mesh:
    """Sphere pushed toward a box by an L-p norm (p in [3, 10])."""
    base = icosphere(subdivisions)
    p = float(rng.uniform(3.0, 10.0))
    d = base.verts / np.linalg.norm(base.verts, axis=1, keepdims=True)
    lp = (np.abs(d) ** p).sum(axis=1) ** (1.0 / p)
    verts = d / lp[:, None] * rng.uniform(0.5, 1.0, size=(1, 3))
    return Mesh(verts.astype(np.float32), base.faces)


def torus(rng: np.random.Generator, resolution: int = 24) -> Mesh:
    """Torus with randomized radii (gives the dataset a genus-1 shape —
    concavity + a hole, which the convex-hull-trained policies must probe)."""
    major = float(rng.uniform(0.6, 1.0))
    minor = float(rng.uniform(0.15, 0.45)) * major
    u = np.linspace(0, 2 * np.pi, resolution, endpoint=False)
    v = np.linspace(0, 2 * np.pi, resolution, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    x = (major + minor * np.cos(vv)) * np.cos(uu)
    y = (major + minor * np.cos(vv)) * np.sin(uu)
    z = minor * np.sin(vv)
    verts = np.stack([x, y, z], -1).reshape(-1, 3)
    faces = []
    for i in range(resolution):
        for j in range(resolution):
            i2, j2 = (i + 1) % resolution, (j + 1) % resolution
            a, b = i * resolution + j, i * resolution + j2
            c, d = i2 * resolution + j, i2 * resolution + j2
            faces += [[a, b, c], [b, d, c]]
    squash = rng.uniform(0.6, 1.0, size=(1, 3))
    return Mesh((verts * squash).astype(np.float32), np.asarray(faces, np.int32))


def blob_union(rng: np.random.Generator) -> Mesh:
    """Union of two offset deformed blobs (triangle soup — the voxel-carve
    point extraction, hull grasping, and z-buffer rendering all accept
    non-watertight unions)."""
    a = bumpy_sphere(rng, subdivisions=2)
    b = bumpy_sphere(rng, subdivisions=2)
    offset = rng.uniform(-0.7, 0.7, size=3)
    scale_b = float(rng.uniform(0.4, 0.9))
    verts = np.concatenate([a.verts, b.verts * scale_b + offset.astype(np.float32)])
    faces = np.concatenate([a.faces, b.faces + a.num_verts])
    return Mesh(verts, faces)


GENERATORS = (bumpy_sphere, superquadric, rounded_box, torus, blob_union)


def random_object(seed: int, scale: float = 3.1) -> Mesh:
    """Deterministic procedural object, preprocessed like dataset objects
    (centered, max extent = 1/scale — reference ``data_making.py:76-95``).

    A random global rotation multiplies shape entropy: without it every
    generator family is roughly axis-aligned and a mean-shape prior
    explains most of the distribution (the saturation measured in
    results_div/touch_value.json).
    """
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(seed)
    gen = GENERATORS[int(rng.integers(len(GENERATORS)))]
    mesh = gen(rng)
    rot = R.random(random_state=np.random.RandomState(seed ^ 0x5EED)).as_matrix()
    verts = mesh.verts @ rot.T.astype(np.float32)
    verts = scale_points(verts, scale=scale)
    return Mesh(verts, mesh.faces)
