"""Shared test scene builders (inline geometry, no OBJ files needed)."""
import numpy as np

from kazen_tpu.scene import description as D


def quad(corner, edge_u, edge_v, flip=False):
    """Two-triangle quad with normals + uvs. Normal = edge_u x edge_v."""
    c = np.asarray(corner, np.float32)
    eu = np.asarray(edge_u, np.float32)
    ev = np.asarray(edge_v, np.float32)
    verts = np.stack([c, c + eu, c + eu + ev, c + ev])
    n = np.cross(eu, ev)
    n = n / np.linalg.norm(n)
    if flip:
        n = -n
        faces = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    else:
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    normals = np.tile(n, (4, 1)).astype(np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return verts, faces, normals, uvs


def make_mesh(corner, eu, ev, bsdf=None, light=None, flip=False):
    v, f, n, uv = quad(corner, eu, ev, flip=flip)
    return D.Mesh(vertices=v, faces=f, normals=n, uvs=uv, bsdf=bsdf, light=light)


def sphere_mesh(center, radius, nu=12, nv=12, bsdf=None, light=None):
    """Lat-long tessellated sphere: 2*nu*nv triangles, smooth normals+uvs."""
    c = np.asarray(center, np.float32)
    us = np.linspace(0.0, 2.0 * np.pi, nu + 1, dtype=np.float32)
    vs = np.linspace(0.0, np.pi, nv + 1, dtype=np.float32)
    uu, vv = np.meshgrid(us, vs, indexing="ij")  # (nu+1, nv+1)
    nx = np.sin(vv) * np.cos(uu)
    ny = np.cos(vv)
    nz = np.sin(vv) * np.sin(uu)
    normals = np.stack([nx, ny, nz], -1).reshape(-1, 3).astype(np.float32)
    verts = (c + radius * normals).astype(np.float32)
    uvs = np.stack(
        [uu / (2.0 * np.pi), vv / np.pi], -1
    ).reshape(-1, 2).astype(np.float32)

    def vid(i, j):
        return i * (nv + 1) + j

    faces = []
    for i in range(nu):
        for j in range(nv):
            a, b_, cc, dd = vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)
            faces.append([a, b_, cc])
            faces.append([a, cc, dd])
    faces = np.asarray(faces, np.int32)
    return D.Mesh(
        vertices=verts, faces=faces, normals=normals, uvs=uvs,
        bsdf=bsdf, light=light,
    )


def cornell_box(
    width=32,
    height=32,
    spp=4,
    sampler="independent",
    max_depth=5,
    light_kwargs=None,
    wall_bsdf=None,
    extra_meshes=(),
    background=None,
    regularization=False,
):
    """A Cornell-style box, camera looking down -z... (+z into the box)."""
    wb = wall_bsdf or D.Diffuse((0.725, 0.71, 0.68))
    red = D.Diffuse((0.63, 0.065, 0.05))
    green = D.Diffuse((0.14, 0.45, 0.091))
    lk = dict(color=(1.0, 1.0, 1.0), intensity=20.0)
    if light_kwargs:
        lk.update(light_kwargs)

    meshes = [
        # floor (y=0), normal +y
        make_mesh([-1, 0, -1], [0, 0, 2], [2, 0, 0], bsdf=wb),
        # ceiling (y=2), normal -y
        make_mesh([-1, 2, -1], [2, 0, 0], [0, 0, 2], bsdf=wb),
        # back wall (z=1): normal -z (toward camera at -z side)
        make_mesh([-1, 0, 1], [0, 2, 0], [2, 0, 0], bsdf=wb),
        # left wall (x=-1), normal +x
        make_mesh([-1, 0, -1], [0, 2, 0], [0, 0, 2], bsdf=red),
        # right wall (x=1), normal -x
        make_mesh([1, 0, -1], [0, 0, 2], [0, 2, 0], bsdf=green),
        # light: small quad under the ceiling, normal -y
        make_mesh(
            [-0.3, 1.98, -0.3], [0.6, 0, 0], [0, 0, 0.6],
            bsdf=D.Diffuse((0, 0, 0)),
            light=D.AreaLight(**lk),
        ),
    ]
    meshes.extend(extra_meshes)

    cam = D.PerspectiveCamera(
        width=width,
        height=height,
        fov=60.0,
        to_world=D.lookat(origin=[0, 1, -2.5], target=[0, 1, 0], up=[0, 1, 0]),
    )
    return D.Scene(
        meshes=meshes,
        camera=cam,
        sampler=D.Sampler(kind=sampler, sample_count=spp),
        integrator=D.PathMis(max_depth=max_depth, regularization=regularization),
        rfilter=D.RFilter(kind="box"),
        background=background,
    )
