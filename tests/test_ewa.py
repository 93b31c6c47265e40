"""EWA-style anisotropic texture minification (VERDICT r4 #6).

A checkered floor viewed at a grazing angle: the pixel footprint is
hugely elongated along the view direction. A single scalar mip level
must either blur both axes or alias along the view; the EWA-style lookup
(minor-axis mip + probes along the major axis,
path_mis._texture_footprint + textures._eval_leaf) filters the long axis
while keeping the short one sharp. Ground truth = 64-spp jittered
level-0 bilinear (path tracing integrates the true pixel footprint).
"""
import numpy as np

from kazen_tpu.scene import description as D
from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.integrate.render import render

from scenes import make_mesh


def _scene(mip, aniso):
    # 512x512 checker, period 4 texels -> ~0.47-world cells on a 60-unit
    # floor: unresolvable along the grazing view direction, resolvable
    # across it in the near field
    x = np.arange(512)
    cells = ((x[:, None] // 4 + x[None, :] // 4) % 2).astype(np.float32)
    tex = np.repeat(cells[:, :, None], 3, axis=2)
    # edge order (z, x) gives a +y normal WITHOUT flip: flipped quads
    # reverse the uv winding, and the reference's post-hit prep discards
    # dpdu for determinant <= 0 (accel.cpp:218-235 fallback) -- no
    # footprint scale would survive
    floor = make_mesh(
        [-30, 0, 0], [0, 0, 60], [60, 0, 0],
        bsdf=D.Lambertian(albedo=D.ImageTexture(data=tex)),
    )
    cam = D.PerspectiveCamera(
        width=64, height=48, fov=35.0,
        to_world=D.lookat([0.0, 0.35, -1.0], [0.0, 0.0, 12.0], [0, 1, 0]),
    )
    return D.Scene(
        meshes=[floor],
        camera=cam,
        sampler=D.Sampler(kind="independent", sample_count=1, seed=3),
        integrator=D.PathMis(max_depth=2),
        background=D.Background(
            intensity=1.0,
            texture=D.ConstantTexture(color=(1.0, 1.0, 1.0)),
        ),
        mip_textures=mip,
        aniso_textures=aniso,
    )


def _img(mip, aniso, spp):
    arrays, static = compile_scene(_scene(mip, aniso), use_bvh=False)
    return np.asarray(render(arrays, static, spp=spp))


def test_grazing_checker_ewa_beats_isotropic():
    truth = _img(mip=False, aniso=False, spp=64)
    iso = _img(mip=True, aniso=False, spp=2)
    ewa = _img(mip=True, aniso=True, spp=2)

    # find the floor rows (non-black) and take the far (grazing) half
    floor_rows = np.where(truth.mean(axis=(1, 2)) > 0.05)[0]
    far = floor_rows[: len(floor_rows) // 2]
    err_iso = np.abs(iso[far] - truth[far]).mean()
    err_ewa = np.abs(ewa[far] - truth[far]).mean()
    print(f"far rows {far[0]}..{far[-1]}: err iso {err_iso:.4f} ewa {err_ewa:.4f}")
    assert err_ewa < 0.75 * err_iso, (err_ewa, err_iso)
