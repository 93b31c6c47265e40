"""Scalar oracle renderer: a per-pixel transliteration of the reference
path_mis pipeline (renderer.cpp renderSample + integrator.cpp:195-338 +
light.cpp + accel.cpp post-hit math) in numpy float32, driven by the
bit-exact oracle RNG. The wavefront renderer must produce the same image at
equal (sampler, spp, seed) within float tolerance -- this stands in for the
C++ renderer, which does not build as checked in (SURVEY §2.4).

Supports: independent/stratified/correlated samplers, perspective camera,
diffuse/lambertian-constant AND kazenstandard (kiss) BSDFs (GGX-Smith
VNDF specular + Disney diffuse/retro/sheen/clearcoat, matching
bsdf.cpp:1157-1418 -- test_parity_hero renders the real 36k-face sweep
scene through it), area lights, box filter.
"""
import numpy as np

import oracle_rng

F32 = np.float32


def normalize(v):
    return v / np.maximum(np.linalg.norm(v), 1e-20).astype(F32)


class OracleSampler:
    """Independent sampler (sampler.cpp:18-71)."""

    def __init__(self, seed=1):
        self.seed = seed
        self.pcg = oracle_rng.PCG32()

    def generate_sample(self, px, py, idx):
        self.pcg.seed(oracle_rng.hash_pixel_seed(px, py, self.seed))
        self.pcg.advance(idx * 65536)

    def next1d(self):
        return F32(self.pcg.next_float())

    def next2d(self):
        return np.array([self.pcg.next_float(), self.pcg.next_float()], F32)


class OracleStratifiedSampler:
    """Stratified sampler (sampler.cpp:81-156)."""

    def __init__(self, sample_count=16, seed=1):
        self.seed = seed
        r = 4
        while r * r < sample_count:
            r += 1
        self.res = r
        self.n = r * r
        self.pcg = oracle_rng.PCG32()

    def generate_sample(self, px, py, idx):
        self.px, self.py, self.idx, self.dim = px, py, idx, 0
        self.pcg.seed(oracle_rng.hash_pixel_seed(px, py, self.seed))
        self.pcg.advance(idx * 65536)

    def next1d(self):
        h = oracle_rng.hash_pixel_dim_seed(self.px, self.py, self.dim, self.seed)
        stratum = oracle_rng.permute(self.idx, self.n, h & 0xFFFFFFFF)
        self.dim += 1
        return F32((stratum + self.pcg.next_float()) / self.n)

    def next2d(self):
        h = oracle_rng.hash_pixel_dim_seed(self.px, self.py, self.dim, self.seed)
        stratum = oracle_rng.permute(self.idx, self.n, h & 0xFFFFFFFF)
        self.dim += 2
        x, y = stratum % self.res, stratum // self.res
        dx, dy = self.pcg.next_float(), self.pcg.next_float()
        return np.array([(x + dx) / self.res, (y + dy) / self.res], F32)


class OracleRenderer:
    def __init__(self, arrays, static):
        g = lambda a: np.asarray(a)
        self.V = g(arrays.V)
        self.F = g(arrays.F)
        self.N = g(arrays.N)
        self.face_mesh = g(arrays.face_mesh)
        self.mesh_material = g(arrays.mesh_material)
        self.mesh_light = g(arrays.mesh_light)
        self.mesh_has_normals = g(arrays.mesh_has_normals)
        self.mesh_has_uvs = g(arrays.mesh_has_uvs)
        self.UV = g(arrays.UV)
        self.mat_btype = g(arrays.materials.btype)
        self.mat_base = g(arrays.materials.base_color)
        self.mat = {
            k: g(getattr(arrays.materials, k))
            for k in (
                "metallic", "roughness", "anisotropy", "specular",
                "specular_tint", "clearcoat", "clearcoat_roughness",
                "sheen", "sheen_tint",
            )
        }
        self.light_mesh = g(arrays.light_mesh)
        self.light_radiance = g(arrays.light_radiance)
        self.light_primary_vis = g(arrays.light_primary_vis)
        self.light_cdf = g(arrays.light_cdf)
        self.light_faces = g(arrays.light_faces)
        self.light_inv_area = g(arrays.light_inv_area)
        self.cam_to_world = g(arrays.cam_to_world)
        self.sample_to_camera = g(arrays.sample_to_camera)
        self.near = F32(arrays.cam_near)
        self.far = F32(arrays.cam_far)
        self.static = static

    # -- geometry ----------------------------------------------------------

    def intersect(self, o, d, mint, maxt):
        """Brute-force nearest hit; returns (face, t, u, v) or None."""
        best = None
        for f in range(self.F.shape[0]):
            i0, i1, i2 = self.F[f]
            p0, p1, p2 = self.V[i0], self.V[i1], self.V[i2]
            e1 = p1 - p0
            e2 = p2 - p0
            pvec = np.cross(d, e2)
            det = F32(np.dot(e1, pvec))
            if -1e-8 < det < 1e-8:
                continue
            inv_det = F32(1.0) / det
            tvec = o - p0
            u = F32(np.dot(tvec, pvec)) * inv_det
            if u < 0 or u > 1:
                continue
            qvec = np.cross(tvec, e1)
            v = F32(np.dot(d, qvec)) * inv_det
            if v < 0 or u + v > 1:
                continue
            t = F32(np.dot(e2, qvec)) * inv_det
            if t < mint or t > maxt:
                continue
            if best is None or t < best[1]:
                best = (f, t, u, v)
        return best

    def prepare(self, o, d, face, t, u, v):
        """Post-hit (accel.cpp:113-236), scalar."""
        i0, i1, i2 = self.F[face]
        p0, p1, p2 = self.V[i0], self.V[i1], self.V[i2]
        n0, n1, n2 = self.N[i0], self.N[i1], self.N[i2]
        mesh = self.face_mesh[face]
        has_n = self.mesh_has_normals[mesh]
        b = np.array([1 - u - v, u, v], F32)
        orig_p = b[0] * p0 + b[1] * p1 + b[2] * p2
        if has_n:
            tmpu, tmpv, tmpw = orig_p - p0, orig_p - p1, orig_p - p2
            dotu = min(F32(0), F32(np.dot(tmpu, n0)))
            dotv = min(F32(0), F32(np.dot(tmpv, n1)))
            dotw = min(F32(0), F32(np.dot(tmpw, n2)))
            tmpu = tmpu - dotu * n0
            tmpv = tmpv - dotv * n1
            tmpw = tmpw - dotw * n2
            p = orig_p + b[0] * tmpu + b[1] * tmpv + b[2] * tmpw
        else:
            p = orig_p
        gn = normalize(np.cross(p1 - p0, p2 - p0))
        sh_normal = (b[0] * n0 + b[1] * n1 + b[2] * n2).astype(F32)
        has_uv = self.mesh_has_uvs[mesh]
        uv0, uv1, uv2 = self.UV[i0], self.UV[i1], self.UV[i2]
        dp0 = p1 - p0
        dp1 = p2 - p0
        duv0 = uv1 - uv0
        duv1 = uv2 - uv0
        det = F32(duv0[0] * duv1[1] - duv0[1] * duv1[0])
        cross_len = F32(np.linalg.norm(np.cross(dp0, dp1)))
        # accel.cpp:166-235: UV tangent frame when available + non-degenerate
        if has_n and has_uv and cross_len > 0 and det > 0:
            inv_det = F32(1.0) / det
            dpdu = ((duv1[1] * dp0 - duv0[1] * dp1) * inv_det).astype(F32)
            sh_n = normalize(sh_normal)
            s = normalize(dpdu - sh_normal * F32(np.dot(sh_normal, dpdu)))
            t_vec = normalize(np.cross(sh_n, s))
        else:
            sh_n = normalize(sh_normal) if has_n else gn
            a = sh_n
            if abs(a[0]) > abs(a[1]):
                inv_len = F32(1.0) / np.sqrt(a[0] * a[0] + a[2] * a[2]).astype(F32)
                t_vec = np.array([a[2] * inv_len, 0.0, -a[0] * inv_len], F32)
            else:
                inv_len = F32(1.0) / np.sqrt(a[1] * a[1] + a[2] * a[2]).astype(F32)
                t_vec = np.array([0.0, a[2] * inv_len, -a[1] * inv_len], F32)
            s = np.cross(t_vec, a).astype(F32)
        return dict(
            p=p, n=sh_n, s=s, t_vec=t_vec, mesh=mesh,
            light=self.mesh_light[mesh], material=self.mesh_material[mesh],
        )

    def to_local(self, its, v):
        return np.array(
            [np.dot(v, its["s"]), np.dot(v, its["t_vec"]), np.dot(v, its["n"])], F32
        )

    def to_world(self, its, v):
        return (v[0] * its["s"] + v[1] * its["t_vec"] + v[2] * its["n"]).astype(F32)

    # -- lights ------------------------------------------------------------

    def sample_light(self, li, ref, sampler):
        u_tri = sampler.next1d()
        row = self.light_cdf[li]
        tri = int(np.searchsorted(row, u_tri, side="right")) - 1
        tri = min(max(tri, 0), self.light_faces.shape[1] - 1)
        face = self.light_faces[li, tri]
        su0 = np.sqrt(sampler.next1d()).astype(F32)
        u = F32(1.0) - su0
        v = sampler.next1d() * su0
        i0, i1, i2 = self.F[face]
        p0, p1, p2 = self.V[i0], self.V[i1], self.V[i2]
        p = p0 + u * (p1 - p0) + v * (p2 - p0)
        mesh = self.light_mesh[li]
        if self.mesh_has_normals[mesh]:
            n0, n1, n2 = self.N[i0], self.N[i1], self.N[i2]
            n = n0 + u * (n1 - n0) + v * (n2 - n0)  # unnormalized (ref quirk)
        else:
            n = normalize(np.cross(p1 - p0, p2 - p0))
        to_l = p - ref
        dist = F32(np.linalg.norm(to_l))
        wi = to_l / max(dist, F32(1e-20))
        cos_theta = F32(np.dot(n, -wi))
        if cos_theta > 0:
            pdf = self.light_inv_area[li] * dist * dist / cos_theta
        else:
            pdf = F32(0.0)
        rad = self.light_radiance[li] if cos_theta > 0 else np.zeros(3, F32)
        if pdf > 0 and np.isfinite(pdf):
            ls = rad / pdf
        else:
            ls = np.zeros(3, F32)
        return dict(p=p, n=n, wi=wi, dist=dist, pdf=pdf, ls=ls)

    def light_eval(self, li, n, wi):
        cos_theta = F32(np.dot(n, -wi))
        return self.light_radiance[li] if cos_theta > 0 else np.zeros(3, F32)

    def light_pdf(self, li, n, wi, dist):
        cos_theta = F32(np.dot(n, -wi))
        if cos_theta > 0:
            return self.light_inv_area[li] * dist * dist / cos_theta
        return F32(0.0)

    # -- BSDFs (diffuse + kiss) --------------------------------------------

    def _ggx_alpha(self, roughness, aniso):
        a = max(F32(1e-3), F32(roughness * roughness))
        return np.array([a * (1 + aniso), a * (1 - aniso)], F32)

    def _ggx_lambda(self, v, alpha):
        sq = (alpha[0]**2 * v[0]**2 + alpha[1]**2 * v[1]**2) / max(v[2]**2, F32(1e-20))
        return F32((-1.0 + np.sqrt(1.0 + sq)) * 0.5)

    def _ggx_g2(self, v, l, h, alpha):
        if np.dot(v, h) <= 0 or np.dot(l, h) < 0:
            return F32(0.0)
        return F32(1.0 / (1.0 + self._ggx_lambda(v, alpha) + self._ggx_lambda(l, alpha)))

    def _ggx_g1(self, v, h, alpha):
        if np.dot(v, h) <= 0:
            return F32(0.0)
        return F32(1.0 / (1.0 + self._ggx_lambda(v, alpha)))

    def _ggx_d(self, h, alpha):
        e = h[0]**2 / alpha[0]**2 + h[1]**2 / alpha[1]**2 + h[2]**2
        return F32(1.0 / (np.pi * alpha[0] * alpha[1] * e * e))

    def _ggx_vndf(self, v, h, alpha):
        vdoth = F32(np.dot(v, h))
        if vdoth <= 0:
            return F32(0.0)
        return F32(self._ggx_d(h, alpha) * self._ggx_g1(v, h, alpha) * vdoth / v[2])

    def _sample_vndf(self, v, alpha, u2):
        vh = normalize(np.array([alpha[0]*v[0], alpha[1]*v[1], v[2]], F32))
        lensq = vh[0]**2 + vh[1]**2
        if lensq > 0:
            t1 = np.array([-vh[1], vh[0], 0.0], F32) / np.sqrt(lensq).astype(F32)
        else:
            t1 = np.array([1.0, 0.0, 0.0], F32)
        t2 = normalize(np.cross(vh, t1).astype(F32))
        r = np.sqrt(u2[0]).astype(F32)
        phi = F32(2.0 * np.pi * u2[1])
        p1 = F32(r * np.cos(phi))
        p2 = F32(r * np.sin(phi))
        sfac = F32(0.5 * (1.0 + vh[2]))
        p2 = F32((1.0 - sfac) * np.sqrt(max(1.0 - p1*p1, 0.0)) + sfac * p2)
        nh = p1*t1 + p2*t2 + np.sqrt(max(1.0 - p1*p1 - p2*p2, 0.0)).astype(F32)*vh
        return normalize(np.array(
            [alpha[0]*nh[0], alpha[1]*nh[1], max(1e-6, nh[2])], F32))

    def _schlick_w(self, x):
        x = min(max(1.0 - x, 0.0), 1.0)
        return F32(x**5)

    def _kiss_eval(self, m, wi, wo, accum):
        if wi[2] <= 0 or wo[2] <= 0:
            return np.zeros(3, F32)
        V, L = wi, wo
        Hv = normalize(V + L)
        cdlin = self.mat_base[m]
        metallic = self.mat["metallic"][m]
        rough = min(F32(1.0), self.mat["roughness"][m] + accum)
        cdlum = F32(cdlin[0]*0.212671 + cdlin[1]*0.715160 + cdlin[2]*0.072169)
        ctint = cdlin / cdlum if cdlum > 0 else np.ones(3, F32)
        st = self.mat["specular_tint"][m]
        ctintmix = F32(0.08) * self.mat["specular"][m] * ((1-st)*np.ones(3, F32) + st*ctint)
        cspec0 = (1-metallic)*ctintmix + metallic*cdlin
        fl = self._schlick_w(L[2]); fv = self._schlick_w(V[2])
        fh = self._schlick_w(np.dot(L, Hv))
        cosd = F32(np.dot(V, Hv))
        lam = F32((1 - 0.5*fl) * (1 - 0.5*fv))
        rr = F32(2.0 * rough * cosd * cosd)
        retro = F32(rr * (fl + fv + fl*fv*(rr - 1.0)))
        sheen_t = self.mat["sheen_tint"][m]
        csheen = (1-sheen_t)*np.ones(3, F32) + sheen_t*ctint
        fsheen = fh * self.mat["sheen"][m] * csheen
        alpha = self._ggx_alpha(rough, self.mat["anisotropy"][m])
        d = self._ggx_d(Hv, alpha)
        g = self._ggx_g2(V, L, Hv, alpha)
        fr = cspec0 + (1.0 - cspec0) * self._schlick_w(np.dot(V, Hv)) * 0 +             (cspec0 + (np.ones(3, F32) - cspec0) * F32(min(max(1.0-np.dot(V, Hv),0.0),1.0)**5)) * 0
        fterm = cspec0 + (np.ones(3, F32) - cspec0) * F32(min(max(1.0-np.dot(V, Hv),0.0),1.0)**5)
        spec = d * g * fterm / max(4.0 * abs(V[2]) * abs(L[2]), 1e-9)
        if V[2] * L[2] < 0:
            spec = np.zeros(3, F32)
        ccr = F32((1 - self.mat["clearcoat_roughness"][m]) * 0.01
                  + self.mat["clearcoat_roughness"][m] * 0.3)
        ca = self._ggx_alpha(ccr, self.mat["anisotropy"][m])
        dc = self._ggx_d(Hv, ca)
        gc = self._ggx_g2(V, L, Hv, ca)
        f04 = np.full(3, 0.04, F32)
        fc = f04 + (np.ones(3, F32) - f04) * F32(min(max(1.0-np.dot(V, Hv),0.0),1.0)**5)
        cc = 0.25 * self.mat["clearcoat"][m] * dc * gc * fc / max(
            4.0 * abs(V[2]) * abs(L[2]), 1e-9)
        if V[2] * L[2] < 0:
            cc = np.zeros(3, F32)
        return ((1-metallic) * (cdlin * F32(1/np.pi) * (lam + retro) + fsheen)
                + spec + cc).astype(F32) * wo[2]

    def _kiss_pdf(self, m, wi, wo, accum):
        if wi[2] <= 0 or wo[2] <= 0:
            return F32(0.0)
        metallic = self.mat["metallic"][m]
        diffuse = F32((1.0 - metallic) * 0.5)
        gtr2 = F32(1.0 / (1.0 + self.mat["clearcoat"][m]))
        Hv = normalize(wi + wo)
        jac = F32(4.0 * np.dot(wi, Hv))
        if jac == 0:
            jac = F32(1e-9)
        rough = min(F32(1.0), self.mat["roughness"][m] + accum)
        alpha = self._ggx_alpha(rough, self.mat["anisotropy"][m])
        spec_pdf = self._ggx_vndf(wi, Hv, alpha) / jac
        ccr = F32((1 - self.mat["clearcoat_roughness"][m]) * 0.01
                  + self.mat["clearcoat_roughness"][m] * 0.3)
        ca = self._ggx_alpha(ccr, 0.0)
        coat_pdf = self._ggx_vndf(wi, Hv, ca) / jac
        return F32(diffuse * (1/np.pi) * wo[2]
                   + (1 - diffuse) * (gtr2 * spec_pdf + (1 - gtr2) * coat_pdf))

    def _kiss_sample(self, m, wi, s1, s2, accum):
        if wi[2] <= 0:
            return None
        metallic = self.mat["metallic"][m]
        diffuse = F32((1.0 - metallic) * 0.5)
        if s1 < diffuse:
            wo = self._cosine_hemi(s2)
        else:
            srs = F32((s1 - diffuse) / max(1.0 - diffuse, 1e-9))
            gtr2 = F32(1.0 / (1.0 + self.mat["clearcoat"][m]))
            flip = wi[2] <= 0
            wiv = -wi if flip else wi
            if srs < gtr2:
                alpha = self._ggx_alpha(self.mat["roughness"][m], self.mat["anisotropy"][m])
            else:
                ccr = F32((1 - self.mat["clearcoat_roughness"][m]) * 0.01
                          + self.mat["clearcoat_roughness"][m] * 0.3)
                alpha = self._ggx_alpha(ccr, 0.0)
            Hv = self._sample_vndf(wiv, alpha, s2)
            if flip:
                Hv = -Hv
            wo = normalize(2.0 * np.dot(wi, Hv) * Hv - wi)
        pdf = self._kiss_pdf(m, wi, wo, accum)
        if wo[2] <= 0 or pdf <= 1e-4 or not np.isfinite(wo).all():
            return dict(wo=np.array([0, 0, 1], F32), weight=np.zeros(3, F32),
                        eta=F32(1.0), discrete=False)
        w = self._kiss_eval(m, wi, wo, accum) / max(pdf, F32(1e-9))
        if not np.isfinite(w).all():
            w = np.zeros(3, F32)
        return dict(wo=wo, weight=w.astype(F32), eta=F32(1.0), discrete=False)

    def _cosine_hemi(self, s2):
        r1 = F32(2.0) * s2[0] - F32(1.0)
        r2 = F32(2.0) * s2[1] - F32(1.0)
        if r1 == 0 and r2 == 0:
            r = phi = F32(0.0)
        elif r1 * r1 > r2 * r2:
            r = r1
            phi = F32(np.pi / 4) * (r2 / r1)
        else:
            r = r2
            phi = F32(np.pi / 2) - (r1 / r2) * F32(np.pi / 4)
        px = r * np.cos(phi).astype(F32)
        py = r * np.sin(phi).astype(F32)
        z = np.sqrt(max(F32(1.0) - px * px - py * py, F32(0.0))).astype(F32)
        if z == 0:
            z = F32(1e-10)
        return np.array([px, py, z], F32)

    def bsdf_eval(self, its, wi, wo, accum=F32(0.0)):
        m = its["material"]
        if self.mat_btype[m] == 8:
            return self._kiss_eval(m, wi, wo, accum)
        if wi[2] <= 0 or wo[2] <= 0:
            return np.zeros(3, F32)
        return self.mat_base[m] * F32(1 / np.pi) * wo[2]

    def bsdf_pdf(self, its, wi, wo, accum=F32(0.0)):
        m = its["material"]
        if self.mat_btype[m] == 8:
            return self._kiss_pdf(m, wi, wo, accum)
        if wi[2] <= 0 or wo[2] <= 0:
            return F32(0.0)
        return F32(1 / np.pi) * wo[2]

    def bsdf_sample(self, its, wi, s1, s2, accum=F32(0.0)):
        m = its["material"]
        if self.mat_btype[m] == 8:
            return self._kiss_sample(m, wi, s1, s2, accum)
        if wi[2] <= 0:
            return None
        # concentric-disk cosine hemisphere (warp.cpp:86-115)
        r1 = F32(2.0) * s2[0] - F32(1.0)
        r2 = F32(2.0) * s2[1] - F32(1.0)
        if r1 == 0 and r2 == 0:
            r = phi = F32(0.0)
        elif r1 * r1 > r2 * r2:
            r = r1
            phi = F32(np.pi / 4) * (r2 / r1)
        else:
            r = r2
            phi = F32(np.pi / 2) - (r1 / r2) * F32(np.pi / 4)
        px = r * np.cos(phi).astype(F32)
        py = r * np.sin(phi).astype(F32)
        z = np.sqrt(max(F32(1.0) - px * px - py * py, F32(0.0))).astype(F32)
        if z == 0:
            z = F32(1e-10)
        wo = np.array([px, py, z], F32)
        weight = self.mat_base[its["material"]].copy()
        return dict(wo=wo, weight=weight, eta=F32(1.0), discrete=False)

    # -- integrator (integrator.cpp:195-338) -------------------------------

    def li(self, sampler, o, d, mint, maxt):
        st = self.static
        eps = F32(st.trace_bias)
        li = np.zeros(3, F32)
        throughput = np.ones(3, F32)
        eta = F32(1.0)
        bsdf_weight = F32(1.0)
        num_lights = st.num_lights

        hit = self.intersect(o, d, mint, maxt)
        if hit is None:
            return li
        its = self.prepare(o, d, *hit)
        t_hit = hit[1]
        if its["light"] >= 0 and not self.light_primary_vis[its["light"]]:
            p_hit = its["p"]
            o2 = p_hit + eps * d
            hit2 = self.intersect(o2, d, F32(1e-4), F32(3.0e38))
            if hit2 is not None:
                its = self.prepare(o2, d, *hit2)
                o = o2

        ray_o, ray_d = o, d
        depth = 0
        while depth < st.max_depth:
            if its["light"] >= 0:
                wi = normalize(its["p"] - ray_o)
                li = li + bsdf_weight * throughput * self.light_eval(
                    its["light"], its["n"], wi
                )
                break

            if depth >= 3:
                prob = min(F32(throughput.max()) * eta * eta, F32(0.95))
                if prob <= sampler.next1d():
                    break
                throughput = throughput / prob

            if num_lights > 0:
                u_pick = sampler.next1d()
                li_idx = min(int(np.floor(num_lights * u_pick)), num_lights - 1)
                ls = self.sample_light(li_idx, its["p"], sampler)
                ls_val = ls["ls"] * F32(num_lights)
                # shadow ray with step-through (integrator.cpp:259-278)
                occluded = False
                so, sm, sx = its["p"], eps, ls["dist"] - eps
                for _ in range(16):
                    sh = self.intersect(so, ls["wi"], sm, sx)
                    if sh is None:
                        break
                    sh_mesh = self.face_mesh[sh[0]]
                    sh_light = self.mesh_light[sh_mesh]
                    if sh_light < 0 or self.light_primary_vis[sh_light]:
                        occluded = True
                        break
                    so = so + ls["wi"] * (sh[1] + eps)
                    sx = sx - sh[1]
                if not occluded:
                    wi_l = self.to_local(its, -ray_d)
                    wo_l = self.to_local(its, ls["wi"])
                    f = self.bsdf_eval(its, wi_l, wo_l)
                    pdf_b = self.bsdf_pdf(its, wi_l, wo_l)
                    lw = power_heuristic(ls["pdf"], pdf_b)
                    li = li + throughput * ls_val * f * lw

            wi_l = self.to_local(its, -ray_d)
            s1 = sampler.next1d()
            s2 = sampler.next2d()
            smp = self.bsdf_sample(its, wi_l, s1, s2)
            if smp is None:
                smp = dict(
                    wo=np.array([0, 0, 1], F32),
                    weight=np.zeros(3, F32),
                    eta=F32(1.0),
                    discrete=False,
                )
            throughput = throughput * smp["weight"]
            eta = eta * smp["eta"]
            if not (throughput > 0).any():
                break

            new_d = self.to_world(its, smp["wo"])
            new_o = its["p"]
            wo_l = smp["wo"]
            bsdf_pdf = self.bsdf_pdf(its, wi_l, wo_l)
            nxt = self.intersect(new_o, new_d, eps, F32(3.0e38))
            if nxt is None:
                break  # background black in these test scenes
            its = self.prepare(new_o, new_d, *nxt)
            ray_o, ray_d = new_o, new_d
            if its["light"] >= 0:
                wi = its["p"] - ray_o
                dist = F32(np.linalg.norm(wi))
                wi = wi / max(dist, F32(1e-20))
                lp = self.light_pdf(its["light"], its["n"], wi, dist)
                bsdf_weight = power_heuristic(bsdf_pdf, lp)
            if smp["discrete"]:
                bsdf_weight = F32(1.0)
            depth += 1
        return li

    def render(self, spp=None):
        st = self.static
        n_samples = spp if spp is not None else st.sample_count
        img = np.zeros((st.height, st.width, 4), F32)
        if st.sampler_kind == "stratified":
            sampler = OracleStratifiedSampler(st.sample_count, seed=st.seed)
        else:
            sampler = OracleSampler(seed=st.seed)
        inv_size = np.array([1.0 / st.width, 1.0 / st.height], F32)
        for y in range(st.height):
            for x in range(st.width):
                for s in range(n_samples):
                    sampler.generate_sample(x, y, s)
                    jitter = sampler.next2d()
                    ps = np.array([x, y], F32) + jitter
                    _aperture = sampler.next2d()
                    # perspective sampleRay (camera.cpp:70-91)
                    pl = np.append(ps * inv_size, F32(0.0))
                    m = self.sample_to_camera
                    hp = m[:3, :3] @ pl + m[:3, 3]
                    w = m[3, :3] @ pl + m[3, 3]
                    near_p = (hp / w).astype(F32)
                    d_local = normalize(near_p)
                    inv_z = F32(1.0) / d_local[2]
                    cw = self.cam_to_world
                    o = cw[:3, 3].astype(F32)
                    d = (cw[:3, :3] @ d_local).astype(F32)
                    val = self.li(
                        sampler, o, d, self.near * inv_z, self.far * inv_z
                    )
                    # box-filter splat (radius 0.5 -> own pixel)
                    if np.isfinite(val).all() and (val >= 0).all():
                        img[y, x, :3] += val
                        img[y, x, 3] += 1.0
        out = np.zeros((st.height, st.width, 3), F32)
        mask = img[..., 3] > 0
        out[mask] = img[mask][:, :3] / img[mask][:, 3:4]
        return out


def power_heuristic(a, b):
    a2 = a * a
    b2 = b * b
    return a2 / (a2 + b2) if a2 > 0 else F32(0.0)
