"""Reference-exact f32 oracle for 12-01-textures/scene3 (dragon quad).

Replays the reference's EXACT float32 expression order per pixel — camera
raygen (crt_camera.cpp:7-35), plane hit + barycentrics from cross-product
lengths (crt_intersection.cpp:47-93), uv interpolation (:79), stb-decoded
bitmap texel selection (crt_texture.cpp:38-45), the 12-01-era diffuse
shading (crt_renderer.cpp:81-96, shadows alive but unoccluded here, no GI
divide at that tag) and the PPM quantize (crt_image_ppm.cpp:16-19) — all
with per-op IEEE f32 rounding (NumPy float32 ops are correctly rounded,
matching non-FMA x86-64 scalar SSE2 code).

Purpose: decide whether the ~0.4 % residual on this golden is OUR
renderer's op-order noise (oracle → ~100 % ⇒ fixable) or the reference
build's own rounding (FMA contraction / different libm ⇒ irreducible).

Usage: python tools/oracle_ref_f32.py [--tan f32|f64]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

F = np.float32
SCENE_DIR = "/root/reference/scenes/12-01-textures"
GOLD = "/root/reference/results/png/12-01-textures-scene3.png"


def f32(x):
    return np.asarray(x, np.float32)


def cross(ax, ay, az, bx, by, bz):
    return (
        f32(ay * bz - az * by),
        f32(az * bx - ax * bz),
        f32(ax * by - ay * bx),
    )


def length(x, y, z):
    # x*x + y*y + z*z evaluated left-to-right (crt_vector.h:13-15), then
    # sqrtf (crt_vector.cpp:7-9).
    return np.sqrt(f32(f32(x * x) + f32(y * y)) + f32(z * z))


def main(argv):
    tan_mode = "f32"
    if "--tan" in argv:
        tan_mode = argv[argv.index("--tan") + 1]

    W, H = 1920, 1080
    TW, TH = 540, 360

    from crt_tpu.io import jpeg_stb

    tex = jpeg_stb.decode_file(f"{SCENE_DIR}/textures/dragon.jpg")
    tex = tex.astype(np.float32) / F(255.0)  # stbi texel /255 (crt_image_stbi.cpp:29-37)

    from PIL import Image

    gold = np.asarray(Image.open(GOLD).convert("RGB"), np.int32)

    # --- camera rays (crt_camera.cpp:7-35), identity matrix, origin 0 -----
    pi = F(np.float32(np.pi))  # std::numbers::pi_v<float>
    fov_rad = F(F(F(90.0) * pi) / F(180.0))  # crt_camera.h:20
    half = F(fov_rad * F(0.5))
    if tan_mode == "f32":
        tanh = np.tan(half, dtype=np.float32)
    else:
        tanh = F(np.tan(np.float64(half)))
    xs = np.arange(W, dtype=np.float32)
    ys = np.arange(H, dtype=np.float32)
    dx = F((xs + F(0.5)) / F(W))
    dy = F((ys + F(0.5)) / F(H))
    sx = F(F(F(2.0) * dx) - F(1.0))
    sy = F(F(1.0) - F(F(2.0) * dy))
    sx = F(sx * F(F(W) / F(H)))
    sx = F(sx * tanh)
    sy = F(sy * tanh)
    DX, DY = np.meshgrid(sx, sy)  # [H, W]
    DZ = np.full_like(DX, F(-1.0))
    ln = length(DX, DY, DZ)
    DX, DY, DZ = F(DX / ln), F(DY / ln), F(DZ / ln)

    # --- triangle (scene3: one quad-half at z=-3) -------------------------
    v0 = f32([-1.75, -1.75, -3.0])
    v1 = f32([1.75, -1.75, -3.0])
    v2 = f32([0.0, 1.75, -3.0])
    uv0 = f32([0.0, 0.0, 0.0])
    uv1 = f32([1.0, 0.0, 0.0])
    uv2 = f32([0.5, 1.0, 0.0])

    e0 = v1 - v0  # crt_triangle.h:39-45
    e1 = v2 - v1
    e2 = v0 - v2
    fn = cross(*(v1 - v0), *(v2 - v0))  # ctor edge0 x edge1 (crt_triangle.h:30-32)
    fl = length(*fn)
    fn = (F(fn[0] / fl), F(fn[1] / fl), F(fn[2] / fl))

    # --- intersection (crt_intersection.cpp:47-93) ------------------------
    rnd = F(F(F(fn[0] * DX) + F(fn[1] * DY)) + F(fn[2] * DZ))
    v0o = v0  # v0.position - ray.origin, origin = 0
    opd = F(F(F(fn[0] * v0o[0]) + F(fn[1] * v0o[1])) + F(fn[2] * v0o[2]))
    t = F(opd / rnd)
    PX, PY, PZ = F(DX * t), F(DY * t), F(DZ * t)  # ray.at (crt_ray.h:13-15)

    v0px, v0py, v0pz = F(PX - v0[0]), F(PY - v0[1]), F(PZ - v0[2])
    v1px, v1py, v1pz = F(PX - v1[0]), F(PY - v1[1]), F(PZ - v1[2])
    v2px, v2py, v2pz = F(PX - v2[0]), F(PY - v2[1]), F(PZ - v2[2])

    def edge_ok(e, px, py, pz):
        cx, cy, cz = cross(e[0], e[1], e[2], px, py, pz)
        d = F(F(F(fn[0] * cx) + F(fn[1] * cy)) + F(fn[2] * cz))
        return d >= F(0.0)

    hit = (
        (np.abs(rnd) >= F(1e-6))
        & (t >= F(0.0))
        & edge_ok(e0, v0px, v0py, v0pz)
        & edge_ok(e1, v1px, v1py, v1pz)
        & edge_ok(e2, v2px, v2py, v2pz)
    )

    v0v1 = e0
    v0v2 = -e2
    denom = length(*cross(*v0v1, *v0v2))
    nu = length(*cross(v0px, v0py, v0pz, v0v2[0], v0v2[1], v0v2[2]))
    nv = length(*cross(v0v1[0], v0v1[1], v0v1[2], v0px, v0py, v0pz))
    bu = F(nu / denom)
    bv = F(nv / denom)

    one_m = F(F(F(1.0) - bu) - bv)
    uvx = F(F(F(uv1[0] * bu) + F(uv2[0] * bv)) + F(uv0[0] * one_m))
    uvy = F(F(F(uv1[1] * bu) + F(uv2[1] * bv)) + F(uv0[1] * one_m))

    rx = np.trunc(F(uvx * F(TW))).astype(np.int64) % TW
    ry = np.trunc(F(F(F(1.0) - uvy) * F(TH))).astype(np.int64) % TH
    texel = tex[ry, rx]  # [H, W, 3]

    # --- diffuse shading, 12-01 era (crt_renderer.cpp:81-96) --------------
    lp = f32([5.0, 5.0, 6.0])
    intensity = F(1000.0)
    ldx, ldy, ldz = F(lp[0] - PX), F(lp[1] - PY), F(lp[2] - PZ)
    r2 = F(F(F(ldx * ldx) + F(ldy * ldy)) + F(ldz * ldz))
    lln = np.sqrt(r2)  # normalize uses length() = sqrt(length_squared())
    ldx, ldy, ldz = F(ldx / lln), F(ldy / lln), F(ldz / lln)
    cosl = np.maximum(
        F(0.0), F(F(F(ldx * fn[0]) + F(ldy * fn[1])) + F(ldz * fn[2]))
    )
    area = F(F(F(4.0) * pi) * r2)
    contrib = F(F(F(texel * intensity) / area[..., None]) * cosl[..., None])

    bg = f32([0.0, 0.5, 0.0])
    img = np.where(hit[..., None], contrib, bg)

    # PPM quantize (crt_image_ppm.cpp:16-19): clamp(int(c*255), 0, 255)
    q = np.clip(np.trunc(F(img * F(255.0))).astype(np.int64), 0, 255)

    d = np.abs(q - gold).max(axis=-1)
    bad = d > 0
    print(f"tan={tan_mode}: exact-match frac={1 - bad.mean():.6f} "
          f"bad={bad.sum()} maxdiff={d.max()}")
    tol_bad = d > 2
    print(f"  frac within 2/255: {1 - tol_bad.mean():.6f} ({tol_bad.sum()} beyond)")
    ys_, xs_ = np.nonzero(tol_bad)
    for k in range(0, len(ys_), max(1, len(ys_) // 6)):
        y, x = ys_[k], xs_[k]
        print(f"  ({y},{x}) oracle {q[y, x]} gold {gold[y, x]} "
              f"texel ({ry[y, x]},{rx[y, x]}) uvx*TW={uvx[y, x] * TW:.6f} "
              f"(1-uvy)*TH={(1 - uvy[y, x]) * TH:.6f}")


if __name__ == "__main__":
    main(sys.argv[1:])
