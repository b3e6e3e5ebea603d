"""Early-course-era procedural images (tasks 02-03), reconstructed exactly.

The reference's tasks 02-06 predate the `.crtscene` format: their goldens
(results/png/02-*.png, 03-*.png, 05-*.png, 06-*.png) were produced by code
at course tags whose source is not in the snapshot, with no scene files.
Three of them are pure deterministic functions of the image size and are
reconstructed here BIT-EXACTLY (verified per-pixel in tests/test_era.py):

  - 03-01 camera-rays: color = (normalize(sx, sy, -1) + 1) / 2 over the
    raster->NDC->screen mapping of crt_camera.cpp:15-26 — the 16x9 and 1x1
    renders predate the aspect-ratio fix (x is NOT aspect-scaled), the
    9x16 render has it.  100.0000 % of pixels reproduce exactly in f32.
  - 02-02 circle: inside iff (x - W/2)^2 + (y - H/2)^2 < 150^2 over
    integer pixel indices; fg (58,118,25)/255, bg (183,183,183)/255.
    Bit-exact.

NOT reconstructable (documented for the corpus table):
  - 02-01 rectangle-grid: a 4x4 grid whose per-BLOCK channel masks are
    fixed but whose per-PIXEL values are C rand() noise — irreproducible
    without the tag's RNG seed/stream.
  - 05-* / 06-*: rendered from mesh data compiled into the tag binaries
    (the blender_crt_tools_addon.py C++-header export), absent from the
    snapshot.
"""

from __future__ import annotations

import numpy as np

ERA02_CIRCLE_RADIUS = 150.0
ERA02_CIRCLE_FG = (58, 118, 25)
ERA02_CIRCLE_BG = (183, 183, 183)


def render_camera_rays(width: int, height: int,
                       aspect: bool = True) -> np.ndarray:
    """The 03-01 camera-ray direction visualization -> [H, W, 3] f32.

    ``aspect=False`` reproduces the pre-aspect-fix 16x9/1x1 renders.
    All arithmetic in f32 to match the reference's float pipeline
    (the 1x1 golden has pixels whose floor() flips under f64).
    """
    w32, h32 = np.float32(width), np.float32(height)
    x = ((np.arange(width, dtype=np.float32) + np.float32(0.5)) / w32
         ) * 2 - 1
    y = 1 - ((np.arange(height, dtype=np.float32) + np.float32(0.5)) / h32
             ) * 2
    if aspect:
        x = x * (w32 / h32)
    d = np.stack(
        [
            np.broadcast_to(x[None, :], (height, width)),
            np.broadcast_to(y[:, None], (height, width)),
            -np.ones((height, width), np.float32),
        ],
        axis=-1,
    )
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    return d * np.float32(0.5) + np.float32(0.5)


def render_circle(width: int, height: int,
                  radius: float = ERA02_CIRCLE_RADIUS,
                  fg=ERA02_CIRCLE_FG, bg=ERA02_CIRCLE_BG) -> np.ndarray:
    """The 02-02 circle image -> [H, W, 3] f32 in [0, 1]."""
    yy, xx = np.mgrid[0:height, 0:width]
    inside = (
        (xx - width / 2.0) ** 2 + (yy - height / 2.0) ** 2 < radius**2
    )
    img = np.where(
        inside[..., None],
        np.asarray(fg, np.float32) / 255.0,
        np.asarray(bg, np.float32) / 255.0,
    )
    return img.astype(np.float32)


# (golden name, render fn) — every early-task PNG that is a pure function
# of the image size; sizes are read from the goldens themselves in tests.
ERA_CASES = [
    ("02-02-circle", lambda w, h: render_circle(w, h)),
    ("03-01-camera-rays-16x9", lambda w, h: render_camera_rays(w, h, False)),
    ("03-01-camera-rays-1x1", lambda w, h: render_camera_rays(w, h, False)),
    ("03-01-camera-rays-9x16", lambda w, h: render_camera_rays(w, h, True)),
]
