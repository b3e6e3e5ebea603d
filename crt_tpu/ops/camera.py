"""Vectorized pinhole camera ray generation.

The reference generates one ray per pixel in a scalar loop
(crt_camera.cpp:7-35).  Here the whole raster grid is produced at once:
raster -> NDC -> screen -> world is pure elementwise math plus one [R,3]@[3,3]
matmul, which XLA fuses into the downstream intersection kernels.

Exact semantics preserved from the reference:
  - pixel centers at +0.5 (crt_camera.cpp:11);
  - y flipped: screen_y = 1 - 2*ndc_y (crt_camera.cpp:19);
  - aspect ratio applied to x only (crt_camera.cpp:22);
  - tan(fov/2) applied to BOTH x and y (crt_camera.cpp:25-26);
  - direction (sx, sy, -1) rotated by the camera matrix using the row-vector
    convention and then normalized (crt_camera.cpp:30-32);
  - default FOV 90 degrees (crt_camera.h:13-15).
"""

from __future__ import annotations

import jax.numpy as jnp

from crt_tpu.ops import vecmath


def generate_rays(
    cam_position: jnp.ndarray,  # [3]
    cam_rotation: jnp.ndarray,  # [3, 3] row-major
    tan_half_fov: jnp.ndarray,  # [] tan(fov/2)
    width: int,
    height: int,
    raster_x: jnp.ndarray | None = None,  # optional [...] pixel x coords
    raster_y: jnp.ndarray | None = None,  # optional [...] pixel y coords
):
    """Return (origins [..., 3], directions [..., 3]) for the given pixels.

    With no explicit coords, generates the full [height, width] grid.
    """
    if raster_x is None:
        raster_y, raster_x = jnp.meshgrid(
            jnp.arange(height, dtype=jnp.float32),
            jnp.arange(width, dtype=jnp.float32),
            indexing="ij",
        )
    raster_x = jnp.asarray(raster_x, jnp.float32)
    raster_y = jnp.asarray(raster_y, jnp.float32)

    ndc_x = (raster_x + 0.5) / width
    ndc_y = (raster_y + 0.5) / height
    screen_x = 2.0 * ndc_x - 1.0
    screen_y = 1.0 - 2.0 * ndc_y
    screen_x = screen_x * (float(width) / float(height))
    screen_x = screen_x * tan_half_fov
    screen_y = screen_y * tan_half_fov

    local = jnp.stack(
        [screen_x, screen_y, -jnp.ones_like(screen_x)], axis=-1
    )  # [..., 3]
    world = vecmath.rotate_rows(local, cam_rotation)
    directions = vecmath.normalize(world)
    origins = jnp.broadcast_to(cam_position, directions.shape)
    return origins, directions
