"""Top-level rendering entry points.

``render_image(scene, settings)`` is the whole public rendering API, mirroring
``crt::render_image`` (crt_renderer.h:27).  The reference's bucket queue +
thread pool (crt_renderer.cpp:157-199) is replaced by one fused XLA program
over the full pixel wavefront; multi-chip scale-out lives in
``crt_tpu.parallel`` (rays sharded over a device mesh instead of buckets over
threads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops import intersect as intersect_ops
from crt_tpu.ops.shade import shade_wavefront
from crt_tpu.scene.types import RenderSettings, Scene


def make_trace_fn(scene: Scene, settings: RenderSettings):
    """Build the intersection backend ``trace_fn(origins, dirs) -> Hit``.

    The triangle-constant table is built from stop-gradiented scene arrays —
    hit *indices* are discrete; the differentiable path recomputes attributes
    in crt_tpu.ops.shade.hit_attributes.
    """
    backend = settings.backend
    if backend == "auto":
        # Brute force is the fastest known-good backend for course-scale
        # scenes (<= 4k triangles); the Pallas tile-binning kernel takes over
        # on TPU once benchmarked faster (see bench.py).
        backend = "bruteforce"

    if backend == "bruteforce":
        tri = intersect_ops.build_triangle_data(
            jax.lax.stop_gradient(scene.vertices),
            scene.tri_vidx,
            scene.mat_backface[scene.tri_material],
        )
        return functools.partial(intersect_ops.closest_hit_bruteforce, tri)
    if backend == "tree":
        from crt_tpu.ops.traverse import make_tree_trace_fn

        return make_tree_trace_fn(scene)
    if backend == "pallas":
        from crt_tpu.ops.pallas_trace import make_pallas_trace_fn

        return make_pallas_trace_fn(scene)
    raise ValueError(f"unknown intersection backend: {backend!r}")


def _render_flat(scene: Scene, settings: RenderSettings) -> jnp.ndarray:
    h, w = scene.height, scene.width
    origins, dirs = camera_ops.generate_rays(
        scene.cam_position,
        scene.cam_rotation,
        scene.cam_tan_half_fov,
        w,
        h,
    )
    origins = origins.reshape(-1, 3)
    dirs = dirs.reshape(-1, 3)

    raster_y, raster_x = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.uint32),
        jnp.arange(w, dtype=jnp.uint32),
        indexing="ij",
    )
    trace_fn = make_trace_fn(scene, settings)
    color = shade_wavefront(
        scene,
        settings,
        trace_fn,
        origins,
        dirs,
        raster_x.reshape(-1),
        raster_y.reshape(-1),
    )
    return color.reshape(h, w, 3)


@jax.jit
def _render_jit(scene: Scene, settings: RenderSettings) -> jnp.ndarray:
    return _render_flat(scene, settings)


def render_image_hwc(
    scene: Scene, settings: RenderSettings | None = None, jit: bool = True
) -> jnp.ndarray:
    """Render to a [height, width, 3] float32 linear-color image."""
    settings = settings or RenderSettings()
    fn = _render_jit if jit else _render_flat
    return fn(scene, settings)


def render_image(
    scene: Scene, settings: RenderSettings | None = None, jit: bool = True
) -> jnp.ndarray:
    """Alias of render_image_hwc — the ``crt::render_image`` equivalent."""
    return render_image_hwc(scene, settings, jit=jit)
