"""Scene-partitioned rendering: triangles sharded across the mesh.

The course scenes are tiny (<= 4k triangles) so the default data-parallel
path replicates the scene and shards rays (sharded.py).  This module covers
the opposite regime — scenes too large for one chip's HBM: triangles are
Morton-clustered and the *clusters* are sharded over a mesh axis, each
device intersects the (replicated or ray-sharded) wavefront against its
local shard, and per-device partial hits are min-combined across the scene
axis with two ``pmin`` collectives (distance first, then triangle id among
the distance winners).

This is the ray-tracing cousin of sequence-parallel attention: the
reduction over "context" (triangles) is associative, so it distributes over
devices with one small collective per trace instead of any data motion of
the scene.  A 2-D mesh ("rays", "scene") composes both parallelisms.

SURVEY.md §5 "long-context" requirement; no reference equivalent exists
(single process, crt_renderer.cpp:157-199).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops.intersect import Hit, build_triangle_data, closest_hit_bruteforce
from crt_tpu.ops.shade import shade_wavefront
from crt_tpu.scene.types import RenderSettings, Scene

_BIG_ID = jnp.int32(2**30)


def _combine_hits_across(axis: str, hit: Hit) -> Hit:
    """Min-combine partial closest hits over a mesh axis.

    Distance: plain pmin.  Triangle id: the reference's tie rule is
    first-in-traversal-order; across shards we pick the smallest triangle id
    among the lanes achieving the winning distance (ids are globally
    consistent because clusters hold original triangle ids).
    """
    best_t = jax.lax.pmin(hit.t, axis)
    cand = jnp.where(hit.t <= best_t, jnp.where(hit.tri < 0, _BIG_ID, hit.tri),
                     _BIG_ID)
    best_tri = jax.lax.pmin(cand, axis)
    best_tri = jnp.where(best_tri >= _BIG_ID, -1, best_tri)
    return Hit(t=best_t, tri=best_tri)


def pad_triangles_for_shards(scene: Scene, num_shards: int) -> Scene:
    """Pad the triangle list to a shard multiple with degenerate triangles
    (zero-area -> never hit: |n.d| < eps rejects them)."""
    T = scene.num_triangles
    pad = (-T) % num_shards
    if pad == 0:
        return scene
    tri_vidx = jnp.concatenate(
        [scene.tri_vidx, jnp.zeros((pad, 3), jnp.int32)]
    )
    tri_material = jnp.concatenate(
        [scene.tri_material, jnp.zeros((pad,), jnp.int32)]
    )
    return scene.replace(tri_vidx=tri_vidx, tri_material=tri_material)


def make_scene_sharded_trace_fn(scene: Scene, mesh: Mesh, scene_axis: str):
    """trace_fn whose triangle work is sharded over ``scene_axis``.

    Must be called INSIDE shard_map: uses axis_index to pick the local
    triangle shard and pmin to combine.  The scene pytree itself is
    replicated (cheap: SoA arrays) — only the *work* is partitioned; for a
    truly partitioned memory footprint pass an already-sharded scene.
    """
    n_shards = mesh.shape[scene_axis]
    T = scene.num_triangles
    assert T % n_shards == 0, "pad_triangles_for_shards first"
    shard_size = T // n_shards

    def trace(origins, dirs, active=None):
        del active
        k = jax.lax.axis_index(scene_axis)
        lo = k * shard_size
        tri_vidx = jax.lax.dynamic_slice_in_dim(scene.tri_vidx, lo, shard_size)
        tri_mat = jax.lax.dynamic_slice_in_dim(scene.tri_material, lo, shard_size)
        tri = build_triangle_data(
            jax.lax.stop_gradient(scene.vertices),
            tri_vidx,
            scene.mat_backface[tri_mat],
        )
        local = closest_hit_bruteforce(tri, origins, dirs)
        # local ids are shard-relative -> globalize before combining
        local = Hit(t=local.t, tri=jnp.where(local.tri >= 0, local.tri + lo, -1))
        return _combine_hits_across(scene_axis, local)

    return trace


def render_image_scene_sharded(
    scene: Scene,
    settings: RenderSettings | None = None,
    mesh: Mesh | None = None,
    rays_axis: str = "rays",
    scene_axis: str = "scene",
) -> jnp.ndarray:
    """Forward render on a 2-D ("rays", "scene") mesh.

    Pixel rows are sharded over ``rays_axis``; each row block's intersection
    work is split over ``scene_axis`` and pmin-combined.  Output matches the
    single-device render exactly.
    """
    settings = settings or RenderSettings()
    if mesh is None:
        import numpy as np

        devs = np.array(jax.devices())
        mesh = Mesh(devs.reshape(2, -1), (rays_axis, scene_axis))

    n_ray = mesh.shape[rays_axis]
    n_scene = mesh.shape[scene_axis]
    scene = pad_triangles_for_shards(scene, n_scene)

    h, w = scene.height, scene.width
    rows_per = -(-h // n_ray)
    h_pad = rows_per * n_ray

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(rays_axis)),
        out_specs=P(rays_axis, None),
    )
    def _shard(scene_rep, row_starts):
        from crt_tpu.renderer import make_tiler

        rx, ry, untile = make_tiler(rows_per, w, row_offset=row_starts[0])
        origins, dirs = camera_ops.generate_rays(
            scene_rep.cam_position, scene_rep.cam_rotation,
            scene_rep.cam_tan_half_fov, w, h, rx, ry,
        )
        trace_fn = make_scene_sharded_trace_fn(scene_rep, mesh, scene_axis)
        color = shade_wavefront(
            scene_rep, settings, trace_fn,
            origins.reshape(-1, 3), dirs.reshape(-1, 3),
            rx.astype(jnp.uint32), ry.astype(jnp.uint32),
        )
        return untile(color)

    row_starts = jnp.arange(0, h_pad, rows_per, dtype=jnp.int32)
    img = jax.jit(_shard)(scene, row_starts)
    return img[:h]
