"""Single-pixel ray flight recorder — the DebugLog equivalent.

The reference collects rays for one hard-coded pixel and flushes them as
``bpy.ops.crt.debug_ray_add(...)`` lines for visual replay in Blender
(crt_debug.cpp:11-39).  Here any pixel can be traced on demand: the
wavefront is shrunk to that single pixel and shading runs *un-jitted*, so a
recording wrapper around the trace function sees concrete values and logs
every traced ray (primary, shadow, reflection, refraction, GI) with its hit
distance.

``to_blender_script`` writes the same ``bpy.ops.crt.debug_ray_add`` replay
lines the reference emits (same argument set, crt_debug.cpp:29-38) for use
with the Blender add-on's debug-ray operator.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np
import jax.numpy as jnp

from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops.shade import shade_wavefront
from crt_tpu.renderer import make_trace_fn
from crt_tpu.scene.types import RenderSettings


@dataclass
class RayLogEntry:
    origin: np.ndarray
    direction: np.ndarray
    length: float  # hit distance, inf on miss
    order: int  # trace order (0 = primary)


@dataclass
class DebugRayLog:
    raster_x: int
    raster_y: int
    color: np.ndarray = None
    entries: List[RayLogEntry] = field(default_factory=list)

    def to_blender_script(self) -> str:
        """Replay lines in the reference's format (crt_debug.cpp:29-38)."""
        lines = []
        for e in self.entries:
            if not np.isfinite(e.length):
                length = 1.0
            else:
                length = float(e.length)
            lines.append(
                "bpy.ops.crt.debug_ray_add("
                f"origin=({e.origin[0]}, {e.origin[1]}, {e.origin[2]}), "
                f"direction=({e.direction[0]}, {e.direction[1]}, {e.direction[2]}), "
                f"length={length}, "
                f"depth={e.order}, "
                f"raster_coords=({self.raster_x}, {self.raster_y}), "
                "axis_forward='-Z', axis_up='Y')"
            )
        return "\n".join(lines) + "\n"


def trace_pixel(scene, raster_x: int, raster_y: int,
                settings: RenderSettings | None = None) -> DebugRayLog:
    """Shade one pixel, recording every ray the wavefront traces for it."""
    settings = settings or RenderSettings()
    log = DebugRayLog(raster_x=raster_x, raster_y=raster_y)

    base_trace = make_trace_fn(scene, settings)
    counter = [0]

    def recording_trace(origins, dirs, active=None):
        hit = base_trace(origins, dirs, active)
        o = np.asarray(origins).reshape(-1, 3)
        d = np.asarray(dirs).reshape(-1, 3)
        t = np.asarray(hit.t).reshape(-1)
        for k in range(len(o)):
            log.entries.append(
                RayLogEntry(o[k], d[k], float(t[k]), counter[0])
            )
        counter[0] += 1
        return hit

    origins, dirs = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height,
        jnp.asarray([float(raster_x)]), jnp.asarray([float(raster_y)]),
    )
    color = shade_wavefront(
        scene, settings, recording_trace,
        origins.reshape(-1, 3), dirs.reshape(-1, 3),
        jnp.asarray([raster_x], jnp.uint32), jnp.asarray([raster_y], jnp.uint32),
    )
    log.color = np.asarray(color)[0]
    return log
