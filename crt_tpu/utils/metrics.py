"""Observability: ray accounting, throughput, per-trace statistics.

The reference publishes one wall-clock number per render (main.cpp:37-43)
and nothing else.  Here the wavefront structure makes ray accounting *static*
— every trace call's batch size is known at trace time — so a render can
report exact primary/shadow/secondary ray counts, Mrays/s, and (for the
Pallas backend) cluster-binning statistics, with zero device overhead.

``profile_render`` additionally wraps the render in a jax.profiler trace for
per-kernel timing when a TensorBoard-compatible dump is wanted.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import numpy as np

from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops.shade import shade_wavefront
from crt_tpu.renderer import make_tiler, make_trace_fn
from crt_tpu.scene.types import RenderSettings, Scene


@dataclass
class RenderStats:
    width: int = 0
    height: int = 0
    num_traces: int = 0
    rays_traced: int = 0
    primary_rays: int = 0
    wall_seconds: float = 0.0

    @property
    def mrays_per_second(self) -> float:
        if self.wall_seconds <= 0:
            return 0.0
        return self.rays_traced / self.wall_seconds / 1e6

    @property
    def primary_mrays_per_second(self) -> float:
        if self.wall_seconds <= 0:
            return 0.0
        return self.primary_rays / self.wall_seconds / 1e6

    def as_dict(self) -> dict:
        return {
            "resolution": f"{self.width}x{self.height}",
            "num_traces": self.num_traces,
            "rays_traced": self.rays_traced,
            "primary_rays": self.primary_rays,
            "wall_seconds": self.wall_seconds,
            "mrays_per_second": round(self.mrays_per_second, 2),
            "primary_mrays_per_second": round(self.primary_mrays_per_second, 2),
        }


def render_with_stats(
    scene: Scene, settings: RenderSettings | None = None
):
    """Render and return (image, RenderStats) with exact ray accounting.

    The counting wrapper observes trace-time batch shapes (static), so the
    compiled program is identical to the plain render.
    """
    settings = settings or RenderSettings()
    stats = RenderStats(width=scene.width, height=scene.height)

    base = make_trace_fn(scene, settings)

    def counting_trace(origins, dirs, active=None):
        stats.num_traces += 1
        stats.rays_traced += int(np.prod(origins.shape[:-1]))
        return base(origins, dirs, active)

    import jax.numpy as jnp

    h, w = scene.height, scene.width
    rx, ry, untile = make_tiler(h, w)
    origins, dirs = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        w, h, rx, ry,
    )
    stats.primary_rays = h * w

    def run():
        color = shade_wavefront(
            scene, settings, counting_trace, origins, dirs,
            rx.astype(jnp.uint32), ry.astype(jnp.uint32),
        )
        img = untile(color)
        # checksum computed in the same program so the timing readback does
        # not pay a second dispatch round trip
        return img, jnp.sum(img)

    fn = jax.jit(run)
    img, _ = fn()  # compile (counts collected during trace)
    traces_per_run = stats.num_traces
    rays_per_run = stats.rays_traced

    t0 = time.perf_counter()
    img, checksum = fn()
    float(checksum)  # force completion
    stats.wall_seconds = time.perf_counter() - t0
    stats.num_traces = traces_per_run
    stats.rays_traced = rays_per_run
    return img, stats


def profile_render(scene, settings=None, logdir: str = "/tmp/crt_tpu_profile"):
    """Render once under jax.profiler; returns (image, stats, logdir)."""
    settings = settings or RenderSettings()
    with jax.profiler.trace(logdir):
        img, stats = render_with_stats(scene, settings)
    return img, stats, logdir


def binning_stats(scene, settings=None) -> dict:
    """Cluster-binning statistics of the primary wavefront (Pallas phase A)."""
    import jax.numpy as jnp

    from crt_tpu.ops.pallas_trace import (
        TILE_RAYS,
        bin_rays,
        build_cluster_tables,
    )

    tables = build_cluster_tables(scene)
    h, w = scene.height, scene.width
    # Use the renderer's pixel-tile ray ordering — scanline order would
    # report wildly looser frustums than any real trace sees.
    rx, ry, _ = make_tiler(h, w)
    origins, dirs = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        w, h, rx, ry,
    )
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    R = (o.shape[0] // TILE_RAYS) * TILE_RAYS
    _, counts = jax.jit(bin_rays)(tables, o[:R], d[:R])
    counts = np.asarray(counts)
    L = int(tables.n.shape[0])
    return {
        "clusters": L,
        "tiles": int(counts.size),
        "mean_clusters_per_tile": float(counts.mean()),
        "max_clusters_per_tile": int(counts.max()),
        "triangles_tested_per_ray": float(counts.mean()) * tables.n.shape[1],
        "cull_ratio": 1.0 - float(counts.mean()) / max(L, 1),
    }
