"""Scene-partitioned rendering: each device HOLDS 1/N of the scene.

The course scenes are tiny (<= 4k triangles) so the default data-parallel
path replicates the scene and shards rays (sharded.py).  This module covers
the opposite regime — scenes too large for one chip's HBM.  The heavy
per-triangle state is physically partitioned over a mesh axis:

  - the Morton-cluster intersection tables (ClusterTables, 17 f32 per
    triangle slot — the dominant term) sharded over the cluster axis;
  - the packed shading-constant table ([K, T] f32, K = 9..27 — see
    crt_tpu.ops.shade.build_packed) sharded over the triangle axis.

Per trace, each device intersects the wavefront against its local cluster
shard (real Pallas kernel on TPU, the XLA table oracle elsewhere) and
partial hits min-combine across the scene axis with two ``pmin``
collectives.  Shading then needs the winning triangle's constants, which
live on exactly one shard: every device gathers rows for the hits it owns
and one ``psum`` broadcast assembles the full [K, R] row block — the
ray-tracing cousin of sequence-parallel attention (reduction over context
distributes; only O(K x R) activations ever cross the interconnect, never
scene data).

A 2-D ("rays", "scene") mesh composes this with ray data-parallelism.
Replicated remainder: per-triangle material ids (4 B/tri), the per-material
/texture/light tables, and the camera — a few percent of scene bytes.

SURVEY.md §5 "long-context" requirement; no reference equivalent exists
(single process, crt_renderer.cpp:157-199).
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops.intersect import Hit
from crt_tpu.ops.pallas_trace import (
    TILE_RAYS,
    ClusterTables,
    build_cluster_tables,
    closest_hit_pallas_flat,
    closest_hit_tables,
)
from crt_tpu.ops.shade import build_packed, shade_wavefront
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


def _pad_axis(x, mult, axis, fill):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def pad_tables_for_shards(tables: ClusterTables, n: int) -> ClusterTables:
    """Pad the cluster axis to a shard multiple with never-hit clusters:
    degenerate test constants (c=1, n=0), inverted AABBs (binning skips),
    tri_id=-1."""
    INF = jnp.float32(3.4e38)
    return ClusterTables(
        n=_pad_axis(tables.n, n, 0, 0.0),
        nv0=_pad_axis(tables.nv0, n, 0, 0.0),
        m=_pad_axis(tables.m, n, 0, 0.0),
        c=_pad_axis(tables.c, n, 0, 1.0),
        nobf=_pad_axis(tables.nobf, n, 0, 0.0),
        tri_id=_pad_axis(tables.tri_id, n, 0, -1),
        cl_min=_pad_axis(tables.cl_min, n, 0, INF),
        cl_max=_pad_axis(tables.cl_max, n, 0, -INF),
    )


def build_partitioned_tables(scene: Scene, mesh: Mesh, scene_axis: str):
    """(tables, packed, shard_tris) with device placement sharded over
    ``scene_axis`` — no device ever materializes the full tables.

    ``packed`` is padded on the triangle axis to a shard multiple;
    ``shard_tris`` is the static per-shard triangle count.
    """
    n = mesh.shape[scene_axis]
    tables = pad_tables_for_shards(build_cluster_tables(scene), n)
    tables = jax.tree.map(jax.lax.stop_gradient, tables)
    packed = _pad_axis(build_packed(scene), n, 1, 0.0)
    shard_tris = packed.shape[1] // n

    table_sharding = NamedSharding(mesh, P(scene_axis))
    packed_sharding = NamedSharding(mesh, P(None, scene_axis))
    tables = jax.tree.map(
        lambda x: jax.device_put(x, table_sharding), tables
    )
    packed = jax.device_put(packed, packed_sharding)
    return tables, packed, shard_tris


def shard_tables_fit_vmem(local_tables: ClusterTables,
                          budget_bytes: int = 12 << 20) -> bool:
    """Does one device's cluster-table SHARD fit the VMEM-resident kernel?

    Same 17-f32-per-triangle-slot accounting as the flat renderer's guard
    (crt_tpu.renderer._pallas_tables_fit_vmem) applied to the local shard.
    """
    slots = local_tables.n.shape[0] * local_tables.n.shape[1]
    return slots * 17 * 4 <= budget_bytes


def _resolve_shard_backend(local_tables: ClusterTables, backend: str,
                           vmem_budget_bytes: int) -> str:
    """Shard-local backend policy (mirrors renderer.make_trace_fn).

    "auto": VMEM-resident Pallas kernel while the SHARD's tables fit VMEM,
    else the HBM-streaming kernel — the partitioned path's reason to exist
    is scenes whose *shards* are still big (>VMEM per device), so the same
    cliff guard the flat renderer has applies per shard.  Forcing "pallas"
    past the budget warns and falls back instead of hitting a Mosaic VMEM
    OOM inside shard_map.
    """
    fits = shard_tables_fit_vmem(local_tables, vmem_budget_bytes)
    if backend == "auto":
        if jax.default_backend() in ("tpu", "axon"):
            return "pallas" if fits else "pallas_stream"
        return "tables"
    if backend == "pallas" and not fits:
        slots = local_tables.n.shape[0] * local_tables.n.shape[1]
        warnings.warn(
            f"scene shard's cluster tables ({slots * 17 * 4} bytes) exceed "
            f"the VMEM budget ({vmem_budget_bytes}); falling back to the "
            f"HBM-streaming kernel (local_backend='pallas_stream')",
            stacklevel=3,
        )
        return "pallas_stream"
    return backend


def _make_partitioned_stream_fn(local_tables: ClusterTables, scene_axis: str,
                                tile_rays: int | None = None,
                                sc_clusters: int | None = None,
                                interpret: bool | None = None,
                                shadow_k: int = 2):
    """Partitioned trace through the HBM-STREAMING kernel — the >VMEM(/HBM)
    regime: each device streams its table shard's supercluster slices
    HBM->VMEM (ops/pallas_stream) and partial hits pmin-combine across the
    scene axis.  Composes the long-context axis with the big-scene kernel:
    a scene too large for ONE chip's HBM renders from N shards each of
    which only ever stages ~34 KB of geometry in VMEM per grid step.

    Shadow wavefronts get the same apex (light-side shaft + cone + wedge)
    binning as the single-device stream path; per-shard occlusion bits
    OR-combine (pmax) across the scene axis.
    """
    from crt_tpu.ops import pallas_stream as ps

    tile_rays = tile_rays or TILE_RAYS
    sc = sc_clusters or ps.SC_CLUSTERS
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if interpret is None:
        interpret = not on_tpu
    # Off-TPU the kernel cannot run under shard_map at all: the Pallas HLO
    # interpreter cannot eval kernels whose operands carry varying manual
    # axes (same constraint as pallas_segsum._segment_accumulate_xla) — so
    # CPU-mesh tests evaluate the stream SEMANTICS through the XLA table
    # oracle over the identical padded shard tables, while the kernel
    # itself is interpret-parity-gated single-device
    # (tests/test_pallas_stream.py) and runs for real on TPU.
    use_oracle = interpret
    tables, sc_min, sc_max = ps.build_supercluster_boxes(local_tables, sc)

    def trace(origins, dirs, active=None):
        batch_shape = origins.shape[:-1]
        o = jax.lax.stop_gradient(origins).reshape(-1, 3)
        d = jax.lax.stop_gradient(dirs).reshape(-1, 3)
        R = o.shape[0]
        pad = (-R) % tile_rays
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            dpad = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], d.dtype),
                            (pad, 1))
            d = jnp.concatenate([d, dpad])
        if active is not None:
            a = jax.lax.stop_gradient(active).reshape(-1)
            if pad:
                a = jnp.concatenate([a, jnp.zeros((pad,), bool)])
        else:
            a = jnp.concatenate(
                [jnp.ones((R,), bool), jnp.zeros((pad,), bool)]
            ) if pad else None
        if use_oracle:
            hit = closest_hit_tables(tables, o, d)
        else:
            hit, _ = ps.closest_hit_stream_flat(
                tables, sc_min, sc_max, o, d, a,
                tile_rays=tile_rays, interpret=False,
            )
        local = Hit(
            t=hit.t[:R].reshape(batch_shape),
            tri=hit.tri[:R].reshape(batch_shape),
        )
        return _combine_hits_across(scene_axis, local)

    def _occl_local(shadow_o, light_dirs, r2, light_positions, active,
                    origin_slack, per_tile_cap=None):
        """One per-shard streaming occlusion pass + pmax OR-combine."""
        Ll, R = r2.shape
        o_flat = jnp.broadcast_to(
            shadow_o[None], (Ll, R, 3)
        ).reshape(-1, 3)
        apex = jnp.repeat(light_positions, R // tile_rays, axis=0)
        occ = ps.occluded_stream_flat(
            tables, sc_min, sc_max, o_flat, light_dirs.reshape(-1, 3),
            r2.reshape(-1), active.reshape(-1),
            apex, jnp.float32(origin_slack),
            tile_rays=tile_rays, interpret=interpret,
            per_tile_cap=per_tile_cap,
        )
        occ = jax.lax.pmax(occ.astype(jnp.int32), scene_axis) > 0
        return occ.reshape(Ll, R)

    def shadow_apex(shadow_o, light_dirs, r2, light_positions, active,
                    origin_slack):
        """[Ll, R] occlusion with apex shadow binning per shard; bits
        OR-combine across the scene axis (a lane is shadowed iff ANY shard
        holds a blocker).  Two-phase (CRT_STREAM_SHADOW_K, the big-scene
        shadow win — see ops/pallas_stream.occluded_stream_twophase)
        composes with the partitioning: phase-1 occlusion pmax-combines
        BEFORE compaction, so a lane blocked by any shard's near walk is
        dropped from every shard's full phase-2 walk; the survivor
        permutation is shard-invariant (computed from the combined bits),
        keeping the compacted wavefront identical on all devices."""
        import os

        Ll, R = r2.shape
        if use_oracle or R % tile_rays:
            sh = trace(
                jnp.broadcast_to(shadow_o[None], (Ll, R, 3)).reshape(-1, 3),
                light_dirs.reshape(-1, 3),
                jax.lax.stop_gradient(active).reshape(-1),
            )  # already pmin-combined across shards
            sh_t = jax.lax.stop_gradient(sh.t)
            occ = (sh.tri >= 0) & (sh_t * sh_t <= r2.reshape(-1))
            return occ.reshape(Ll, R)
        shadow_o = jax.lax.stop_gradient(shadow_o)
        light_dirs = jax.lax.stop_gradient(light_dirs)
        r2 = jax.lax.stop_gradient(r2)
        light_positions = jax.lax.stop_gradient(light_positions)
        active = jax.lax.stop_gradient(active)

        # RenderSettings.stream_shadow_k plumbed from the renderer (matches
        # the flat path, pallas_stream.make_stream_trace_fn); the env var
        # remains the A/B override only.
        k = int(os.environ.get("CRT_STREAM_SHADOW_K", str(shadow_k)))
        if k <= 0:
            return _occl_local(shadow_o, light_dirs, r2, light_positions,
                               active, origin_slack)
        occ1 = _occl_local(shadow_o, light_dirs, r2, light_positions,
                           active, origin_slack, per_tile_cap=k)
        surv = active & jnp.logical_not(occ1)
        # per-light stable compaction (see occluded_stream_twophase)
        perm = jnp.argsort(jnp.logical_not(surv), axis=1, stable=True)
        d2 = jnp.take_along_axis(light_dirs, perm[..., None], axis=1)
        o2 = jnp.take_along_axis(
            jnp.broadcast_to(shadow_o[None], (Ll, R, 3)), perm[..., None],
            axis=1,
        )
        r2_2 = jnp.take_along_axis(r2, perm, axis=1)
        a2 = jnp.take_along_axis(surv, perm, axis=1)
        apex = jnp.repeat(light_positions, R // tile_rays, axis=0)
        occ2 = ps.occluded_stream_flat(
            tables, sc_min, sc_max, o2.reshape(-1, 3), d2.reshape(-1, 3),
            r2_2.reshape(-1), a2.reshape(-1), apex,
            jnp.float32(origin_slack),
            tile_rays=tile_rays, interpret=interpret,
        )
        occ2 = (
            jax.lax.pmax(occ2.astype(jnp.int32), scene_axis) > 0
        ).reshape(Ll, R)
        inv = jnp.argsort(perm, axis=1)
        occ2_back = jnp.take_along_axis(occ2, inv, axis=1)
        return occ1 | (occ2_back & surv)

    trace.shadow_apex = shadow_apex
    return trace


def make_partitioned_trace_fn(local_tables: ClusterTables, scene_axis: str,
                              backend: str = "auto",
                              vmem_budget_bytes: int = 12 << 20,
                              stream_tile_rays: int | None = None,
                              sc_clusters: int | None = None,
                              stream_interpret: bool | None = None,
                              stream_shadow_k: int = 2):
    """trace_fn over a LOCAL cluster-table shard + pmin combine.

    Must be called inside shard_map.  ``active`` masks feed the Pallas
    binning (dead tiles cost nothing); cluster tri_ids are global, so no
    id translation is needed.  Backends: "pallas" (VMEM-resident cluster
    kernel), "pallas_stream" (HBM-streaming supercluster kernel — shards
    beyond the per-device VMEM budget), "tables" (XLA oracle, CPU tests);
    "auto" picks per the shard-size VMEM guard.
    """
    backend = _resolve_shard_backend(local_tables, backend,
                                     vmem_budget_bytes)
    if backend == "pallas_stream":
        return _make_partitioned_stream_fn(
            local_tables, scene_axis, tile_rays=stream_tile_rays,
            sc_clusters=sc_clusters, interpret=stream_interpret,
            shadow_k=stream_shadow_k,
        )

    def trace(origins, dirs, active=None):
        o = jax.lax.stop_gradient(origins.reshape(-1, 3))
        d = jax.lax.stop_gradient(dirs.reshape(-1, 3))
        if backend == "pallas":
            from crt_tpu.ops.pallas_trace import TILE_RAYS

            pad = (-o.shape[0]) % TILE_RAYS
            a = None if active is None else jax.lax.stop_gradient(
                active.reshape(-1)
            )
            if pad:
                o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
                d = jnp.concatenate(
                    [d, jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (pad, 1))]
                )
                if a is not None:
                    a = jnp.concatenate([a, jnp.zeros((pad,), bool)])
            local = closest_hit_pallas_flat(local_tables, o, d, a)
            local = Hit(t=local.t[: origins.shape[0]],
                        tri=local.tri[: origins.shape[0]])
        else:
            local = closest_hit_tables(local_tables, o, d)
        local = Hit(
            t=local.t.reshape(origins.shape[:-1]),
            tri=local.tri.reshape(origins.shape[:-1]),
        )
        return _combine_hits_across(scene_axis, local)

    return trace


def make_partitioned_rows_fn(local_packed: jnp.ndarray, shard_tris: int,
                             scene_axis: str):
    """Row gather for hit_attributes over a packed-table shard.

    Each device gathers the rows of hits whose triangle it owns (masked
    local gather) and a single psum assembles the full [K, R] block on
    every device — the only cross-device motion of shading data.
    """

    def rows_fn(tri):
        k = jax.lax.axis_index(scene_axis)
        local = tri - k * shard_tris
        mine = (local >= 0) & (local < shard_tris)
        rows = local_packed[:, jnp.clip(local, 0, shard_tris - 1)]
        rows = jnp.where(mine[None, :], rows, 0.0)
        return jax.lax.psum(rows, scene_axis)

    return rows_fn


def render_image_scene_sharded(
    scene: Scene,
    settings: RenderSettings | None = None,
    mesh: Mesh | None = None,
    rays_axis: str = "rays",
    scene_axis: str = "scene",
    local_backend: str = "auto",
    vmem_budget_bytes: int = 12 << 20,
    stream_tile_rays: int | None = None,
    sc_clusters: int | None = None,
) -> jnp.ndarray:
    """Forward render on a 2-D ("rays", "scene") mesh with the scene's
    per-triangle state physically partitioned over ``scene_axis``.

    Pixel rows are sharded over ``rays_axis``; intersection + shading
    constants are sharded over ``scene_axis`` (see module docstring).
    Output matches the single-device render up to f32 reduction order.
    Shards beyond ``vmem_budget_bytes`` of cluster tables route through the
    HBM-streaming kernel (``local_backend="pallas_stream"``) — the >VMEM
    regime the partitioning exists for.
    """
    settings = settings or RenderSettings()
    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs.reshape(2, -1), (rays_axis, scene_axis))

    n_ray = mesh.shape[rays_axis]
    tables, packed, shard_tris = build_partitioned_tables(
        scene, mesh, scene_axis
    )

    h, w = scene.height, scene.width
    rows_per = -(-h // n_ray)
    h_pad = rows_per * n_ray

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(scene_axis), P(None, scene_axis), P(rays_axis)),
        out_specs=P(rays_axis, None),
    )
    def _shard(scene_rep, tables_local, packed_local, row_starts):
        from crt_tpu.ops.shade_iter import shade_wavefront_iter
        from crt_tpu.renderer import make_tiler, use_iterative_wavefront

        rx, ry, untile = make_tiler(rows_per, w, row_offset=row_starts[0])
        origins, dirs = camera_ops.generate_rays(
            scene_rep.cam_position, scene_rep.cam_rotation,
            scene_rep.cam_tan_half_fov, w, h, rx, ry,
        )
        trace_fn = make_partitioned_trace_fn(
            tables_local, scene_axis, local_backend,
            vmem_budget_bytes=vmem_budget_bytes,
            stream_tile_rays=stream_tile_rays, sc_clusters=sc_clusters,
            stream_shadow_k=settings.stream_shadow_k,
        )
        rows_fn = make_partitioned_rows_fn(
            packed_local, shard_tris, scene_axis
        )
        # Same shading-strategy policy as the single-device renderer:
        # branching Whitted trees (refractive depth>=2, GI) go through the
        # O(depth) bank wavefront instead of re-unrolling 2^depth traces.
        # Refractive scenes work here too: the transmissive shadow
        # marching's vertex reads route through the rows_fn psum exchange.
        if use_iterative_wavefront(scene_rep, settings):
            color = shade_wavefront_iter(
                scene_rep, settings, trace_fn,
                origins.reshape(-1, 3), dirs.reshape(-1, 3),
                rx.astype(jnp.uint32), ry.astype(jnp.uint32),
                rows_fn=rows_fn, vary_axes=(rays_axis,),
            )
        else:
            color = shade_wavefront(
                scene_rep, settings, trace_fn,
                origins.reshape(-1, 3), dirs.reshape(-1, 3),
                rx.astype(jnp.uint32), ry.astype(jnp.uint32),
                rows_fn=rows_fn,
            )
        return untile(color)

    # the heavy arrays were already consumed into tables/packed; ship a
    # slim scene so no device replicates the full geometry
    slim = scene.replace(
        vertices=jnp.zeros((0, 3), jnp.float32),
        vertex_normals=jnp.zeros((0, 3), jnp.float32),
        vertex_uvs=jnp.zeros((0, 3), jnp.float32),
        tri_vidx=jnp.zeros((0, 3), jnp.int32),
        accel=None,
    )
    row_starts = jnp.arange(0, h_pad, rows_per, dtype=jnp.int32)
    img = jax.jit(_shard)(slim, tables, packed, row_starts)
    return img[:h]


def scene_sharded_value_and_grad(
    scene: Scene,
    target: jnp.ndarray,  # [H, W, 3]
    params: dict | None = None,
    settings: RenderSettings | None = None,
    mesh: Mesh | None = None,
    rays_axis: str = "rays",
    scene_axis: str = "scene",
    local_backend: str = "auto",
    vmem_budget_bytes: int = 12 << 20,
    stream_tile_rays: int | None = None,
    sc_clusters: int | None = None,
):
    """L2 loss + scene-parameter gradients on the 2-D (rays x scene) mesh.

    The partitioned-scene *training step*: rows sharded over ``rays_axis``,
    per-triangle state over ``scene_axis`` (pmin hit-combine + psum row
    exchange, exactly the forward path of render_image_scene_sharded), with
    gradients flowing back THROUGH the psum row exchange into the scene
    parameters.  Differentiable-parameter plumbing:

      - trainable params (sharded.default_trainable_params by default) are
        replicated — like any data-parallel trainer replicates its weights;
      - the packed shading-constant table is rebuilt from the params inside
        the step and dynamic-sliced to the local shard, so AD's transpose
        of the slice + psum exchange routes each hit row's cotangent to the
        owning shard and on into vertices/albedo/lights/camera (the
        transient full [K, T] build is per-step scratch; the PERSISTENT
        partitioned state — cluster tables, packed shards — stays 1/N);
      - intersection runs on prebuilt stop-gradient cluster-table shards
        (hit ids are discrete per the gradient contract, BASELINE.json).

    Returns (loss, grads), both replicated; parity with the single-device
    ``jax.grad`` of the same loss is gated by tests/test_scene_sharded.py.
    """
    from crt_tpu.parallel.sharded import default_trainable_params

    settings = settings or RenderSettings()
    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs.reshape(2, -1), (rays_axis, scene_axis))
    n_ray = mesh.shape[rays_axis]
    n_scene = mesh.shape[scene_axis]
    params = params if params is not None else default_trainable_params(scene)

    tables, _packed0, shard_tris = build_partitioned_tables(
        scene, mesh, scene_axis
    )

    h, w = scene.height, scene.width
    rows_per = -(-h // n_ray)
    h_pad = rows_per * n_ray
    if h_pad != h:
        pad = jnp.zeros((h_pad - h, w, 3), target.dtype)
        target = jnp.concatenate([target, pad], axis=0)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(scene_axis), P(rays_axis), P(rays_axis)),
        out_specs=(P(), P()),
    )
    def _step(scene_rep, p, tables_local, target_rows, row_starts):
        from crt_tpu.ops.shade_iter import shade_wavefront_iter
        from crt_tpu.renderer import make_tiler, use_iterative_wavefront

        def loss_fn(p):
            s = scene_rep.replace(**p)
            packed_full = _pad_axis(build_packed(s), n_scene, 1, 0.0)
            k = jax.lax.axis_index(scene_axis)
            packed_local = jax.lax.dynamic_slice_in_dim(
                packed_full, k * shard_tris, shard_tris, axis=1
            )
            rx, ry, untile = make_tiler(rows_per, w,
                                        row_offset=row_starts[0])
            origins, dirs = camera_ops.generate_rays(
                s.cam_position, s.cam_rotation, s.cam_tan_half_fov,
                w, h, rx, ry,
            )
            trace_fn = make_partitioned_trace_fn(
                tables_local, scene_axis, local_backend,
                vmem_budget_bytes=vmem_budget_bytes,
                stream_tile_rays=stream_tile_rays, sc_clusters=sc_clusters,
                stream_shadow_k=settings.stream_shadow_k,
            )
            rows_fn = make_partitioned_rows_fn(
                packed_local, shard_tris, scene_axis
            )
            if use_iterative_wavefront(s, settings):
                color = shade_wavefront_iter(
                    s, settings, trace_fn,
                    origins.reshape(-1, 3), dirs.reshape(-1, 3),
                    rx.astype(jnp.uint32), ry.astype(jnp.uint32),
                    rows_fn=rows_fn, vary_axes=(rays_axis,),
                )
            else:
                color = shade_wavefront(
                    s, settings, trace_fn,
                    origins.reshape(-1, 3), dirs.reshape(-1, 3),
                    rx.astype(jnp.uint32), ry.astype(jnp.uint32),
                    rows_fn=rows_fn,
                )
            img = untile(color)
            valid = (row_starts[0] + jnp.arange(rows_per)) < h
            err = jnp.where(valid[:, None, None], img - target_rows, 0.0)
            return jnp.sum(err * err) / (h * w * 3)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        # loss varies over rays only (the psum row exchange already left
        # color scene-invariant); grads come back replicated via AD's
        # transpose of the replicated->varying casts (see sharded.py).
        loss = jax.lax.psum(loss, rays_axis)
        return loss, grads

    # the step rebuilds packed/rays from params; strip only the prebuilt
    # accel (tri_vidx and vertex tables are needed by build_packed)
    slim = scene.replace(accel=None)
    row_starts = jnp.arange(0, h_pad, rows_per, dtype=jnp.int32)
    return jax.jit(_step)(slim, params, tables, target, row_starts)
