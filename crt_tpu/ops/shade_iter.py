"""Iterative bank-structured Whitted wavefront — O(depth) trace programs.

The recursive wavefront in crt_tpu.ops.shade unrolls the reference's
shade_ray recursion (crt_renderer.cpp:46-145) at trace time: a refractive
scene compiles 2^depth trace programs and a GI scene (K+2)^depth scan
branches.  This module replaces the call *tree* with a depth-bounded
``lax.scan`` over a fixed-capacity ray pool: each iteration traces the whole
pool once, so a depth-D render compiles exactly D+1 trace launches
regardless of branching.

Pool layout — the TPU-native trick.  The pool is B *banks* of R lanes, and
slot (b, p) permanently belongs to pixel p.  Consequences:

  - path radiance accumulates ELEMENTWISE into a [B, R, 3] buffer and the
    final image is one ``sum(axis=0)`` — no scatter-adds;
  - spawned children (the refractive Fresnel pair's second ray, the K
    diffuse-GI samples) only ever move along the tiny bank axis: free-slot
    matching is a cumsum + one-hot product over [B, B, R] — no argsort
    compaction of the full wavefront (measured 17x slower when tried);
  - each bank preserves the renderer's pixel-tile ray order, so the Pallas
    trace binning sees the same coherent 32x32 blocks as the primary pass.

Path weights: a lane carries throughput = the product of per-bounce factors
(albedo for mirrors incl. the Hadamard-y compat quirk, fresnel /
1-fresnel for the refractive pair, 1/(K+1) for GI samples), so the Whitted
tree's bottom-up blend  fresnel*refl + (1-fresnel)*refr  becomes a sum over
root-to-leaf paths — identical up to f32 summation order.

Capacity: children that find no free bank in their column are DROPPED
(counted in the returned diagnostics).  The default bank count guarantees
zero drops for pure reflect/refract scenes at depth <= 3 (pool width at
level L is at most 2^L); GI scenes get 2*(K+1) extra banks and may drop
deep, low-weight samples — raise RenderSettings.wavefront_banks to trade
memory for completeness.

RNG: a GI parent draws its 2K sampling angles from the per-pixel PCG32
stream in-order, but children get forked streams (rng.derive) — the
reference's depth-first draw order cannot be reproduced breadth-first
(a child's stream position would depend on its siblings' subtree sizes).
No committed golden exercises GI, so this changes no parity result.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from crt_tpu.ops import rng as rng_mod
from crt_tpu.ops import vecmath
from crt_tpu.ops.shade import _hadamard, _occlusion_masks, hit_attributes
from crt_tpu.ops.texture import sample_textures
from crt_tpu.scene.types import (
    MATERIAL_CONSTANT,
    MATERIAL_DIFFUSE,
    MATERIAL_REFLECTIVE,
    MATERIAL_REFRACTIVE,
)

_PI = math.pi


def default_banks(scene, settings) -> int:
    if settings.wavefront_banks:
        return int(settings.wavefront_banks)
    banks = 2 ** min(settings.max_ray_depth, 3)
    if not (scene.has_refractive and scene.refractions_on):
        banks = min(banks, 2)
    if scene.gi_on:
        banks += 2 * (settings.diffuse_reflection_ray_count + 1)
    return max(banks, 2)


class _Pool(NamedTuple):
    """Scan carry: the ray pool.  All leading dims [B, R]."""

    o: jnp.ndarray  # [B, R, 3] origins
    d: jnp.ndarray  # [B, R, 3] directions
    w: jnp.ndarray  # [B, R, 3] path throughput
    act: jnp.ndarray  # [B, R] bool
    acc: jnp.ndarray  # [B, R, 3] accumulated radiance (elementwise!)
    rng: Optional[rng_mod.PCGState]  # [B, R] planes, or None when GI off
    dropped: jnp.ndarray  # [] i32 children lost to pool overflow


def _place_children(pool_fields, dead, cand_act, cand_fields, dropped):
    """Place per-lane spawned children into free banks of their own column.

    ``dead [B, R]``: free slots.  ``cand_act [B, R]``: parent lanes (bank i,
    column p) spawning one child each into column p.  Children fill free
    slots in bank order; overflow children are dropped (counted).

    Returns (new_fields, new_dead, new_act_bits [B, R], dropped).
    """
    B = dead.shape[0]
    # rank of each free slot / each child within its column
    dead_rank = jnp.cumsum(dead, axis=0) - 1  # [B, R]
    spawn_rank = jnp.cumsum(cand_act, axis=0) - 1
    # match[i, j, p]: child from bank i lands in free bank j of column p
    match = (
        cand_act[:, None, :]
        & dead[None, :, :]
        & (spawn_rank[:, None, :] == dead_rank[None, :, :])
    )  # [Bi, Bj, R]
    has_src = match.any(axis=0)  # [B, R] destination receives a child
    placed = jnp.sum(has_src, dtype=jnp.int32)
    spawned = jnp.sum(cand_act, dtype=jnp.int32)
    dropped = dropped + (spawned - placed)

    # Exact select-accumulation over source banks: at most one source bank
    # matches a (dst, column) slot, so iterating i with where-overwrite is
    # exact for EVERY dtype.  (An einsum here would be a dot: bf16 MXU
    # passes for f32 fields by default, and integer dots may lower through
    # float — either silently corrupts child ray data / uint32 PCG states.
    # B is tiny, so B selects are cheap and fuse.)
    out = []
    for old, cand in zip(pool_fields, cand_fields):
        g = jnp.zeros_like(old)
        for i in range(B):
            m = match[i]  # [Bj, R]
            if old.ndim == 3:
                m = m[..., None]
            g = jnp.where(m, cand[i][None], g)
        mask = has_src if old.ndim == 2 else has_src[..., None]
        out.append(jnp.where(mask, g, old))
    return out, dead & ~has_src, has_src, dropped


def shade_wavefront_iter(
    scene,
    settings,
    trace_fn,
    origins: jnp.ndarray,  # [R, 3]
    dirs: jnp.ndarray,  # [R, 3]
    raster_x: Optional[jnp.ndarray] = None,
    raster_y: Optional[jnp.ndarray] = None,
    active: Optional[jnp.ndarray] = None,
    banks: Optional[int] = None,
    rows_fn=None,  # partitioned-scene row gather (see shade.hit_attributes)
    vary_axes=(),  # shard_map axes to mark the pool varying over
    gi_salt: Optional[jnp.ndarray] = None,  # progressive-pass stream salt
) -> jnp.ndarray:
    """Shade a camera wavefront iteratively -> [R, 3] linear colors."""
    color, _ = shade_wavefront_iter_with_stats(
        scene, settings, trace_fn, origins, dirs, raster_x, raster_y,
        active, banks, rows_fn, vary_axes, gi_salt,
    )
    return color


def shade_wavefront_iter_with_stats(
    scene, settings, trace_fn, origins, dirs,
    raster_x=None, raster_y=None, active=None, banks=None, rows_fn=None,
    vary_axes=(), gi_salt=None,
):
    """Like shade_wavefront_iter but also returns the dropped-child count."""
    R = origins.shape[0]
    B = int(banks) if banks else default_banks(scene, settings)
    D = settings.max_ray_depth

    if active is None:
        active = jnp.ones((R,), bool)

    if scene.gi_on:
        assert raster_x is not None and raster_y is not None, (
            "GI needs raster coords for per-pixel PCG32 seeding"
        )
        seed = rng_mod.make_pcg(raster_x, raster_y)
        seed = rng_mod.salt_stream(seed, gi_salt)
        rng0 = rng_mod.PCGState(
            *(jnp.broadcast_to(p[None], (B, R)) for p in seed)
        )
    else:
        rng0 = None

    pool = _Pool(
        o=jnp.broadcast_to(origins[None], (B, R, 3)),
        d=jnp.broadcast_to(dirs[None], (B, R, 3)),
        w=jnp.ones((B, R, 3), jnp.float32),
        act=jnp.zeros((B, R), bool).at[0].set(active),
        acc=jnp.zeros((B, R, 3), jnp.float32),
        rng=rng0,
        dropped=jnp.zeros((), jnp.int32),
    )
    if vary_axes:
        # Inside shard_map the scan's carry types carry varying-manual-axes:
        # constant-built fields (w/act/acc/dropped) would be "unvarying"
        # while the bounce output is varying over the caller's mesh axes —
        # align the initial carry explicitly (fields already varying, like
        # o/d built from the sharded rays, are left alone).
        def _vary(x):
            vma = getattr(getattr(x, "aval", None), "vma", frozenset())
            missing = tuple(a for a in vary_axes if a not in vma)
            return jax.lax.pcast(x, missing, to="varying") if missing else x

        pool = jax.tree.map(_vary, pool)

    want_refract = scene.has_refractive and scene.refractions_on
    want_reflect = scene.has_reflective and scene.reflections_on
    K = settings.diffuse_reflection_ray_count
    gi_scale = (
        1.0 / (K + 1)
        if (scene.gi_on or settings.gi_divide)
        else 1.0
    )

    def flat(x):
        return x.reshape((B * R,) + x.shape[2:])

    def unflat(x):
        return x.reshape((B, R) + x.shape[1:])

    def bounce(pool, bounce_idx):
        C = (B * R,)
        o, d, act = flat(pool.o), flat(pool.d), flat(pool.act)
        w = flat(pool.w)

        hit = trace_fn(o, d, act)
        attrs = hit_attributes(scene, o, d, hit, rows_fn=rows_fn)
        valid = attrs.valid & act
        miss = act & ~attrs.valid

        albedo = sample_textures(
            scene, attrs.albedo_tex, attrs.uv, attrs.bary_u, attrs.bary_v
        )
        is_diffuse = valid & (attrs.mat_type == MATERIAL_DIFFUSE)
        is_reflective = valid & (attrs.mat_type == MATERIAL_REFLECTIVE)
        is_refractive = valid & (attrs.mat_type == MATERIAL_REFRACTIVE)
        is_constant = valid & (attrs.mat_type == MATERIAL_CONSTANT)

        normal = attrs.normal
        point = attrs.point

        # ---- local (terminal) radiance --------------------------------
        contrib = jnp.where(
            miss[..., None], jnp.broadcast_to(scene.background_color, C + (3,)),
            0.0,
        )
        if scene.has_constant:
            contrib = jnp.where(is_constant[..., None], albedo, contrib)
        if scene.has_reflective and not scene.reflections_on:
            # reflections disabled: reflective shades as plain albedo (:106)
            contrib = jnp.where(is_reflective[..., None], albedo, contrib)

        if scene.num_lights > 0:
            illuminated, light_dir, r2 = _occlusion_masks(
                scene, trace_fn, point, normal, scene.light_position,
                settings.shadow_bias, settings.no_shadows,
                shadow_active=is_diffuse,
                max_ray_depth=settings.max_ray_depth,
                refraction_bias=settings.refraction_bias,
                rows_fn=rows_fn,
            )
            cos_law = jnp.maximum(0.0, vecmath.dot(light_dir, normal[None]))
            sphere_area = 4.0 * _PI * r2
            # albedo factored out of the light sum (see shade.py): the
            # per-light accumulation runs on [Ll, R] scalars, not [Ll, R, 3].
            lum = jnp.sum(
                jnp.where(
                    illuminated,
                    scene.light_intensity[:, None] / sphere_area * cos_law,
                    0.0,
                ),
                axis=0,
            )
            direct = albedo * lum[..., None]
            contrib = jnp.where(
                is_diffuse[..., None], direct * gi_scale, contrib
            )

        acc = pool.acc + unflat(w * contrib)

        # ---- refractive geometry (feeds both children) ----------------
        if want_refract:
            d_dot_n = vecmath.dot(d, normal)
            exiting = d_dot_n > 0.0
            refr_normal = jnp.where(exiting[..., None], -normal, normal)
            outside_ior = jnp.where(exiting, attrs.ior, 1.0)
            inside_ior = jnp.where(exiting, 1.0, attrs.ior)
            refr_dir, refr_ok = vecmath.refract(
                d, refr_normal, outside_ior, inside_ior
            )
            refr_origin = point - refr_normal * settings.refraction_bias
            # fresnel about the (possibly flipped) normal (:130)
            fresnel = 0.5 * jnp.power(
                1.0 + vecmath.dot(d, refr_normal), 5.0
            )[..., None]
            refl_r_dir = vecmath.reflect(d, refr_normal)
            refl_r_origin = point + refr_normal * settings.reflection_bias

        # ---- in-place continuation ------------------------------------
        # reflective lanes -> mirror ray, weight *= albedo (typo-gated);
        # refractive lanes -> refraction ray (weight *= 1-fresnel), or the
        # full-weight reflection on total internal reflection.
        new_o, new_d, new_w = o, d, w
        cont = jnp.zeros(C, bool)
        if want_reflect:
            # albedo with the Hadamard-* typo folded in: (a (*) c) == a' * c
            # with a'.y = a.y^2 (crt_vector.h:77)
            albedo_eff = albedo
            if settings.hadamard_y:
                albedo_eff = albedo.at[..., 1].multiply(albedo[..., 1])
            m = is_reflective[..., None]
            new_o = jnp.where(m, point + normal * settings.reflection_bias,
                              new_o)
            new_d = jnp.where(m, vecmath.reflect(d, normal), new_d)
            new_w = jnp.where(m, w * albedo_eff, new_w)
            cont = cont | is_reflective
        if want_refract:
            go_refr = is_refractive & refr_ok
            go_tir = is_refractive & ~refr_ok
            m = go_refr[..., None]
            new_o = jnp.where(m, refr_origin, new_o)
            new_d = jnp.where(m, refr_dir, new_d)
            new_w = jnp.where(m, w * (1.0 - fresnel), new_w)
            m = go_tir[..., None]
            new_o = jnp.where(m, refl_r_origin, new_o)
            new_d = jnp.where(m, refl_r_dir, new_d)
            # TIR: all weight stays on the reflection branch (:131-134)
            cont = cont | is_refractive

        rng = pool.rng
        have_rng = rng is not None

        # GI sample directions + forked child streams are computed BEFORE
        # placement so the parent's post-draw stream state can be committed
        # to the pool first — placements then overwrite dying parents' slots
        # with child state without being clobbered.
        gi_children = []
        if scene.gi_on:
            # local basis from (ray, normal) — crt_renderer.cpp:62-66
            right = vecmath.safe_normalize(vecmath.cross(d, normal))
            up = normal
            forward = vecmath.cross(right, up)
            local_m = vecmath.from_axes(right, up, forward)
            gi_origin = point + normal * settings.diffuse_reflection_bias
            r_flat = rng_mod.PCGState(*(flat(p) for p in rng))
            for k in range(K):
                u1, r_flat = rng_mod.uniform(r_flat, is_diffuse)
                angle_xy = _PI * u1
                gi_dir = jnp.stack(
                    [jnp.cos(angle_xy), jnp.sin(angle_xy),
                     jnp.zeros_like(angle_xy)], axis=-1,
                )
                u2, r_flat = rng_mod.uniform(r_flat, is_diffuse)
                angle_xz = 2.0 * _PI * u2
                c, s = jnp.cos(angle_xz), jnp.sin(angle_xz)
                x, z = gi_dir[..., 0], gi_dir[..., 2]
                gi_dir = jnp.stack(
                    [x * c + z * s, gi_dir[..., 1], -x * s + z * c], axis=-1
                )
                gi_dir = vecmath.rotate_rows(gi_dir, local_m)
                gi_children.append(
                    (gi_dir, rng_mod.derive(r_flat, k + 1))
                )
            rng = rng_mod.PCGState(*(unflat(p) for p in r_flat))

        pool_fields = [unflat(new_o), unflat(new_d), unflat(new_w)]
        if have_rng:
            pool_fields += list(rng)
        dead = ~unflat(cont)
        act2 = unflat(cont)
        dropped = pool.dropped

        # ---- spawned children -----------------------------------------
        def spawn(cand_act, co, cd, cw, crng, pool_fields, dead, act2,
                  dropped):
            cand_fields = [unflat(co), unflat(cd), unflat(cw)]
            if have_rng:
                cand_fields += [unflat(p) for p in crng]
            pool_fields, dead, placed, dropped = _place_children(
                pool_fields, dead, unflat(cand_act), cand_fields, dropped
            )
            return pool_fields, dead, act2 | placed, dropped

        if want_refract:
            # the Fresnel pair's reflection ray (weight *= fresnel); forked
            # stream so the two subtrees' GI draws decorrelate
            refl_rng = (
                rng_mod.derive(rng_mod.PCGState(*(flat(p) for p in rng)), 97)
                if have_rng else None
            )
            pool_fields, dead, act2, dropped = spawn(
                is_refractive & refr_ok,
                refl_r_origin, refl_r_dir, w * fresnel,
                refl_rng, pool_fields, dead, act2, dropped,
            )

        for gi_dir, child_rng in gi_children:
            pool_fields, dead, act2, dropped = spawn(
                is_diffuse, gi_origin, gi_dir,
                w * jnp.float32(gi_scale), child_rng,
                pool_fields, dead, act2, dropped,
            )

        new_rng = (
            rng_mod.PCGState(*pool_fields[3:7]) if have_rng else None
        )
        new_pool = _Pool(
            o=pool_fields[0], d=pool_fields[1], w=pool_fields[2],
            act=act2, acc=acc, rng=new_rng, dropped=dropped,
        )
        return new_pool, None

    bounce = jax.checkpoint(bounce)  # O(1)-residual backward per bounce
    pool, _ = jax.lax.scan(bounce, pool, jnp.arange(D + 1))

    return pool.acc.sum(axis=0), pool.dropped
