"""Inverse rendering: optimize scene parameters against target images.

The differentiable counterpart the CPU reference cannot offer: fit vertices,
albedo/texture colors, light intensities or the camera to one or more target
renders.  Uses optax optimizers over the sharded forward/backward step from
crt_tpu.parallel (gradients psum'd across the mesh), with optional orbax
checkpointing for resumable long optimizations (SURVEY.md §5
checkpoint/resume).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from crt_tpu.parallel.sharded import default_trainable_params
from crt_tpu.renderer import _render_flat
from crt_tpu.scene.types import RenderSettings, Scene


def make_loss_fn(scene: Scene, settings: RenderSettings, target: jnp.ndarray):
    """L2 image loss as a function of a trainable-parameter dict."""

    def loss_fn(params: dict) -> jnp.ndarray:
        s = scene.replace(**params)
        img = _render_flat(s, settings)
        return jnp.mean((img - target) ** 2)

    return loss_fn


def fit_scene(
    scene: Scene,
    target: jnp.ndarray,
    params: Optional[dict] = None,
    settings: Optional[RenderSettings] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    steps: int = 100,
    mesh=None,
    callback: Optional[Callable[[int, float], None]] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
):
    """Gradient-descend scene parameters toward ``target``.

    Returns (params, losses).  With a mesh, the image rows are sharded and
    parameter gradients all-reduced (psum) across devices; without one the
    step runs single-device.  ``checkpoint_dir`` enables orbax save/restore:
    an interrupted fit resumes from the latest step.
    """
    settings = settings or RenderSettings()
    params = params if params is not None else default_trainable_params(scene)
    optimizer = optimizer or optax.adam(1e-2)

    opt_state = optimizer.init(params)
    start_step = 0

    mngr = None
    if checkpoint_dir:
        mngr = _checkpoint_manager(checkpoint_dir)
        latest = mngr.latest_step()
        if latest is not None:
            restored = mngr.restore(latest)
            params = jax.tree.map(jnp.asarray, restored["params"])
            opt_state = jax.tree.map(
                jnp.asarray, restored["opt_state"],
            )
            opt_state = jax.tree.unflatten(
                jax.tree.structure(optimizer.init(params)),
                jax.tree.leaves(opt_state),
            )
            start_step = latest + 1

    if mesh is None:
        loss_fn = make_loss_fn(scene, settings, target)

        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

    else:
        axis = mesh.axis_names[0]
        n_dev = mesh.shape[axis]
        h, w = scene.height, scene.width
        rows_per = -(-h // n_dev)
        h_pad = rows_per * n_dev
        if h_pad != h:
            target = jnp.concatenate(
                [target, jnp.zeros((h_pad - h, w, 3), target.dtype)]
            )

        from crt_tpu.parallel.sharded import _render_rows

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis)),
            out_specs=(P(), P()),
        )
        def _grad_shard(scene_rep, p, target_rows, row_starts):
            def local_loss(p):
                s = scene_rep.replace(**p)
                img = _render_rows(s, settings, row_starts[0], rows_per)
                valid = (row_starts[0] + jnp.arange(rows_per)) < h
                err = jnp.where(valid[:, None, None], img - target_rows, 0.0)
                return jnp.sum(err * err) / (h * w * 3)

            loss, grads = jax.value_and_grad(local_loss)(p)
            return jax.lax.psum(loss, axis), jax.lax.psum(grads, axis)

        row_starts = jnp.arange(0, h_pad, rows_per, dtype=jnp.int32)

        @jax.jit
        def step(params, opt_state):
            loss, grads = _grad_shard(scene, params, target, row_starts)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(start_step, steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
        if callback:
            callback(i, losses[-1])
        if mngr and checkpoint_every and (i + 1) % checkpoint_every == 0:
            mngr.save(i, args=_save_args(params, opt_state))
    if mngr:
        mngr.save(steps - 1, args=_save_args(params, opt_state))
        mngr.wait_until_finished()
    return params, losses


def _checkpoint_manager(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(max_to_keep=2)
    )


def _save_args(params, opt_state):
    import orbax.checkpoint as ocp

    return ocp.args.StandardSave(
        {"params": params, "opt_state": opt_state}
    )
