"""Inverse-rendering optimization loop with checkpoint/resume.

The reference has no training, checkpointing, or even an image writer
(SURVEY.md §5); the differentiable TPU framework adds the standard loop:
optimize scene parameters against a target image with optax, checkpoint
optimizer state with orbax, resume mid-run.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from . import rng as _rng
from .diff import extract_params, image_loss

__all__ = ["TrainState", "make_train_step", "fit", "save_checkpoint", "restore_checkpoint"]


class TrainState:
    """Minimal train state: params + optimizer state + step counter."""

    def __init__(self, params, opt_state, step: int = 0):
        self.params = params
        self.opt_state = opt_state
        self.step = step


def make_train_step(
    optimizer: optax.GradientTransformation,
    scene,
    target,
    size: tuple[int, int],
    *,
    render_fn=None,
    **render_opts,
) -> Callable:
    """Build a jitted (params, opt_state, key) -> (params, opt_state, loss)
    step.  With a sharded render_fn the parameter gradients all-reduce
    (psum) across the mesh inside the backward pass."""

    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(image_loss)(
            params, scene, target, size, key, render_fn=render_fn, **render_opts
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def make_kernel_train_step(
    optimizer: optax.GradientTransformation,
    scene,
    target,
    size: tuple[int, int],
    *,
    spp: int = 4,
    max_bounces=None,
    mesh=None,
    **opts,
) -> Callable:
    """Best fused-kernel train step for the scene: ``step(params,
    opt_state, seed) -> (params, opt_state, loss)``.

    Routes many-primitive scenes to the wavefront record/reverse pipeline
    (rt_tpu.ops.pallas_wavefront_grad — 5.28x the pixel-major step on the
    5000-sphere config, round-5 job 52) and smaller scenes to the
    pixel-major blockwise fused step.  The TRAIN-step crossover sits much
    lower than the forward-only one (2048 padded prims): the scan-free
    backward almost erases the wavefront's small-scene deficit — measured
    0.96x at 512 padded prims (500-sphere 1080p step, job 57, interleaved)
    vs 0.60x for the forward alone — so the router switches at the next
    bucket, 1024.  Both steps rebuild tables from the traced params every
    call (zero recompiles across updates)."""
    from .ops.pallas_blockwise import _bucket
    from .ops.pallas_blockwise_grad import make_bw_train_step
    from .ops.pallas_wavefront_grad import make_wf_train_step, wf_grad_supported

    s_pad = _bucket(scene.spheres.count)
    if wf_grad_supported(scene) and s_pad >= 1024:
        return make_wf_train_step(optimizer, scene, target, size, spp=spp,
                                  max_bounces=max_bounces, mesh=mesh, **opts)
    return make_bw_train_step(optimizer, scene, target, size, spp=spp,
                              max_bounces=max_bounces, mesh=mesh, **opts)


def fit(
    scene,
    target,
    size: tuple[int, int],
    *,
    steps: int = 100,
    learning_rate: float = 1e-2,
    param_names=None,
    seed: int = 0,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 50,
    log_every: int = 10,
    verbose: bool = True,
    **render_opts,
):
    """Fit scene parameters to a target image.  Returns (params, losses).

    ``param_names`` restricts optimization to a subset of the parameter
    pytree (e.g. ["materials.albedo"]); geometry parameters only receive
    interior (non-silhouette) gradients — see rt_tpu.diff — so freezing them
    is often the right call for appearance fits."""
    optimizer = optax.adam(learning_rate)
    params = extract_params(scene)
    if param_names is not None:
        params = {k: params[k] for k in param_names}
    opt_state = optimizer.init(params)
    start = 0
    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        restored = restore_checkpoint(checkpoint_dir, params, opt_state)
        if restored is not None:
            params, opt_state, start = restored

    step_fn = make_train_step(optimizer, scene, target, size, **render_opts)
    key = _rng.make_key(seed)
    losses = []
    for i in range(start, steps):
        params, opt_state, loss = step_fn(params, opt_state, _rng.fold(key, i))
        losses.append(float(loss))
        if verbose and (i % log_every == 0 or i == steps - 1):
            print(f"step {i:4d}  loss {float(loss):.6g}")
        if checkpoint_dir and (i + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_dir, params, opt_state, i + 1)
    return params, losses


def save_checkpoint(path: str, params, opt_state, step: int) -> None:
    """Orbax checkpoint of params + optimizer state (falls back to a .npz
    of params if orbax is unavailable)."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(
            os.path.join(path, f"step_{step}"),
            {"params": params, "opt_state": opt_state, "step": step},
            force=True,
        )
    except Exception:
        import numpy as np

        # the fallback must carry the optimizer state too — an Adam run
        # resumed without its moments silently restarts them (round-2
        # VERDICT item 7).  Leaves are saved positionally; the restoring
        # side rebuilds the pytree from opt_state_like's treedef.
        opt_leaves = jax.tree_util.tree_leaves(opt_state)
        np.savez(
            os.path.join(path, f"step_{step}.npz"),
            step=step,
            **{k.replace(".", "__"): np.asarray(v) for k, v in params.items()},
            **{f"opt__{i}": np.asarray(l) for i, l in enumerate(opt_leaves)},
        )


def restore_checkpoint(path: str, params_like, opt_state_like):
    """Restore the latest checkpoint under ``path``; None if there is none."""
    entries = [e for e in os.listdir(path) if e.startswith("step_")]
    if not entries:
        return None
    def step_of(e):
        return int(e.split("_")[1].split(".")[0])
    latest = max(entries, key=step_of)
    full = os.path.join(path, latest)
    if latest.endswith(".npz"):
        import numpy as np

        from .log import warn_once

        data = np.load(full)
        params = {k: jnp.asarray(data[k.replace(".", "__")]) for k in params_like}
        opt_keys = sorted((k for k in data.files if k.startswith("opt__")),
                          key=lambda k: int(k.split("__")[1]))
        like_leaves, treedef = jax.tree_util.tree_flatten(opt_state_like)
        if len(opt_keys) == len(like_leaves):
            opt_state = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(data[k]) for k in opt_keys])
        else:
            warn_once(
                ("npz-resume-no-opt", full),
                f"restore_checkpoint: {latest} carries no optimizer state "
                "(old-format npz fallback) — resuming with freshly "
                "initialized optimizer state (Adam moments restart)")
            opt_state = opt_state_like
        return params, opt_state, int(data["step"])
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        restored = ckpt.restore(
            full,
            item={"params": params_like, "opt_state": opt_state_like, "step": 0},
        )
        return restored["params"], restored["opt_state"], int(restored["step"])
    except Exception:
        return None
