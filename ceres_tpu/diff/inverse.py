"""Inverse rendering: fit scene parameters to a target image.

BASELINE config 4: "differentiable mode: gradients w.r.t. vertex positions
+ camera pose, inverse-rendering fit on bunny". The reference has no
differentiable mode at all — this subsystem exists because the rebuild's
renderer is differentiable end-to-end (visibility detached, every shading/
intersection quantity analytic).

The train step is the framework's "training step": forward render (single
chip or shard_map over a mesh), photometric loss, backward through the
megakernel's gradient path (detached winner search + plain-JAX recompute
at the winners — no custom VJP, megakernel.py docstring), optimizer
update. Under a mesh, gradients of the
replicated vertex/camera parameters are psum'd across chips by shard_map's
transpose — the all-reduce overlapped with the backward pass by XLA.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ceres_tpu.models.camera import Camera
from ceres_tpu.render.renderer import RenderConfig, render_pipeline


class TrainState(NamedTuple):
    params: dict          # {"vertices": (V,3) [, "eye", "dir"]}
    opt_state: optax.OptState


def image_loss(rendered: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared photometric error."""
    return jnp.mean((rendered - target) ** 2)


def _camera_with(camera: Camera, params: dict) -> Camera:
    return Camera(eye=params.get("eye", camera.eye),
                  dir=params.get("dir", camera.dir),
                  up=camera.up, fov=params.get("fov", camera.fov))


def make_train_step(faces, camera: Camera, sun, config: RenderConfig,
                    optimizer: optax.GradientTransformation,
                    mesh=None, clusters0=None):
    """Build a jitted train step: (state, target) -> (state, loss).

    With ``mesh`` given, the forward render shards rays over the mesh
    (ceres_tpu.parallel) and the target image is consumed sharded the same
    way; gradients arrive psum'd.

    With ``clusters0`` (a ClusterSet built from the INITIAL vertices),
    each step REFITS that structure to the current vertices instead of
    rebuilding it — the HierarchyRefitter fast path
    (hierarchy_refitter.hpp:10-46; a record gather + segmented box
    min/max instead of the full LBVH sort). Boxes stay exact bounds of
    the moved triangles so the search stays correct at any deformation;
    only culling tightness degrades if vertices drift far from the
    initial cut.
    """
    faces = jnp.asarray(faces)
    sun = jnp.asarray(sun)

    def loss_fn(params, target):
        cam = _camera_with(camera, params)
        clusters = None
        if clusters0 is not None:
            from ceres_tpu.accel import clusters as cl
            from ceres_tpu.models.mesh import triangle_soup

            soup_d = jax.tree.map(
                jax.lax.stop_gradient,
                triangle_soup(params["vertices"], faces,
                              with_normals=False))
            clusters = cl.refit_clusters(clusters0, soup_d)
        if mesh is None:
            image, _ = render_pipeline(params["vertices"], faces, cam, sun,
                                       config, clusters=clusters)
        else:
            from ceres_tpu.parallel.sharded import _render_sharded_jit

            image, _ = _render_sharded_jit(params["vertices"], faces, cam,
                                           sun, config, mesh)
        return image_loss(image, target)

    @jax.jit
    def step(state: TrainState, target) -> tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, target)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss

    return step


def fit_vertices(
    vertices,
    faces,
    camera: Camera,
    sun,
    target,
    config: Optional[RenderConfig] = None,
    steps: int = 100,
    learning_rate: float = 1e-3,
    optimize_camera: bool = False,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 10,
    refit: bool = True,
):
    """Gradient-descend vertex positions (optionally camera pose) to match
    ``target``. Returns (final params dict, loss history list).

    With ``checkpoint_dir``, optimizer state (params + Adam moments + step)
    is saved via orbax every ``checkpoint_every`` steps and the fit RESUMES
    from the latest checkpoint on restart — the checkpoint/resume
    capability the reference lacks entirely (SURVEY.md §5: long jobs buffer
    everything in RAM and write only at the end, anim.cpp:44,124-127).
    ``steps`` counts total steps including restored ones.

    ``refit=True`` (megakernel, single-device): the acceleration
    structure's treelet cut is built ONCE from the initial vertices and
    REFITTED per step (the HierarchyRefitter fast path) instead of
    rebuilt — a record gather + segmented box min/max per step instead
    of the full LBVH sort (~100 ms/step saved at dragon scale).
    """
    config = config or RenderConfig(width=target.shape[1],
                                    height=target.shape[0])
    params = {"vertices": jnp.asarray(vertices)}
    if optimize_camera:
        params["eye"] = camera.eye
        params["dir"] = camera.dir
    optimizer = optax.adam(learning_rate)
    state = TrainState(params, optimizer.init(params))
    start = 0

    manager = None
    if checkpoint_dir is not None:
        import os

        import orbax.checkpoint as ocp

        manager = ocp.CheckpointManager(
            os.path.abspath(checkpoint_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=2))
        latest = manager.latest_step()
        if latest is not None:
            state = manager.restore(
                latest, args=ocp.args.StandardRestore(state))
            state = jax.tree.map(jnp.asarray, state)
            start = latest

    clusters0 = None
    if refit and mesh is None and config.backend == "megakernel":
        from ceres_tpu.accel import clusters as cl
        from ceres_tpu.models.mesh import triangle_soup

        clusters0 = cl.build_clusters_treelet(
            jax.tree.map(jax.lax.stop_gradient,
                         triangle_soup(params["vertices"],
                                       jnp.asarray(faces),
                                       with_normals=False)))
    step = make_train_step(faces, camera, sun, config, optimizer, mesh=mesh,
                           clusters0=clusters0)
    target = jnp.asarray(target)
    history = []
    for i in range(start, steps):
        state, loss = step(state, target)
        history.append(float(loss))
        if manager is not None and (
                (i + 1) % checkpoint_every == 0 or i + 1 == steps):
            import orbax.checkpoint as ocp

            manager.save(i + 1, args=ocp.args.StandardSave(state))
    if manager is not None:
        manager.wait_until_finished()
        manager.close()
    return state.params, history
