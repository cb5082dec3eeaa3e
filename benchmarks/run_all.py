"""Run every BASELINE.json benchmark config and print one JSON line each.

Configs (BASELINE.md):
  1. bunny 512x512 preview, flat shading, --eye 0 .1 -.3 --rotate y -145
  2. bunny 1080p, smooth (vertex-normal) shading + point light
  3. dragon 1080p, traversal + shadow rays
  4. differentiable mode: backward step over vertices + camera
  5. frame-batched turntable animation (all attached devices)

Runs on whatever backend is attached (the real TPU chip under axon; CPU
elsewhere). bench.py stays the single north-star line; this is the wider
sweep for the record.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data"


def _timeit(fn, reps=5):
    import jax

    jax.block_until_ready(fn())  # compile
    jax.block_until_ready(fn())  # steady state
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / reps, out


def main() -> int:
    import numpy as np

    from ceres_tpu.io.obj import load_obj
    from ceres_tpu.models.camera import Camera
    from ceres_tpu.models.transform import rotate_vertices_about_axis
    from ceres_tpu.render.renderer import render

    results = []

    def record(name, rays, dt, extra=None):
        line = {"config": name, "rays_per_sec": round(rays / dt, 1),
                "ms_per_frame": round(dt * 1e3, 3)}
        line.update(extra or {})
        results.append(line)
        print(json.dumps(line))

    bunny_v, bunny_f = load_obj(os.path.join(DATA, "bunny.obj"))
    dragon_v, dragon_f = load_obj(os.path.join(DATA, "dragon.obj"))

    # -- config 1: bunny preview 512x512 flat ------------------------------
    v1 = np.asarray(rotate_vertices_about_axis(bunny_v, 1, -145.0))
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    cam1 = Camera.make(eye=eye, dir=v1.mean(axis=0) - eye, up=(0, 1, 0),
                       fov=60.0)
    sun = np.asarray([-50.0, 100.0, 0.0], np.float32)

    def run1():
        img, stats = render(v1, bunny_f, cam1, sun, width=512, height=512,
                            mode="flat", backend="megakernel")
        return img, stats

    dt, (_, stats) = _timeit(run1)
    record("1_bunny_preview_512_flat", float(stats["rays"]), dt)

    # -- config 2: bunny 1080p smooth --------------------------------------
    cam2 = Camera.make(eye=eye, dir=bunny_v.mean(axis=0) - eye,
                       up=(0, 1, 0), fov=60.0)

    def run2():
        return render(bunny_v, bunny_f, cam2, sun, width=1920, height=1080,
                      mode="smooth", backend="megakernel")

    dt, (_, stats) = _timeit(run2)
    record("2_bunny_1080p_smooth", float(stats["rays"]), dt)

    # -- config 3: dragon 1080p shadows ------------------------------------
    deye = np.asarray([0.0, 2.0, -8.0], np.float32)
    cam3 = Camera.make(eye=deye, dir=dragon_v.mean(axis=0) - deye,
                       up=(0, 1, 0), fov=60.0)

    def run3():
        return render(dragon_v, dragon_f, cam3, sun, width=1920, height=1080,
                      mode="smooth", backend="megakernel")

    dt, (_, stats) = _timeit(run3)
    record("3_dragon_1080p_shadows", float(stats["rays"]), dt,
           {"triangles": int(dragon_f.shape[0])})

    # -- config 4: differentiable step --------------------------------------
    import jax
    import jax.numpy as jnp

    from ceres_tpu.render.renderer import RenderConfig, render_pipeline

    cfg4 = RenderConfig(width=512, height=512, mode="smooth",
                        backend="megakernel")
    faces_j = jnp.asarray(bunny_f)
    target, _ = render_pipeline(jnp.asarray(bunny_v), faces_j, cam2,
                                jnp.asarray(sun), cfg4)

    @jax.jit
    def grad_step(verts, eye_p):
        def loss(v, e):
            cam = Camera(eye=e, dir=cam2.dir, up=cam2.up, fov=cam2.fov)
            img, _ = render_pipeline(v, faces_j, cam, jnp.asarray(sun), cfg4)
            return jnp.mean((img - target) ** 2)

        return jax.grad(loss, argnums=(0, 1))(verts, eye_p)

    v_j = jnp.asarray(bunny_v)
    e_j = jnp.asarray(eye)
    dt, _ = _timeit(lambda: grad_step(v_j, e_j))
    record("4_diff_backward_512", float(2 * 512 * 512), dt,
           {"note": "forward+backward pixels/s over vertices+camera"})

    # -- config 5: frame-batched animation ----------------------------------
    from ceres_tpu.parallel.sharded import (
        device_mesh, render_frames_sharded, turntable_transforms)

    n_dev = len(jax.devices())
    mesh = device_mesh()
    n_frames = 4
    tracks = turntable_transforms(n_frames)

    def run5():
        frames, stats = render_frames_sharded(
            bunny_v, bunny_f, cam2, sun, tracks, mesh=mesh, width=621,
            height=1344, mode="smooth", backend="megakernel")
        return frames, stats

    dt, (_, stats) = _timeit(run5, reps=3)
    record("5_anim_4frames_621x1344", float(stats["rays"]), dt,
           {"devices": n_dev, "frames": n_frames})

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "latest_results.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
