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

Methodology (same as bench.py): REPS iterations run inside ONE jitted
``lax.fori_loop`` and are forced by a scalar fetch — on remote-tunnel TPU
backends per-dispatch wall-clock measures dispatch latency, not compute
(jax.block_until_ready returns early there), and the in-graph loop also
amortizes the tunnel round trip.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ceres_tpu.render.scenes import data_dir

DATA = data_dir()
REPS = 10
# Optional comma-separated config-prefix filter, e.g. CONFIGS=1,3 —
# unlisted configs keep their previous latest_results.json entries.
CONFIGS = os.environ.get("CONFIGS")


def _want(tag: str) -> bool:
    return CONFIGS is None or tag in {c.strip() for c in CONFIGS.split(",")}


def _marginal_ms(body_fn, v, prepare_fn=None, aux=None):
    """Per-iteration compute time of ``body_fn(v, i, aux) -> scalar``, by
    the k=1 vs k=REPS+1 in-graph marginal. ``v`` (the vertex array) is
    passed as a jit ARGUMENT: as a closed-over constant XLA fails to hoist
    the loop-invariant acceleration-structure build out of the fori_loop
    (measured 3x slower). ``prepare_fn(v) -> aux`` runs ONCE outside the
    frame loop — the reference's own structure (BVH built before the frame
    loop, include/anim.cpp:62-66), so per-frame time measures traversal +
    shading, not the rebuild."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames="k")
    def run(v_, aux_, k):
        aux = prepare_fn(v_) if prepare_fn is not None else aux_

        def body(i, acc):
            return acc + body_fn(v_, i, aux)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    res = {}
    for k in (1, REPS + 1):
        float(run(v, aux, k))  # compile + warm
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(v, aux, k))  # scalar fetch = real synchronization
            ts.append(time.perf_counter() - t0)
        res[k] = min(ts)
    return (res[REPS + 1] - res[1]) / REPS * 1e3


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ceres_tpu.io.obj import load_obj
    from ceres_tpu.models.camera import Camera
    from ceres_tpu.models.transform import rotate_vertices_about_axis
    from ceres_tpu.render.renderer import RenderConfig, render_pipeline, render

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "latest_results.json")
    results = []
    if CONFIGS is not None and os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)

    def record(name, rays, ms, extra=None):
        nonlocal results
        line = {"config": name, "rays_per_sec": round(rays / (ms * 1e-3), 1),
                "ms_per_frame": round(ms, 3)}
        line.update(extra or {})
        results = [r for r in results if r.get("config") != name]
        results.append(line)
        print(json.dumps(line))

    bunny_v, bunny_f = load_obj(os.path.join(DATA, "bunny.obj"))
    dragon_v, dragon_f = load_obj(os.path.join(DATA, "dragon.obj"))
    sun = jnp.asarray([-50.0, 100.0, 0.0], jnp.float32)
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)

    def frame_body(faces, cam, cfg, verts_np=None):
        from ceres_tpu.accel.clusters import build_clusters_treelet
        from ceres_tpu.accel.cuts import build_clusters_quality
        from ceres_tpu.models.mesh import triangle_soup
        from ceres_tpu.render.renderer import prepare_winner_table

        fj = jnp.asarray(faces)

        def body(v, i, aux):
            clusters, table = aux
            img, _ = render_pipeline(v, fj, cam, sun + i * 1e-3, cfg,
                                     clusters=clusters, table_cols=table)
            return img.sum()

        if verts_np is not None:
            # The production static-loop structure: the SweepSAH treelet
            # cut, built once on the host BEFORE the loop — the
            # reference's own shape (SweepSAH before the frame loop,
            # anim.cpp:62-66); adopted after the round-5 on-chip builder
            # A/B (benchmarks/builder_ab.json).
            vq = jnp.asarray(verts_np)
            soup = triangle_soup(vq, fj, with_normals=cfg.mode == "smooth")
            cs = build_clusters_quality(
                triangle_soup(vq, fj, with_normals=False))
            return body, (cs, prepare_winner_table(soup, cs, cfg))

        def prepare(v):
            # Jittable in-graph build (deforming/per-step rebuild path).
            soup = triangle_soup(v, fj, with_normals=cfg.mode == "smooth")
            cs = build_clusters_treelet(
                triangle_soup(v, fj, with_normals=False))
            return cs, prepare_winner_table(soup, cs, cfg)

        return body, prepare

    def frame_rays(verts, faces, cam, cfg):
        _, stats = render(verts, faces, cam, np.asarray(sun), config=cfg)
        return float(stats["rays"])

    # -- config 1: bunny preview 512x512 flat ------------------------------
    if _want("1"):
        v1 = np.asarray(rotate_vertices_about_axis(bunny_v, 1, -145.0))
        cam1 = Camera.make(eye=eye, dir=v1.mean(axis=0) - eye, up=(0, 1, 0),
                           fov=60.0)
        cfg1 = RenderConfig(width=512, height=512, mode="flat",
                            backend="megakernel")
        body1, aux1 = frame_body(bunny_f, cam1, cfg1, verts_np=v1)
        ms = _marginal_ms(body1, jnp.asarray(v1), aux=aux1)
        record("1_bunny_preview_512_flat",
               frame_rays(v1, bunny_f, cam1, cfg1), ms)

    # -- config 2: bunny 1080p smooth --------------------------------------
    cam2 = Camera.make(eye=eye, dir=bunny_v.mean(axis=0) - eye,
                       up=(0, 1, 0), fov=60.0)
    cfg2 = RenderConfig(width=1920, height=1080, mode="smooth",
                        backend="megakernel")
    ms2 = None
    if _want("2"):
        body2, aux2 = frame_body(bunny_f, cam2, cfg2, verts_np=bunny_v)
        ms2 = _marginal_ms(body2, jnp.asarray(bunny_v), aux=aux2)
        record("2_bunny_1080p_smooth",
               frame_rays(bunny_v, bunny_f, cam2, cfg2), ms2)

    # -- config 3: dragon 1080p shadows ------------------------------------
    want3 = _want("3")
    deye = np.asarray([0.0, 2.0, -8.0], np.float32)
    cam3 = Camera.make(eye=deye, dir=dragon_v.mean(axis=0) - deye,
                       up=(0, 1, 0), fov=60.0)
    if want3:
        body3, aux3 = frame_body(dragon_f, cam3, cfg2, verts_np=dragon_v)
        ms = _marginal_ms(body3, jnp.asarray(dragon_v), aux=aux3)
        record("3_dragon_1080p_shadows",
               frame_rays(dragon_v, dragon_f, cam3, cfg2), ms,
               {"triangles": int(dragon_f.shape[0])})
    # Structure-build cost on its own (per reference parity it sits outside
    # the frame loop; recorded so the hoisting is auditable).
    if want3:
        _, prep3j = frame_body(dragon_f, cam3, cfg2)

        @functools.partial(jax.jit)
        def build_only(v):
            cs, _ = prep3j(v)
            return cs.lo.sum() + cs.p0[0, 0, 0]

        float(build_only(jnp.asarray(dragon_v)))
        t0 = time.perf_counter()
        float(build_only(jnp.asarray(dragon_v + 1e-6)))
        record("3b_dragon_cluster_build", 0.0,
               (time.perf_counter() - t0) * 1e3,
               {"note": "one-shot LBVH treelet build, not per-frame"})

    # -- config 4: differentiable step --------------------------------------
    want4 = _want("4")
    cfg4 = RenderConfig(width=512, height=512, mode="smooth",
                        backend="megakernel")
    fj = jnp.asarray(bunny_f)
    vj = jnp.asarray(bunny_v)
    target = (render_pipeline(vj, fj, cam2, sun, cfg4)[0]
              if want4 else None)

    def grad_body(v0, i, aux):
        def loss(v, e):
            cam = Camera(eye=e, dir=cam2.dir, up=cam2.up, fov=cam2.fov)
            img, _ = render_pipeline(v, fj, cam, sun + i * 1e-3, cfg4)
            return jnp.mean((img - target) ** 2)

        val, (gv, ge) = jax.value_and_grad(loss, argnums=(0, 1))(
            v0, jnp.asarray(eye))
        return val + gv.sum() * 1e-9 + ge.sum() * 1e-9

    if want4:
        ms = _marginal_ms(grad_body, vj)
        record("4_diff_fwd_bwd_512", float(2 * 512 * 512), ms,
               {"note": "forward+backward pixels/s over vertices+camera"})

    # -- config 4b: differentiable step at full 1080p (north star:
    # "forward+backward kernels at speed-of-light"; the bwd/fwd ratio is
    # config-4b time against config 2's forward-only frame) ----------------
    target2 = (render_pipeline(vj, fj, cam2, sun, cfg2)[0]
               if want4 else None)

    def grad_body_1080(v0, i, aux):
        def loss(v, e):
            cam = Camera(eye=e, dir=cam2.dir, up=cam2.up, fov=cam2.fov)
            img, _ = render_pipeline(v, fj, cam, sun + i * 1e-3, cfg2)
            return jnp.mean((img - target2) ** 2)

        val, (gv, ge) = jax.value_and_grad(loss, argnums=(0, 1))(
            v0, jnp.asarray(eye))
        return val + gv.sum() * 1e-9 + ge.sum() * 1e-9

    if want4:
        ms4b = _marginal_ms(grad_body_1080, vj)
        extra = {"note": "forward+backward pixels/s over vertices+camera"}
        if ms2 is not None:
            extra["fwd_only_ms"] = round(ms2, 3)
            extra["bwd_over_fwd"] = round(ms4b / ms2 - 1.0, 2)
        record("4b_diff_fwd_bwd_1080p", float(2 * 1920 * 1080), ms4b,
               extra)

    # -- config 5: frame-batched animation ----------------------------------
    want5 = _want("5")
    from ceres_tpu.parallel.sharded import (
        _render_frames_jit, device_mesh, turntable_transforms)

    n_dev = len(jax.devices())
    mesh = device_mesh()
    n_frames = 4
    tracks = turntable_transforms(n_frames)
    cfg5 = RenderConfig(width=621, height=1344, mode="smooth",
                        backend="megakernel")

    if want5:
        from ceres_tpu.accel.cuts import build_clusters_quality
        from ceres_tpu.models.mesh import triangle_soup as _ts

        cs5 = build_clusters_quality(_ts(vj, fj, with_normals=False))

        def anim_body(v, i, aux):
            frames, _ = _render_frames_jit(v, fj, cam2, sun + i * 1e-3,
                                           tracks, cfg5, mesh, n_frames,
                                           clusters_pre=aux)
            return frames.sum()

        ms = _marginal_ms(anim_body, vj, aux=cs5)
        _, stats = _render_frames_jit(vj, fj, cam2, sun, tracks, cfg5, mesh,
                                      n_frames, clusters_pre=cs5)
        record("5_anim_4frames_621x1344", float(stats["rays"]), ms,
               {"devices": n_dev, "frames": n_frames,
                "note": "ms per 4-frame batch"})

    results.sort(key=lambda r: r["config"])
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
