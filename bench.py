"""Benchmark driver: bunny 1080p primary+shadow rays on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the BASELINE.json north star: rays/sec/chip on bunny.obj at
1920x1080 with smooth shading and shadow rays (one primary + up to one
shadow traversal per pixel — the counting convention of
include/render.hpp:102,115; include/anim.cpp:109-110). ``vs_baseline``
compares against the reference C++ renderer's throughput measured on this
machine's host CPU (see benchmarks/reference_baseline.md).

Measurement methodology: REPS frames are rendered inside one jitted
``lax.fori_loop`` (each with a slightly different sun position so nothing
folds away) and the summed image forces the computation with a single
scalar fetch. This is required for honesty on remote-tunnel TPU backends
(axon): there ``jax.block_until_ready`` returns before the device work
runs, so per-dispatch wall-clock timing measures dispatch latency, not
compute. The in-graph loop also amortizes the per-dispatch RTT to <5%.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Measured with the reference built -O3 -mavx2 -mfma, OpenMP, on this
# image's host CPU (see benchmarks/reference_baseline.md for the recipe):
# bunny 1080p primary+shadow render loop throughput.
REFERENCE_RAYS_PER_SEC = 14.28e6

REPS = 20


def main():
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ceres_tpu.io.obj import load_obj
    from ceres_tpu.models.camera import Camera
    from ceres_tpu.render.renderer import RenderConfig, render_pipeline, render

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "bunny.obj")
    if not os.path.exists(path):
        path = "/root/reference/data/bunny.obj"
    verts, faces = load_obj(path)
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    direction = verts.mean(axis=0) - eye
    camera = Camera.make(eye=eye, dir=direction, up=(0, 1, 0), fov=60.0)
    sun = jnp.asarray([-50.0, 100.0, 0.0], jnp.float32)
    W, H = 1920, 1080
    config = RenderConfig(width=W, height=H, mode="smooth",
                          backend="megakernel")
    vj = jnp.asarray(verts)
    fj = jnp.asarray(faces)

    # The acceleration structure is built ONCE before the frame loop —
    # the reference's own structure: its hot app builds a SweepSAH BVH
    # before the loop (anim.cpp:62-66), so the rebuild uses the SweepSAH
    # treelet cut too (the round-5 on-chip builder A/B,
    # benchmarks/builder_ab.json: 14% fewer executed visits than the
    # LBVH cut on bunny). Host build is seconds, outside the timing, as
    # in the reference; per-frame time measures traversal + shading.
    from ceres_tpu.accel.cuts import build_clusters_quality
    from ceres_tpu.models.mesh import triangle_soup
    from ceres_tpu.render.renderer import prepare_winner_table

    soup_full = triangle_soup(vj, fj, with_normals=True)
    clusters = build_clusters_quality(
        triangle_soup(vj, fj, with_normals=False),
        builder=os.environ.get("CERES_BENCH_BUILDER", "sweep"))
    table = prepare_winner_table(soup_full, clusters, config)

    @functools.partial(jax.jit, static_argnames="k")
    def render_k(v, cs, tbl, k):
        def body(i, acc):
            image, _ = render_pipeline(v, fj, camera, sun + i * 1e-3, config,
                                       clusters=cs, table_cols=tbl)
            return acc + image.sum()
        return jax.lax.fori_loop(0, k, body, 0.0)

    # Rays per frame (the reference's counting: pixels + primary hits).
    _, stats = render(verts, faces, camera, np.asarray(sun), config=config)
    rays = float(stats["rays"])  # forces a tiny fetch; also syncs

    float(render_k(vj, clusters, table, REPS))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(render_k(vj, clusters, table, REPS))  # scalar fetch = real synchronization
        best = min(best, time.perf_counter() - t0)
    dt = best / REPS

    rays_per_sec = rays / dt
    out = {
        "metric": "rays_per_sec_per_chip_bunny1080p",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
