"""Benchmark driver: bunny 1080p primary+shadow rays on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the BASELINE.json north star: rays/sec/chip on bunny.obj at
1920x1080 with smooth shading and shadow rays (one primary + up to one
shadow traversal per pixel — the counting convention of
include/render.hpp:102,115; include/anim.cpp:109-110). ``vs_baseline``
compares against the reference C++ renderer's throughput measured on this
machine's host CPU when available (see BASELINE.md: the reference
publishes no numbers; its binaries print per-run timings), else against a
recorded constant.
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


def main():
    import numpy as np
    import jax

    from ceres_tpu.io.obj import load_obj
    from ceres_tpu.models.camera import Camera
    from ceres_tpu.render.renderer import render

    verts, faces = load_obj(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "data", "bunny.obj")
        if os.path.exists(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "data", "bunny.obj"))
        else "/root/reference/data/bunny.obj")
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    direction = verts.mean(axis=0) - eye
    camera = Camera.make(eye=eye, dir=direction, up=(0, 1, 0), fov=60.0)
    sun = np.asarray([-50.0, 100.0, 0.0], np.float32)
    W, H = 1920, 1080

    def run():
        image, stats = render(verts, faces, camera, sun, width=W, height=H,
                              mode="smooth", backend="megakernel")
        jax.block_until_ready(image)
        return image, stats

    _, stats = run()  # compile
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        _, stats = run()
    dt = (time.perf_counter() - t0) / reps

    rays = float(stats["rays"])  # primary + shadow traversals per frame
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
