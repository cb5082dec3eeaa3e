"""One worker of the scaling CONTENTION CONTROL (record_scaling.py).

Renders a 1/N-height row shard of the bunny frame on a single-device CPU
backend, with no mesh and no shard_map — N of these run CONCURRENTLY so
they contend for the same host cores exactly like N virtual mesh devices
do. Their aggregate throughput is the contention-matched IDEAL against
which the mesh throughput is an efficiency, separating shard_map/mesh
overhead from plain core contention (which the raw rate_8/rate_1 number
conflates).

Protocol: compile + warm up, touch ready_<idx>, poll for the parent's
"go" file (barrier so all timed sections overlap), time REPS frames,
write result_<idx>.json.

Usage: contention_worker.py <idx> <n> <width> <height> <reps> <syncdir>
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    idx, n, width, height, reps = (int(a) for a in sys.argv[1:6])
    syncdir = sys.argv[6]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    import numpy as np
    import jax.numpy as jnp

    from ceres_tpu.io.obj import load_obj
    from ceres_tpu.models.camera import Camera
    from ceres_tpu.parallel.sharded import _pad_rows, _render_rows
    from ceres_tpu.render.renderer import RenderConfig
    from ceres_tpu.render.scenes import bunny_path

    verts, faces = load_obj(bunny_path())
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    camera = Camera.make(eye=eye, dir=verts.mean(axis=0) - eye,
                         up=(0, 1, 0), fov=60.0)
    sun = jnp.asarray([-50.0, 100.0, 0.0], jnp.float32)
    cfg = RenderConfig(width=width, height=height, mode="smooth",
                       backend="megakernel")
    h_local = _pad_rows(height, n)
    row0 = jnp.float32(idx * h_local)
    vj, fj = jnp.asarray(verts), jnp.asarray(faces)

    @functools.partial(jax.jit, static_argnames="k")
    def run(v, k):
        def body(i, acc):
            color, _ = _render_rows(v, fj, camera, sun + i * 1e-3, row0,
                                    h_local, cfg)
            return acc + color.sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    float(run(vj, reps))  # compile + warm
    open(os.path.join(syncdir, f"ready_{idx}"), "w").close()
    go = os.path.join(syncdir, "go")
    deadline = time.time() + 600
    while not os.path.exists(go):
        if time.time() > deadline:
            return 1
        time.sleep(0.01)

    # Best of 2 timed runs, mirroring the mesh harness; back-to-back so
    # the workers stay overlapped through both.
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(vj, reps))
        dt = min(dt, time.perf_counter() - t0)

    with open(os.path.join(syncdir, f"result_{idx}.json"), "w") as fh:
        json.dump({"idx": idx, "seconds": dt, "reps": reps,
                   "rows": h_local}, fh)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
