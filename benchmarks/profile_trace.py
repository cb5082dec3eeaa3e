"""Capture a jax.profiler device trace of the bunny 1080p frame.

Writes the TensorBoard trace under benchmarks/traces/; the xplane pb is
the checked-in evidence for where frame time goes (VERDICT round-2 item:
no profiler artifact existed).
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ceres_tpu.io.obj import load_obj
from ceres_tpu.models.camera import Camera
from ceres_tpu.render.renderer import RenderConfig, render_pipeline
from ceres_tpu.accel.clusters import build_clusters_treelet
from ceres_tpu.models.mesh import triangle_soup


def main():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "bunny.obj")
    verts, faces = load_obj(path)
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    direction = verts.mean(axis=0) - eye
    camera = Camera.make(eye=eye, dir=direction, up=(0, 1, 0), fov=60.0)
    sun = jnp.asarray([-50.0, 100.0, 0.0], jnp.float32)
    config = RenderConfig(width=1920, height=1080, mode="smooth",
                          backend="megakernel")
    vj = jnp.asarray(verts)
    fj = jnp.asarray(faces)

    @jax.jit
    def frame(v, s):
        clusters = build_clusters_treelet(
            triangle_soup(v, fj, with_normals=False))
        image, _ = render_pipeline(v, fj, camera, s, config,
                                   clusters=clusters)
        return image.sum()

    float(frame(vj, sun))  # compile + warm

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "traces")
    with jax.profiler.trace(out_dir):
        for i in range(3):
            float(frame(vj, sun + i * 1e-3))

    print("trace dirs:", glob.glob(out_dir + "/**/*.pb", recursive=True)
          + glob.glob(out_dir + "/**/*.json.gz", recursive=True))


if __name__ == "__main__":
    main()
