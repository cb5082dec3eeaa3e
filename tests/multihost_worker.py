"""Worker for the 2-process multi-host test (SURVEY.md §4 item 5).

Spawned twice by tests/test_multihost.py: each process joins a
jax.distributed runtime (CPU backend, 4 virtual devices per process, gloo
collectives), builds the GLOBAL ("frames", "rays") mesh over all 8
devices, renders a scene sharded across both processes, and checks

  * its addressable image rows equal the same rows of a single-device
    render computed locally,
  * global stats (psum'd across processes) match the single-device stats,
  * the gradient of a photometric loss w.r.t. vertices — psum'd across
    the mesh by shard_map's transpose, i.e. across PROCESSES — matches
    the single-device gradient on every process.

Exit code 0 = all assertions passed on this process.
"""

import sys

coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from ceres_tpu.parallel import distributed

distributed.initialize(coordinator, num_procs, pid,
                       local_device_count=4, cpu=True)

import jax
import jax.numpy as jnp
import numpy as np

from ceres_tpu.models.camera import Camera
from ceres_tpu.parallel.distributed import global_mesh, process_info
from ceres_tpu.parallel.sharded import render_sharded
from ceres_tpu.render.renderer import RenderConfig, render_pipeline

ppid, nproc, n_local, n_global = process_info()
assert nproc == num_procs and n_local == 4 and n_global == 4 * num_procs, (
    ppid, nproc, n_local, n_global)

# Tiny scene: a two-triangle quad in front of the camera.
verts = jnp.asarray([[-1.0, -1.0, 2.0], [1.0, -1.0, 2.0],
                     [1.0, 1.0, 2.0], [-1.0, 1.0, 2.0]], jnp.float32)
faces = jnp.asarray([[0, 2, 1], [0, 3, 2]], jnp.int32)
camera = Camera.make(eye=(0, 0, 0), dir=(0, 0, 1), up=(0, 1, 0), fov=70.0)
sun = jnp.asarray([3.0, 4.0, -2.0], jnp.float32)
config = RenderConfig(width=64, height=32, mode="smooth",
                      backend="bruteforce")

mesh = global_mesh()
assert mesh.devices.size == n_global

# Single-device reference, computed independently on every process.
ref_img, ref_stats = render_pipeline(verts, faces, camera, sun, config)
ref_img = np.asarray(ref_img)

img, stats = render_sharded(verts, faces, camera, sun, config=config,
                            mesh=mesh)
# Every process checks ITS addressable rows against the local reference.
checked_rows = 0
for shard in img.addressable_shards:
    rows = shard.index[0]
    local = np.asarray(shard.data)
    want = ref_img[rows]
    np.testing.assert_allclose(local[:want.shape[0]], want,
                               rtol=1e-5, atol=1e-5)
    checked_rows += want.shape[0]
assert checked_rows > 0, "no addressable image rows on this process"
# Stats are psum'd over the whole mesh -> global counts on every process.
assert int(jax.device_get(stats["rays"])) == int(ref_stats["rays"])
assert int(jax.device_get(stats["hits"])) == int(ref_stats["hits"])


# Gradient: shard_map's transpose psums replicated-input grads across the
# mesh — including across processes, over the gloo backend.
def loss_sharded(v):
    image, _ = render_sharded(v, faces, camera, sun, config=config,
                              mesh=mesh)
    return jnp.sum(image ** 2)


def loss_local(v):
    image, _ = render_pipeline(v, faces, camera, sun, config)
    return jnp.sum(image ** 2)


# jit the grad: the transpose of replicating an input over a
# multi-process mesh is a cross-process reduction, which must compile
# into the SPMD program (eager mode cannot issue cross-host transfers).
g_sharded = np.asarray(jax.device_get(jax.jit(jax.grad(loss_sharded))(verts)))
g_local = np.asarray(jax.grad(loss_local)(verts))
assert np.isfinite(g_sharded).all() and np.abs(g_sharded).max() > 0
np.testing.assert_allclose(g_sharded, g_local, rtol=1e-4,
                           atol=1e-6 * max(1.0, np.abs(g_local).max()))

print(f"worker {pid}: OK rows={checked_rows} "
      f"rays={int(jax.device_get(stats['rays']))}")
