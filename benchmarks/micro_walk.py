"""Microbenchmark the walk kernel: per-tile overhead vs per-visit cost.

Feeds the kernel synthetic candidate lists with a controlled number of
visits per tile and fits time = a * n_tiles + b * visits. Run on the real
chip to decide where optimization effort goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ceres_tpu.ops import megakernel as mk

REPS = 20


def main():
    R = int(os.environ.get("MW_TILE", mk.TILE))
    n_tiles = (4080 * mk.TILE) // R
    n_c = 128
    Kp = 8
    C4 = 512
    rng = np.random.default_rng(0)
    # Weights that never accept (all-positive u but t numerator negative):
    # every visit runs the full epilogue, no ray ever records a hit, the
    # prune never fires -> all scheduled visits execute.
    w = jnp.asarray(np.abs(rng.normal(
        size=(n_c, Kp, C4))).astype(np.float32))
    w = w.at[:, :, 3 * (C4 // 4):].set(-1.0)
    # Channel-first (Kp, n_tiles * R) feature block, rays on the lane axis.
    feats = jnp.asarray(np.abs(rng.normal(
        size=(Kp, n_tiles * R))).astype(np.float32))
    # tcap row: large positive so the prune never exits early.
    feats = feats.at[4, :].set(1e30)

    for visits in (0, 1, 2, 4, 8):
        # Keys with ascending small entry bounds; count = visits per tile.
        cid = np.arange(n_c, dtype=np.int32) % n_c
        entry = np.float32(1.0).view(np.int32) & ~np.int32(127)
        keys = np.broadcast_to((entry | cid)[None, :], (n_tiles, n_c))
        keys = jnp.asarray(np.ascontiguousarray(keys))
        counts = jnp.full((n_tiles,), visits, jnp.int32)

        @jax.jit
        def run(f):
            def body(i, acc):
                out, steps = mk._walk_pallas(
                    counts, keys, f + i * 1e-7, w, tcap_col=4,
                    mode="closest", stream=False, interpret=False)
                return acc + steps[0, 0] + out[0]
            total = jax.lax.fori_loop(0, REPS, body, jnp.int32(0))
            return total

        float(run(feats))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(feats))
            best = min(best, time.perf_counter() - t0)
        dt = best / REPS
        per_tile = dt / n_tiles * 1e6
        _, steps = jax.jit(mk._walk_pallas, static_argnames=(
            "tcap_col", "mode", "stream", "interpret"))(
            counts, keys, feats, w, tcap_col=4, mode="closest",
            stream=False, interpret=False)
        print(f"visits={visits}: {dt*1e3:7.2f} ms  "
              f"{per_tile:6.2f} us/tile  executed={int(steps[0, 0])}")


if __name__ == "__main__":
    main()
