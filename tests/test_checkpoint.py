"""Checkpoint / resume: orbax optimizer state + incremental frame output.

The reference has neither (SURVEY.md §5): long animations buffer all frames
in RAM and write once at the end (anim.cpp:44,124-127); there is no
optimizer to checkpoint. These cover the rebuild's two resume paths.
"""

import os

import numpy as np
import pytest

from ceres_tpu.models.camera import Camera
from ceres_tpu.render.renderer import RenderConfig, render_pipeline
from ceres_tpu.render.scenes import data_dir
from ceres_tpu.diff.inverse import fit_vertices

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_scene():
    # Two triangles facing the camera: cheap enough to fit in seconds.
    vertices = np.asarray([
        [-0.5, -0.5, 1.0], [0.5, -0.5, 1.0], [0.0, 0.5, 1.0],
        [-0.6, 0.2, 1.5], [0.4, 0.6, 1.5], [0.0, -0.6, 1.5],
    ], np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    camera = Camera.make(eye=(0, 0, -1), dir=(0, 0, 1), up=(0, 1, 0), fov=60)
    sun = np.asarray([2.0, 3.0, -2.0], np.float32)
    config = RenderConfig(width=24, height=24, mode="flat",
                          backend="bruteforce")
    target, _ = render_pipeline(jnp.asarray(vertices), jnp.asarray(faces),
                                camera, jnp.asarray(sun), config)
    return vertices, faces, camera, sun, np.asarray(target), config


def test_checkpoint_and_resume(tiny_scene, tmp_path):
    vertices, faces, camera, sun, target, config = tiny_scene
    noisy = vertices + 0.05
    ckpt = str(tmp_path / "ckpt")

    params1, hist1 = fit_vertices(noisy, faces, camera, sun, target,
                                  config=config, steps=4, learning_rate=1e-2,
                                  checkpoint_dir=ckpt, checkpoint_every=2)
    assert len(hist1) == 4
    assert os.path.isdir(ckpt) and any(os.scandir(ckpt))

    # Resume: asking for 7 total steps must run only the 3 remaining.
    params2, hist2 = fit_vertices(noisy, faces, camera, sun, target,
                                  config=config, steps=7, learning_rate=1e-2,
                                  checkpoint_dir=ckpt, checkpoint_every=2)
    assert len(hist2) == 3

    # The resumed trajectory must equal an uninterrupted 7-step fit
    # (state round-trips exactly through orbax).
    params_ref, hist_ref = fit_vertices(noisy, faces, camera, sun, target,
                                        config=config, steps=7,
                                        learning_rate=1e-2)
    np.testing.assert_allclose(np.asarray(params2["vertices"]),
                               np.asarray(params_ref["vertices"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(hist1 + hist2, hist_ref, rtol=1e-5)


def test_checkpoint_noop_when_done(tiny_scene, tmp_path):
    vertices, faces, camera, sun, target, config = tiny_scene
    ckpt = str(tmp_path / "ckpt2")
    _, hist = fit_vertices(vertices, faces, camera, sun, target,
                           config=config, steps=2, learning_rate=1e-3,
                           checkpoint_dir=ckpt, checkpoint_every=1)
    assert len(hist) == 2
    _, hist2 = fit_vertices(vertices, faces, camera, sun, target,
                            config=config, steps=2, learning_rate=1e-3,
                            checkpoint_dir=ckpt, checkpoint_every=1)
    assert hist2 == []  # everything restored, nothing left to run


def test_anim_incremental_frames_and_resume(tmp_path, capsys):
    from ceres_tpu.cli import anim as cli

    frames_dir = str(tmp_path / "frames")
    out = str(tmp_path / "turn.gif")
    argv = [os.path.join(data_dir(), "bunny.obj"), "-o", out, "--frames", "4",
            "--width", "32", "--height", "24", "--mode", "flat",
            "--backend", "bruteforce", "--batch", "2",
            "--save-frames", frames_dir]
    assert cli.main(argv) == 0
    written = sorted(os.listdir(frames_dir))
    assert written == [f"frame_{k:04d}.png" for k in range(4)]
    assert os.path.exists(out)

    # Second run: all batches skipped, video still assembled from disk.
    os.remove(out)
    assert cli.main(argv) == 0
    assert "Resumed: 4 frame(s)" in capsys.readouterr().out
    assert os.path.exists(out)
