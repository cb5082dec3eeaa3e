"""The float/double Scalar axis (the reference's one real config knob).

The reference templates every component on ``Scalar`` and switches
float -> double with anim's ``-d`` flag (anim.cpp:145-158). Here precision
follows the input dtype: float64 vertices (with x64 enabled) run the whole
bruteforce pipeline in double and must match the float64 golden oracle far
tighter than the f32 path does.
"""

import jax
import os
import numpy as np
import pytest

from ceres_tpu.render.renderer import RenderConfig, render
from ceres_tpu.render import scenes
from ceres_tpu.render.scenes import data_dir
from ceres_tpu.utils import golden


def _render_and_oracle(scene, W, H, dtype):
    with jax.enable_x64():
        img, stats = render(
            np.asarray(scene.vertices, dtype), np.asarray(scene.faces),
            scene.camera, np.asarray(scene.sun, dtype),
            config=RenderConfig(width=W, height=H, mode="smooth",
                                backend="bruteforce"),
        )
        img = np.asarray(img)
    gold, _ = golden.render_golden(
        scene.vertices, scene.faces,
        np.asarray(scene.camera.eye, np.float64),
        np.asarray(scene.camera.dir, np.float64),
        np.asarray(scene.camera.up, np.float64),
        float(scene.camera.fov), np.asarray(scene.sun, np.float64),
        W, H, mode="smooth",
    )
    return img, gold


def test_double_render_is_tight(bunny):
    """f64 render agrees with the f64 oracle essentially bit-for-bit —
    no silhouette budget needed (the f32 test allows 1% edge flips)."""
    scene = scenes.bunny_scene()
    img, gold = _render_and_oracle(scene, 48, 48, np.float64)
    assert img.dtype == np.float64
    np.testing.assert_allclose(img, gold, atol=1e-9)


def test_double_tighter_than_float(bunny):
    scene = scenes.bunny_scene()
    W = H = 48
    img64, gold = _render_and_oracle(scene, W, H, np.float64)
    img32, _ = render(
        scene.vertices, scene.faces, scene.camera, scene.sun,
        config=RenderConfig(width=W, height=H, mode="smooth",
                            backend="bruteforce"))
    err64 = np.abs(img64 - gold).max()
    err32 = np.abs(np.asarray(img32) - gold).max()
    assert err64 < err32
    assert err64 < 1e-9


def test_megakernel_float64_matches_oracle(bunny):
    """The ACCELERATED f64 path: megakernel winner search in f32, every
    value recomputed in f64 (megakernel._detach_f32). Must agree with the
    all-f64 oracle except at winner tie-breaks within f32 resolution —
    i.e. a small silhouette budget, with f64-tight interiors."""
    scene = scenes.bunny_scene()
    W = H = 48
    with jax.enable_x64():
        img, stats = render(
            np.asarray(scene.vertices, np.float64), np.asarray(scene.faces),
            scene.camera, np.asarray(scene.sun, np.float64),
            config=RenderConfig(width=W, height=H, mode="smooth",
                                backend="megakernel"))
        img = np.asarray(img)
    assert img.dtype == np.float64
    gold, _ = golden.render_golden(
        scene.vertices, scene.faces,
        np.asarray(scene.camera.eye, np.float64),
        np.asarray(scene.camera.dir, np.float64),
        np.asarray(scene.camera.up, np.float64),
        float(scene.camera.fov), np.asarray(scene.sun, np.float64),
        W, H, mode="smooth")
    d = np.abs(img - gold).max(axis=-1)
    # f32-resolution winner flips only: a vanishing set of edge pixels...
    assert (d > 1e-9).mean() < 0.01, f"{(d > 1e-9).mean():.3%} pixels off"
    # ...and exact-winner pixels agree at f64 tightness.
    assert np.median(d) < 1e-12


def test_megakernel_float64_values_beat_f32(bunny):
    """At matching winners, the f64 megakernel values must be strictly
    tighter to the f64 oracle than the f32 megakernel's."""
    scene = scenes.bunny_scene()
    W = H = 48
    cfg = RenderConfig(width=W, height=H, mode="smooth",
                       backend="megakernel")
    with jax.enable_x64():
        img64, _ = render(
            np.asarray(scene.vertices, np.float64), np.asarray(scene.faces),
            scene.camera, np.asarray(scene.sun, np.float64), config=cfg)
        img64 = np.asarray(img64)
    img32 = np.asarray(render(scene.vertices, scene.faces, scene.camera,
                              scene.sun, config=cfg)[0])
    gold, _ = golden.render_golden(
        scene.vertices, scene.faces,
        np.asarray(scene.camera.eye, np.float64),
        np.asarray(scene.camera.dir, np.float64),
        np.asarray(scene.camera.up, np.float64),
        float(scene.camera.fov), np.asarray(scene.sun, np.float64),
        W, H, mode="smooth")
    d64 = np.abs(img64 - gold).max(axis=-1)
    d32 = np.abs(img32.astype(np.float64) - gold).max(axis=-1)
    # Compare on LIT pixels where both picked the oracle winner (misses
    # are exactly black in every backend and would wash out the medians).
    both = (gold.max(axis=-1) > 0.01) & (d64 < 1e-6) & (d32 < 1e-3)
    assert both.mean() > 0.05    # lit, winner-agreeing bunny pixels
    assert np.median(d64[both]) < np.median(d32[both]) * 1e-3


def test_cli_double_flag(tmp_path):
    from ceres_tpu.cli import render as cli

    out = tmp_path / "out.ppm"
    try:
        rc = cli.main([os.path.join(data_dir(), "bunny.obj"), "-o", str(out),
                       "--width", "32", "--height", "32", "-d",
                       "--backend", "megakernel"])  # auto-switches + warns
    finally:
        # The CLI flips the global x64 flag (fine for a process-per-run
        # CLI); restore it so later tests trace in f32 again.
        jax.config.update("jax_enable_x64", False)
    assert rc == 0
    assert out.exists() and out.stat().st_size > 32 * 32 * 3


def test_anim_cli_double_flag(tmp_path):
    """`ceres-anim -d`: the reference anim app's one real flag
    (anim.cpp:145-158) — double-precision Scalar for the whole frame loop."""
    from ceres_tpu.cli import anim as cli

    out = tmp_path / "turn.gif"
    try:
        rc = cli.main([os.path.join(data_dir(), "bunny.obj"), "-o", str(out),
                       "--frames", "2", "--width", "24", "--height", "16",
                       "--mode", "flat", "-d",
                       "--backend", "megakernel"])  # auto-switches + warns
    finally:
        jax.config.update("jax_enable_x64", False)
    assert rc == 0
    assert out.exists() and out.stat().st_size > 0
