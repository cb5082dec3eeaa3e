"""Differentiable mode at BASELINE scale (config 4: bunny).

The quad-scene FD checks (test_gradients.py) pin down the math; these run
the same probes on the real bunny mesh through the megakernel backend —
FD probes on randomly chosen vertex coordinates against the analytic
gradient on an interior-pixel mask, and the BASELINE config-4 inverse
rendering fit on bunny.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ceres_tpu.render.renderer import RenderConfig, render
from ceres_tpu.render import scenes
from ceres_tpu.diff.inverse import fit_vertices


def _interior_mask(img):
    hit = np.asarray(img).max(axis=-1) > 0
    m = hit.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            m &= np.roll(np.roll(hit, dy, 0), dx, 1)
    m[0, :] = m[-1, :] = False
    m[:, 0] = m[:, -1] = False
    return m


def test_bunny_vertex_grads_match_fd(bunny):
    scene = scenes.bunny_scene()
    kw = dict(width=72, height=72, mode="smooth", backend="megakernel")
    base, stats = render(scene.vertices, scene.faces, scene.camera,
                         scene.sun, **kw)
    mask = _interior_mask(base)
    assert mask.sum() > 80
    w = jnp.asarray(mask[:, :, None].astype(np.float32))
    fj = jnp.asarray(scene.faces)

    def loss(v):
        img, _ = render(v, fj, scene.camera, scene.sun, **kw)
        return jnp.sum(img * w)

    loss_j = jax.jit(loss)
    g = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(scene.vertices)))
    assert np.isfinite(g).all()

    # FD probes on the highest-|grad| coordinates (strong signal, so the
    # f32 FD quotient is meaningful) plus a few random ones.
    flat = np.abs(g).ravel()
    idxs = list(np.argsort(flat)[-6:])
    rng = np.random.default_rng(0)
    idxs += list(rng.choice(np.nonzero(flat > 0.01 * flat.max())[0], 4,
                            replace=False))
    v0 = np.asarray(scene.vertices, np.float32)
    eps = 2e-4  # bunny scale ~0.15: small enough to stay on-surface
    checked = 0
    for idx in idxs:
        ij = np.unravel_index(idx, v0.shape)
        vp = v0.copy(); vp[ij] += eps
        vm = v0.copy(); vm[ij] -= eps
        fd = (float(loss_j(jnp.asarray(vp)))
              - float(loss_j(jnp.asarray(vm)))) / (2 * eps)
        # Skip probes whose FD quotient is visibility-contaminated (the
        # perturbation flipped a silhouette pixel: FD blows past the
        # analytic scale).
        if abs(fd) < 1e-6 or abs(fd) > 5 * abs(g[ij]) + 1.0:
            continue
        np.testing.assert_allclose(g[ij], fd, rtol=0.15,
                                   atol=0.05 * abs(fd))
        checked += 1
    assert checked >= 5, f"only {checked} usable FD probes"


def test_bunny_inverse_rendering_fit(bunny):
    """BASELINE config 4: inverse-rendering fit ON BUNNY (megakernel)."""
    scene = scenes.bunny_scene()
    cfg = RenderConfig(width=48, height=48, mode="smooth",
                       backend="megakernel")
    target, tstats = render(scene.vertices, scene.faces, scene.camera,
                            scene.sun, config=cfg)
    assert int(tstats["primary_hits"]) > 200

    rng = np.random.default_rng(3)
    v0 = np.asarray(scene.vertices, np.float32)
    scale = float(np.abs(v0 - v0.mean(0)).max())
    noisy = v0 + (0.02 * scale) * rng.standard_normal(v0.shape).astype(
        np.float32)
    params, history = fit_vertices(
        noisy, scene.faces, scene.camera, scene.sun, np.asarray(target),
        config=cfg, steps=40, learning_rate=2e-4)
    assert np.isfinite(history).all()
    assert history[-1] < history[0] * 0.7, history[::8]
