"""Pixel-block swizzling: raster order -> (tile, ray) order and back.

Ray tiles must be spatially coherent for cluster culling to bite: a raster
row of 512 pixels spans a third of a 1080p scanline, while a 16 x 32 pixel
block covers a compact screen region that overlaps few clusters. Pure
reshape/transpose, jit-friendly, inverse exactly restores raster order.
"""

from __future__ import annotations

import jax.numpy as jnp

TILE_H = 32
TILE_W = 32
TILE = TILE_H * TILE_W  # 1024 rays = two 512-ray kernel tiles, each a 16x32 block


def pad_hw(x, th: int = TILE_H, tw: int = TILE_W):
    """Zero-pad (H, W, ...) so both dims are tile multiples."""
    H, W = x.shape[:2]
    ph = (-H) % th
    pw = (-W) % tw
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)) + ((0, 0),) * (x.ndim - 2))
    return x


def swizzle(x, th: int = TILE_H, tw: int = TILE_W):
    """(H, W, C) -> (n_tiles * th * tw, C) in pixel-block order.

    Zero padding added as needed; zero ray directions are rejected by the
    intersection math (det == 0), so padded rays are inert.
    """
    x = pad_hw(x, th, tw)
    H, W, C = x.shape
    x = x.reshape(H // th, th, W // tw, tw, C)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(-1, C)


def swizzle_plane(x, th: int = TILE_H, tw: int = TILE_W):
    """(H, W) scalar plane -> (n_rays,) in pixel-block order (zero-padded).

    The column-form twin of :func:`swizzle` for structure-of-arrays ray
    pipelines (one call per x/y/z component)."""
    H, W = x.shape
    ph = (-H) % th
    pw = (-W) % tw
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)))
    H, W = x.shape
    x = x.reshape(H // th, th, W // tw, tw)
    return x.transpose(0, 2, 1, 3).reshape(-1)


def unswizzle_plane(x, height: int, width: int,
                    th: int = TILE_H, tw: int = TILE_W):
    """Inverse of swizzle_plane: (n_rays,) -> (height, width)."""
    Hp = height + (-height) % th
    Wp = width + (-width) % tw
    x = x.reshape(Hp // th, Wp // tw, th, tw)
    x = x.transpose(0, 2, 1, 3).reshape(Hp, Wp)
    return x[:height, :width]


def unswizzle(x, height: int, width: int, th: int = TILE_H, tw: int = TILE_W):
    """Inverse of swizzle: (n_rays, C) -> (height, width, C), padding cropped."""
    Hp = height + (-height) % th
    Wp = width + (-width) % tw
    C = x.shape[-1]
    x = x.reshape(Hp // th, Wp // tw, th, tw, C)
    x = x.transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, C)
    return x[:height, :width]
