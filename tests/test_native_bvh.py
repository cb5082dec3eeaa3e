"""Native C++ binned-SAH builder: availability, golden parity, speed."""

import time

import numpy as np
import pytest

from ceres_tpu.accel import golden_builders as gb
from ceres_tpu.accel import native


def _boxes(rng, T):
    base = rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    ext = rng.uniform(0.01, 0.4, (T, 3)).astype(np.float32)
    lo = base
    hi = base + ext
    centers = (lo + hi) / 2
    return lo, hi, centers


def test_native_available():
    # g++ is part of this image; the builder must compile and load.
    assert native.available()


def _assert_identical(a: gb.FlatBvh, b: gb.FlatBvh):
    assert a.node_count == b.node_count
    np.testing.assert_array_equal(a.prim_count, b.prim_count)
    np.testing.assert_array_equal(a.first_child, b.first_child)
    np.testing.assert_array_equal(a.prim_indices, b.prim_indices)
    np.testing.assert_array_equal(a.bounds, b.bounds)


def test_parity_with_golden_random(rng):
    lo, hi, centers = _boxes(rng, 1500)
    nat = native.build_binned_sah_native(lo, hi, centers)
    gold = gb.build_binned_sah(lo, hi, centers)
    _assert_identical(nat, gold)
    gb.validate(nat)


def test_parity_with_golden_bunny(bunny):
    verts, faces = bunny
    pts = verts[faces]  # (F, 3, 3)
    lo = pts.min(axis=1).astype(np.float32)
    hi = pts.max(axis=1).astype(np.float32)
    centers = pts.mean(axis=1).astype(np.float32)
    nat = native.build_binned_sah_native(lo, hi, centers)
    gold = gb.build_binned_sah(lo, hi, centers)
    _assert_identical(nat, gold)
    gb.validate(nat)
    assert gb.sah_cost(nat) == pytest.approx(gb.sah_cost(gold))


def test_parity_other_knobs(rng):
    lo, hi, centers = _boxes(rng, 400)
    nat = native.build_binned_sah_native(lo, hi, centers, bin_count=32,
                                         max_leaf_size=4)
    gold = gb.build_binned_sah(lo, hi, centers, bin_count=32,
                               max_leaf_size=4)
    _assert_identical(nat, gold)


def test_native_is_fast(dragon):
    verts, faces = dragon
    pts = verts[faces]
    lo = pts.min(axis=1).astype(np.float32)
    hi = pts.max(axis=1).astype(np.float32)
    centers = pts.mean(axis=1).astype(np.float32)
    t0 = time.perf_counter()
    bvh = native.build_binned_sah_native(lo, hi, centers)
    dt = time.perf_counter() - t0
    gb.validate(bvh)
    # 23k-triangle dragon in well under a second (the reference prints
    # host build times in this range too, static.cpp:98-111).
    assert dt < 1.0, f"native build took {dt:.3f}s"


def test_fast_dispatch(rng):
    lo, hi, centers = _boxes(rng, 300)
    a = native.build_binned_sah_fast(lo, hi, centers)
    b = gb.build_binned_sah(lo, hi, centers)
    _assert_identical(a, b)
