"""OBJ loader behavior parity (reference: lib/obj.hpp, lib/obj_norms.hpp)."""

import io

import numpy as np

from ceres_tpu.io.obj import load_obj, parse_obj


def test_bunny_counts(bunny):
    v, f = bunny
    assert v.shape == (2503, 3)
    assert f.shape == (4968, 3)
    assert v.dtype == np.float32
    assert f.dtype == np.int32


def test_dragon_counts(dragon):
    v, f = dragon
    assert v.shape == (11745, 3)
    assert f.shape == (23490, 3)


def test_fan_triangulation():
    # Quads become a fan around the first vertex (obj.hpp:78-92).
    text = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
"""
    v, f = parse_obj(text)
    assert f.tolist() == [[0, 1, 2], [0, 2, 3]]


def test_negative_indices_and_triplets():
    # Negative indices are relative to the current vertex count (obj.hpp:80);
    # vn/vt parts of i/j/k triplets are discarded (obj.hpp:38-51).
    text = """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
vt 0 0
f -3/1/1 -2/1/1 -1/1/1
"""
    v, f = parse_obj(text)
    assert f.tolist() == [[0, 1, 2]]


def test_stream_input():
    v, f = load_obj(io.StringIO("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"))
    assert v.shape == (3, 3) and f.shape == (1, 3)
