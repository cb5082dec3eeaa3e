"""Native C++ OBJ parser == pure-Python parser, byte for byte."""

import numpy as np
import pytest

from ceres_tpu.io import native
from ceres_tpu.io.obj import parse_obj

from ceres_tpu.render.scenes import data_dir

DATA = data_dir()


@pytest.mark.skipif(not native.available(),
                    reason="no C++ toolchain to build the native parser")
class TestNativeParser:
    @pytest.mark.parametrize("name", ["bunny.obj", "dragon.obj"])
    def test_matches_python(self, name):
        path = f"{DATA}/{name}"
        v_n, f_n = native.parse_obj_file(path)
        with open(path) as fh:
            v_p, f_p = parse_obj(fh.read())
        np.testing.assert_array_equal(v_n, v_p)
        np.testing.assert_array_equal(f_n, f_p)
        assert v_n.dtype == np.float32 and f_n.dtype == np.int32

    def test_quads_and_negative_indices(self, tmp_path):
        obj = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
f -4 -3 -2
vn 0 0 1
vt 0 0
f 1/1/1 2/1/1 3/1/1
"""
        p = tmp_path / "quad.obj"
        p.write_text(obj)
        v_n, f_n = native.parse_obj_file(str(p))
        v_p, f_p = parse_obj(obj)
        np.testing.assert_array_equal(v_n, v_p)
        np.testing.assert_array_equal(f_n, f_p)
        assert f_n.shape == (4, 3)  # quad fan (2) + neg-index tri + triplet tri
