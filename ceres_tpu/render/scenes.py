"""Canonical benchmark scenes (BASELINE.md / BASELINE.json configs).

The reference has no real CLI; its scenes are hard-coded presets
(include/static.cpp:27-69, include/anim.cpp:27-35). These helpers pin down
the driver-specified benchmark configs so tests, bench.py and the CLI agree.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from ceres_tpu.io.obj import load_obj
from ceres_tpu.models.camera import Camera
from ceres_tpu.models.transform import rotate_vertices_about_axis


def data_dir() -> str:
    """The repo's own ``data/`` directory (bunny/dragon assets checked in),
    falling back to the reference checkout if the package is used in-place
    elsewhere."""
    here = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "data")
    if os.path.isdir(here):
        return here
    return "/root/reference/data"


DATA_DIR = data_dir()


def bunny_path() -> str:
    return os.path.join(data_dir(), "bunny.obj")


def dragon_path() -> str:
    return os.path.join(data_dir(), "dragon.obj")
AXES = {"x": 0, "y": 1, "z": 2}


@dataclasses.dataclass
class Scene:
    vertices: np.ndarray
    faces: np.ndarray
    camera: Camera
    sun: np.ndarray
    name: str = "scene"


def load_scene(
    obj_path: str,
    eye=(0.0, 0.1, -0.3),
    direction: Optional[tuple] = None,
    up=(0.0, 1.0, 0.0),
    fov: float = 60.0,
    sun=(-50.0, 100.0, 0.0),
    rotate_axis: Optional[str] = None,
    rotate_degrees: float = 0.0,
    name: str = "scene",
) -> Scene:
    vertices, faces = load_obj(obj_path)
    if rotate_axis is not None and rotate_degrees != 0.0:
        vertices = np.asarray(
            rotate_vertices_about_axis(vertices, AXES[rotate_axis], rotate_degrees)
        )
    if direction is None:
        # Default: look at the mesh centroid.
        center = vertices.mean(axis=0)
        direction = tuple(center - np.asarray(eye, np.float32))
    camera = Camera.make(eye=eye, dir=direction, up=up, fov=fov)
    return Scene(
        vertices=vertices,
        faces=faces,
        camera=camera,
        sun=np.asarray(sun, np.float32),
        name=name,
    )


def bunny_scene(rotate_degrees: float = -145.0) -> Scene:
    """BASELINE config 1/2: bunny, eye (0, .1, -.3), mesh rotated about y."""
    return load_scene(
        f"{DATA_DIR}/bunny.obj",
        eye=(0.0, 0.1, -0.3),
        up=(0.0, 1.0, 0.0),
        fov=60.0,
        sun=(-50.0, 100.0, 0.0),
        rotate_axis="y",
        rotate_degrees=rotate_degrees,
        name="bunny",
    )


def dragon_scene() -> Scene:
    """BASELINE config 3: dragon with the static.cpp preset camera
    (static.cpp:38-47: eye (0,-15,2), dir (0,1,0), up (0,0,1), fov 60,
    sun (-50,-20,0), mesh rotated 90 deg about x)."""
    return load_scene(
        f"{DATA_DIR}/dragon.obj",
        eye=(0.0, -15.0, 2.0),
        direction=(0.0, 1.0, 0.0),
        up=(0.0, 0.0, 1.0),
        fov=60.0,
        sun=(-50.0, -20.0, 0.0),
        rotate_axis="x",
        rotate_degrees=90.0,
        name="dragon",
    )
