"""Camera math for the TPU 3DGS framework.

Matrix conventions mirror the reference implementation exactly
(ref: utils/graphics_utils.py:38-71, scene/cameras.py:63-72):

* ``world_view`` is the standard world->view matrix ``[[R^T, t],[0,1]]``
  applied as ``p_view = world_view @ [p, 1]`` (the reference stores it
  transposed for glm; we store it math-normal and transpose only at the
  serialization boundary).
* ``getProjectionMatrix`` is the OpenGL-style matrix with ``z_sign=+1``
  (ref: utils/graphics_utils.py:51-71); ``full_proj = proj @ world_view``.
* ``camera_center`` is the inverse-view translation column
  (ref: scene/cameras.py:72).
* znear=0.01, zfar=100 (ref: scene/cameras.py:63-64).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

ZNEAR = 0.01
ZFAR = 100.0


def fov2focal(fov: float, pixels: float) -> float:
    # ref: utils/graphics_utils.py:73-74
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    # ref: utils/graphics_utils.py:76-77
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray = np.zeros(3), scale: float = 1.0) -> np.ndarray:
    """World->view matrix with optional recentering.

    ``R`` is the cam-to-world rotation as stored by the reference loaders
    ("R is stored transposed due to glm", ref: scene/dataset_readers.py:209),
    ``t`` the world-to-cam translation. ref: utils/graphics_utils.py:38-49.
    """
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = C2W[:3, 3]
    cam_center = (cam_center + translate) * scale
    C2W[:3, 3] = cam_center
    Rt = np.linalg.inv(C2W)
    return np.float32(Rt)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection, ref: utils/graphics_utils.py:51-71."""
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right
    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


import dataclasses

import jax


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single camera: array leaves + STATIC (width, height) aux data, so
    ``jax.jit`` over a Camera keeps the image dimensions compile-time
    constants (a NamedTuple would trace them and break the static-shape
    rasterizers).

    Use :func:`make_camera` to construct from COLMAP-style (R, t, FoV).
    """
    world_view: jnp.ndarray      # [4,4] p_view = world_view @ [p,1]
    full_proj: jnp.ndarray       # [4,4] p_clip = full_proj @ [p,1]
    camera_center: jnp.ndarray   # [3]
    tan_fovx: jnp.ndarray        # scalar
    tan_fovy: jnp.ndarray        # scalar
    width: int                   # static
    height: int                  # static

    def tree_flatten(self):
        children = (self.world_view, self.full_proj, self.camera_center,
                    self.tan_fovx, self.tan_fovy)
        return children, (self.width, self.height)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_fovy)


def make_camera(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int,
                translate: np.ndarray = np.zeros(3), scale: float = 1.0,
                znear: float = ZNEAR, zfar: float = ZFAR) -> Camera:
    """Build a Camera with the reference's exact matrix chain.

    ref: scene/cameras.py:69-72 — world_view_transform / projection_matrix /
    full_proj_transform / camera_center (we keep math-normal orientation).
    """
    V = world_to_view(R, t, translate, scale)
    P = projection_matrix(znear, zfar, fovx, fovy)
    full = (P @ V).astype(np.float32)
    cam_center = np.linalg.inv(V)[:3, 3].astype(np.float32)
    return Camera(
        world_view=jnp.asarray(V),
        full_proj=jnp.asarray(full),
        camera_center=jnp.asarray(cam_center),
        tan_fovx=jnp.float32(math.tan(fovx * 0.5)),
        tan_fovy=jnp.float32(math.tan(fovy * 0.5)),
        width=int(width),
        height=int(height),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CameraBatch:
    """A stack of cameras sharing (width, height) — selectable by traced index.

    The training loop indexes into this inside jit so the per-iteration camera
    pick does not trigger recompilation (the reference picks a random camera
    per iteration, ref: train.py:96-98). (width, height) are static aux data.
    """
    world_view: jnp.ndarray      # [B,4,4]
    full_proj: jnp.ndarray       # [B,4,4]
    camera_center: jnp.ndarray   # [B,3]
    tan_fovx: jnp.ndarray        # [B]
    tan_fovy: jnp.ndarray        # [B]
    width: int
    height: int

    def tree_flatten(self):
        children = (self.world_view, self.full_proj, self.camera_center,
                    self.tan_fovx, self.tan_fovy)
        return children, (self.width, self.height)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    def __len__(self):
        return self.world_view.shape[0]

    def select(self, i) -> Camera:
        return Camera(
            world_view=self.world_view[i],
            full_proj=self.full_proj[i],
            camera_center=self.camera_center[i],
            tan_fovx=self.tan_fovx[i],
            tan_fovy=self.tan_fovy[i],
            width=self.width,
            height=self.height,
        )


def stack_cameras(cams: list) -> CameraBatch:
    assert len(cams) > 0
    w, h = cams[0].width, cams[0].height
    for c in cams:
        assert (c.width, c.height) == (w, h), "CameraBatch requires uniform resolution"
    return CameraBatch(
        world_view=jnp.stack([c.world_view for c in cams]),
        full_proj=jnp.stack([c.full_proj for c in cams]),
        camera_center=jnp.stack([c.camera_center for c in cams]),
        tan_fovx=jnp.stack([c.tan_fovx for c in cams]),
        tan_fovy=jnp.stack([c.tan_fovy for c in cams]),
        width=w, height=h,
    )
