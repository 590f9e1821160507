"""Remote-viewer TCP server — wire-compatible with the reference protocol so
stock SIBR remote viewers can connect.

Protocol (ref: gaussian_renderer/network_gui.py:26-86):
  in : 4-byte LE length + JSON {resolution_x/y, train, fov_y/x, z_near/far,
       shs_python, rot_scale_python, keep_alive, scaling_modifier,
       view_matrix (16 floats), view_projection_matrix (16 floats)}
       — matrix columns 1, 2 arrive sign-flipped and in the reference's
       transposed (glm) layout.
  out: raw RGB bytes (H*W*3, row-major) + 4-byte LE length + source_path.

The training loop drains the socket between iterations
(ref: train.py:72-86); here ``poll()`` plays that role.
"""
from __future__ import annotations

import json
import socket
import traceback
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..core.camera import Camera
from ..render import render


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def decode_camera(message: dict) -> Optional[Camera]:
    """Rebuild a Camera from a viewer message (ref: network_gui.py:57-82).

    The viewer sends the reference's transposed (glm) matrices with columns
    1,2 sign-flipped; our Camera stores math-normal orientation, so transpose
    after the flips.
    """
    width = int(message["resolution_x"])
    height = int(message["resolution_y"])
    if width == 0 or height == 0:
        return None
    import math
    wv = np.array(message["view_matrix"], np.float32).reshape(4, 4)
    wv[:, 1] = -wv[:, 1]
    wv[:, 2] = -wv[:, 2]
    fp = np.array(message["view_projection_matrix"], np.float32).reshape(4, 4)
    fp[:, 1] = -fp[:, 1]
    V = wv.T
    P = fp.T
    cam_center = np.linalg.inv(V)[:3, 3]
    return Camera(
        world_view=jnp.asarray(V),
        full_proj=jnp.asarray(P),
        camera_center=jnp.asarray(cam_center.astype(np.float32)),
        tan_fovx=jnp.float32(math.tan(message["fov_x"] * 0.5)),
        tan_fovy=jnp.float32(math.tan(message["fov_y"] * 0.5)),
        width=width, height=height)


class ViewerServer:
    """Non-blocking listener + per-iteration drain (ref: network_gui.py:24-55)."""

    def __init__(self, host: str, port: int, *, trainer=None,
                 source_path: str = "", pipe=None,
                 render_fn=None):
        self.trainer = trainer
        self.source_path = source_path
        self.pipe = pipe
        self.render_fn = render_fn
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nConnected by {addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _read(self) -> dict:
        length = int.from_bytes(_recv_exact(self.conn, 4), "little")
        return json.loads(_recv_exact(self.conn, length).decode("utf-8"))

    def _send(self, image_bytes: Optional[bytes]):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        verify = self.source_path
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def _render_view(self, cam: Camera, scaling_modifier: float) -> bytes:
        if self.render_fn is not None:
            img = self.render_fn(cam, scaling_modifier)
        else:
            tr = self.trainer
            sh_deg = min(tr.iteration // 1000, tr.model_cfg.sh_degree)
            # reuse the trainer's cached jitted per-view render; Cameras
            # carry static (width, height), so each viewer resolution
            # compiles once
            render_view = tr._eval_render(
                sh_deg, bool(tr.model_cfg.white_background))
            img = render_view(tr.state.params, tr.state.alive, cam,
                              jnp.float32(scaling_modifier))
        arr = np.asarray(jnp.clip(img, 0.0, 1.0))
        return (arr * 255).astype(np.uint8).transpose(1, 2, 0).tobytes()

    def poll(self, in_training: bool = True) -> None:
        """Drain all pending viewer requests (ref: train.py:72-86)."""
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                # anything waiting?
                self.conn.settimeout(0)
                try:
                    peek = self.conn.recv(1, socket.MSG_PEEK)
                    if not peek:
                        raise ConnectionError("peer closed")
                except (BlockingIOError, socket.timeout):
                    return
                finally:
                    self.conn.settimeout(None)
                message = self._read()
                cam = decode_camera(message)
                image_bytes = None
                if cam is not None:
                    image_bytes = self._render_view(
                        cam, float(message.get("scaling_modifier", 1.0)))
                self._send(image_bytes)
                do_training = bool(message.get("train", True))
                keep_alive = bool(message.get("keep_alive", False))
                if do_training and (in_training or not keep_alive):
                    return
            except Exception:
                traceback.print_exc()
                try:
                    self.conn.close()
                except OSError:
                    pass
                self.conn = None

    def close(self):
        if self.conn is not None:
            try:
                self.conn.close()
            except OSError:
                pass
        self.listener.close()
