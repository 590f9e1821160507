"""Remote-viewer TCP client — speaks the SIBR remote viewer's side of the
protocol (ref: gaussian_renderer/network_gui.py:43-86 from the server's
perspective; README.md:362-391 describes the stock C++ client).

Useful for scripted frame grabs from a live training process and as the test
harness for :class:`gs_tpu.viewer.server.ViewerServer`.
"""
from __future__ import annotations

import json
import math
import socket

import numpy as np


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


class ViewerClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009,
                 timeout: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)

    def request_frame(self, camera, *, width: int = 0, height: int = 0,
                      train: bool = True, keep_alive: bool = True,
                      scaling_modifier: float = 1.0,
                      shs_python: bool = False,
                      rot_scale_python: bool = False) -> tuple:
        """Request a render of ``camera`` (a gs_tpu Camera); returns
        (image [H,W,3] uint8 or None, source_path str)."""
        if camera is not None:
            width = width or camera.width
            height = height or camera.height
            # our math-normal matrices -> the reference's transposed layout
            # with columns 1,2 sign-flipped (inverse of server decode)
            wv = np.asarray(camera.world_view).T.copy()
            wv[:, 1] = -wv[:, 1]
            wv[:, 2] = -wv[:, 2]
            fp = np.asarray(camera.full_proj).T.copy()
            fp[:, 1] = -fp[:, 1]
            fovx = 2 * math.atan(float(camera.tan_fovx))
            fovy = 2 * math.atan(float(camera.tan_fovy))
        else:
            width = height = 0
            wv = np.zeros((4, 4)); fp = np.zeros((4, 4))
            fovx = fovy = 0.0
        message = {
            "resolution_x": width, "resolution_y": height,
            "train": train, "fov_y": fovy, "fov_x": fovx,
            "z_near": 0.01, "z_far": 100.0,
            "shs_python": shs_python, "rot_scale_python": rot_scale_python,
            "keep_alive": keep_alive, "scaling_modifier": scaling_modifier,
            "view_matrix": [float(x) for x in wv.reshape(-1)],
            "view_projection_matrix": [float(x) for x in fp.reshape(-1)],
        }
        payload = json.dumps(message).encode("utf-8")
        self.sock.sendall(len(payload).to_bytes(4, "little"))
        self.sock.sendall(payload)
        image = None
        if width and height:
            raw = _recv_exact(self.sock, width * height * 3)
            image = np.frombuffer(raw, np.uint8).reshape(height, width, 3)
        n = int.from_bytes(_recv_exact(self.sock, 4), "little")
        source_path = _recv_exact(self.sock, n).decode("ascii")
        return image, source_path

    def close(self):
        self.sock.close()
