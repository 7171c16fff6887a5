"""V4L2 capture through the native library (video.cpp:255-340 rebuilt).

Only usable on Linux hosts with /dev/video*; the record/replay path
(FileSource) is the hardware-free integration surface, exactly like the
reference's --save/--load loop."""

from __future__ import annotations

import ctypes

import numpy as np

from slam_robot_tpu.io import native


class Capture:
    def __init__(self, device: str = "/dev/video0", width: int = 640,
                 height: int = 480, fps: int = 5, num_buffers: int = 4):
        self.device = device
        self.width = width
        self.height = height
        self.fps = fps
        self.num_buffers = num_buffers
        self._cap = None

    def start(self) -> bool:
        lib = native.load()
        if lib is None or not hasattr(lib, "v4l2_open"):
            return False
        self._lib = lib
        self._cap = lib.v4l2_open(
            self.device.encode(), self.width, self.height, self.fps,
            self.num_buffers,
        )
        return bool(self._cap)

    def read(self):
        """Grey f32 [h,w] frame or None."""
        if not self._cap:
            return None
        out = np.empty(self.height * self.width, np.float32)
        ok = self._lib.v4l2_read_grey(
            self._cap, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if not ok:
            return None
        return out.reshape(self.height, self.width)

    def close(self) -> None:
        if self._cap:
            self._lib.v4l2_close(self._cap)
            self._cap = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
