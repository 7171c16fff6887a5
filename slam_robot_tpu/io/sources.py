"""Frame sources: the ImageSource strategy hierarchy (video.h:14-105).

- ``FileSource``        replay `%08d.png` (or .npy) directories — the
                        reference's --load path (video.h:24-38)
- ``DuoSource``         two sources alternated by camera index (video.h:65-86)
- ``SyntheticSource``   frames rendered from a landmark world along a
                        scripted trajectory (no reference analog; replaces
                        the live camera for tests/benchmarks)
- ``V4L2Source``        raw V4L2 capture via the native C shim when the
                        device exists (video.cpp:255-340); YUYV->RGB
                        conversion is in native/ (video.cpp:187-223)
- ``prefetch``          a double-buffering iterator that overlaps host
                        decode with device compute (replaces the reference's
                        blocking per-frame DQBUF wait)

All sources yield float32 [H, W] grey or [H, W, 3] images via
``get(camera, frame_id)`` returning None at end of stream.
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np


class FileSource:
    """Replay a directory of %08d.png / %08d.npy frames (video.h:24-38)."""

    def __init__(self, directory: str):
        self.dir = directory

    def init(self) -> bool:
        return os.path.isdir(self.dir)

    def get(self, camera: int, frame_id: int):
        base = os.path.join(self.dir, f"{frame_id:08d}")
        if os.path.exists(base + ".npy"):
            return np.load(base + ".npy")
        if os.path.exists(base + ".png"):
            from PIL import Image

            img = np.asarray(Image.open(base + ".png"))
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 255.0
            if img.ndim == 3:
                img = img @ np.array([0.299, 0.587, 0.114], np.float32)
            return img.astype(np.float32)
        return None


class VideoSource:
    """Video-file / live-camera source via cv2.VideoCapture — the
    ImageSourceMono analog (video.h:41-62). Like the reference's
    GetObservation (cam_.read, video.h:56-58), each call returns the
    stream's NEXT frame; camera/frame ids are ignored, so two VideoSources
    wrapped in a DuoSource replay two files as a fake stereo rig exactly
    like main.cpp:456-460.

    The reference configures width 640 and 10 fps (video.h:50-51); both
    are no-ops on file streams but kept for live-camera parity.
    """

    def __init__(self, path_or_cam, width: int = 640, fps: int = 10):
        self._arg = path_or_cam
        self._width = width
        self._fps = fps
        self._cap = None

    def init(self) -> bool:
        import cv2

        self._cap = cv2.VideoCapture(self._arg)
        if not self._cap.isOpened():
            print(f"Failed to open video file: {self._arg}")
            return False
        self._cap.set(cv2.CAP_PROP_FRAME_WIDTH, self._width)
        self._cap.set(cv2.CAP_PROP_FPS, self._fps)
        return True

    def get(self, camera: int, frame_id: int):
        if self._cap is None and not self.init():
            return None
        ok, img = self._cap.read()
        if not ok:
            return None
        if img.ndim == 3:  # cv2 gives BGR; grey with hessian.h:100 weights
            img = img @ np.array([0.114, 0.587, 0.299], np.float32)
        return img.astype(np.float32) / 255.0


class DuoSource:
    """Alternate two sources by camera index (video.h:65-86)."""

    def __init__(self, src0, src1):
        self.srcs = (src0, src1)

    def init(self) -> bool:
        return self.srcs[0].init() and self.srcs[1].init()

    def get(self, camera: int, frame_id: int):
        return self.srcs[camera].get(camera, frame_id)


class SyntheticSource:
    """Render frames from a landmark world along a trajectory.

    Emulates the reference's physical rig: two cameras separated by
    ``baseline`` along local x, frames alternating between them
    (main.cpp:474-507).
    """

    def __init__(self, cfg, n_frames: int = 60, seed: int = 0,
                 yaw_rate: float = 0.004, step_mm: float = 15.0,
                 n_points: int = 500):
        import jax.numpy as jnp

        from slam_robot_tpu.models import renderer
        from slam_robot_tpu.ops import quaternion as quat
        from slam_robot_tpu.utils import synthetic as syn

        self.cfg = cfg
        self.n_frames = n_frames
        self.world, self.bright = renderer.make_world(n_points, seed)
        self.k = jnp.asarray(syn.reference_intrinsics(cfg))
        qs, ts = [], []
        for i in range(n_frames):
            pair = i // 2
            yaw = yaw_rate * pair
            q = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
            center = jnp.array([0.0, 0.0, step_mm * pair])
            off = quat.rotate_inverse(
                q, jnp.array([cfg.baseline_mm * (i % 2), 0.0, 0.0])
            )
            qs.append(q)
            ts.append(center + off)
        self.true_quat = jnp.stack(qs)
        self.true_trans = jnp.stack(ts)
        self._renderer = renderer

    def init(self) -> bool:
        return True

    def get(self, camera: int, frame_id: int):
        if frame_id >= self.n_frames:
            return None
        img = self._renderer.render(
            self.true_quat[frame_id],
            self.true_trans[frame_id],
            self.k,
            self.world,
            self.bright,
            height=self.cfg.image_height,
            width=self.cfg.image_width,
        )
        return np.asarray(img)


class V4L2Source:
    """Live V4L2 capture through the native shim (video.cpp:255-340).

    Only functional on hosts with /dev/video*; everything else should use
    FileSource replay — which is also the reference's own test strategy.
    """

    def __init__(self, device: str = "/dev/video0", width: int = 640,
                 height: int = 480):
        self.device = device
        self.width = width
        self.height = height
        self._cap = None

    def init(self) -> bool:
        if not os.path.exists(self.device):
            return False
        try:
            from slam_robot_tpu.io import v4l2

            self._cap = v4l2.Capture(self.device, self.width, self.height)
            return self._cap.start()
        except Exception:
            return False

    def get(self, camera: int, frame_id: int):
        if self._cap is None:
            return None
        return self._cap.read()


def prefetch(source, cameras: int = 2, depth: int = 2):
    """Double-buffered frame iterator: a reader thread decodes ahead while
    the device computes (replaces the reference's fbuffer/DQBUF blocking).

    Yields (camera, frame_id, image); stops at end of stream.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)

    def reader():
        fid = 0
        cam = 0
        while True:
            cam ^= 1 if cameras == 2 else 0
            img = source.get(cam, fid)
            q.put((cam, fid, img))
            if img is None:
                return
            fid += 1

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    while True:
        cam, fid, img = q.get()
        if img is None:
            return
        yield cam, fid, img
