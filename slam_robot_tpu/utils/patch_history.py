"""Per-point patch-history cache: the data source behind the reference's
mouse-hover inspector (matcher.cpp:68-74, 260-265, 388-393 — the last 30
13x13 patches per point id, shown by main.cpp:158-267).

The matcher exposes per-frame match arrays in its metrics (feat_point /
feat_px / feat_matched); this host-side ring extracts the matched patch
from each frame image (cv2.getRectSubPix, exactly the reference's call)
and keeps the newest ``depth`` per point id. ``strip`` renders a point's
history via utils/debug_draw.patch_strip.
"""

from __future__ import annotations

from collections import deque

import numpy as np


class PatchHistory:
    def __init__(self, size: int = 13, depth: int = 30):
        self.size = size
        self.depth = depth
        self.hist: dict[int, deque] = {}

    def update(self, img, point_ids, px, matched) -> int:
        """Record this frame's matched patches. img [H,W] f32; arrays are
        per feature-lane. Returns the number of patches recorded."""
        import cv2

        img = np.asarray(img, np.float32)
        ids = np.asarray(point_ids)
        pxs = np.asarray(px, np.float32)
        m = np.asarray(matched)
        n = 0
        for i in np.nonzero(m & (ids >= 0))[0]:
            patch = cv2.getRectSubPix(
                img, (self.size, self.size), (float(pxs[i, 0]), float(pxs[i, 1]))
            )
            dq = self.hist.setdefault(int(ids[i]), deque(maxlen=self.depth))
            dq.appendleft(patch)  # newest first (matcher.cpp:263 push_front)
            n += 1
        return n

    def patches(self, point_id: int) -> list[np.ndarray]:
        return list(self.hist.get(int(point_id), ()))

    def strip(self, point_id: int, scale: int = 8) -> np.ndarray | None:
        """Render a point's patch history as one [S*scale, N*S*scale] image
        (the inspector row, main.cpp:199-247)."""
        ps = self.patches(point_id)
        if not ps:
            return None
        s = self.size * scale
        out = np.zeros((s, s * len(ps)), np.float32)
        for i, p in enumerate(ps):
            big = np.repeat(np.repeat(p, scale, 0), scale, 1)
            out[:, i * s:(i + 1) * s] = big
        return out

    def top_ids(self, k: int = 8) -> list[int]:
        """Point ids with the longest histories (most-tracked first)."""
        return [
            pid for pid, _ in sorted(
                self.hist.items(), key=lambda kv: -len(kv[1])
            )[:k]
        ]
