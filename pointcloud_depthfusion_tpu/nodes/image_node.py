"""Image sink node: the visualization endpoint.

Equivalent of the reference image_node (OpenCV imshow viewer,
image_node/src/image_node.cpp:54-68). TPU hosts are headless, so the default
sink writes numbered PNGs to a directory; an interactive backend can be
plugged in by passing a custom ``display`` callable.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from pointcloud_depthfusion_tpu.io.artifacts import save_png


class ImageNode:
    def __init__(
        self,
        out_dir: Optional[str] = None,
        display: Optional[Callable[[np.ndarray, float], None]] = None,
        every_n: int = 1,
        max_saved: Optional[int] = None,
    ):
        self.out_dir = out_dir
        self.display = display
        self.every_n = every_n
        self.max_saved = max_saved
        self.received = 0
        self.saved = 0

    def __call__(self, image: np.ndarray, timestamp: float) -> None:
        self.received += 1
        if self.display is not None:
            self.display(image, timestamp)
        if self.out_dir is None or (self.received - 1) % self.every_n:
            return
        if self.max_saved is not None and self.saved >= self.max_saved:
            return
        path = os.path.join(self.out_dir, f"fused_{self.received - 1:06d}.png")
        save_png(path, image)
        self.saved += 1
