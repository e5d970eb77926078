"""Debug montages / flow-vector overlays (reference: vis_flow.py,
utils/flow_viz.py:136-223, utils/utils.py:25-32 arrowon)."""
from __future__ import annotations

from typing import Optional

import numpy as np

from mpiflow_tpu.viz.flow_viz import flow_to_color


def draw_flow_arrows(img: np.ndarray, flow: np.ndarray, step: int = 32,
                     color=(255, 0, 0)) -> np.ndarray:
    """Overlay flow vectors on an image every `step` px (utils/utils.py:25-32)."""
    out = np.ascontiguousarray(img).copy()
    h, w = flow.shape[:2]
    try:
        import cv2
        for i in range(step // 2, h, step):
            for j in range(step // 2, w, step):
                dst = (int(j + flow[i, j, 0]), int(i + flow[i, j, 1]))
                cv2.arrowedLine(out, (j, i), dst, color[::-1], 2, 8, 0, 0.2)
        return out
    except ImportError:
        # crude fallback: mark source points
        for i in range(step // 2, h, step):
            for j in range(step // 2, w, step):
                out[max(i - 1, 0):i + 2, max(j - 1, 0):j + 2] = color
        return out


def vis_flow_pair(src_u8: np.ndarray, dst_u8: np.ndarray, flow: np.ndarray,
                  n_lines: int = 30, seed: int = 0) -> np.ndarray:
    """Stack (src, dst) vertically and draw sampled flow correspondences
    across the pair (reference vis_flow.py:26-49). Returns [2H,W,3] u8."""
    h, w = flow.shape[:2]
    canvas = np.concatenate([src_u8, dst_u8], axis=0).copy()
    rng = np.random.RandomState(seed)
    try:
        import cv2
        for _ in range(n_lines):
            x = int(rng.randint(0, w))
            y = int(rng.randint(0, h))
            dx, dy = flow[y, x]
            color = tuple(int(c) for c in rng.randint(0, 255, 3))
            cv2.line(canvas, (x, y), (int(x + dx), int(y + dy) + h), color, 2)
    except ImportError:
        pass
    return canvas


def sample_montage(src_u8, dst_u8, flow, holes: Optional[np.ndarray] = None):
    """[src | dst | flow-color (| holes)] stacked vertically."""
    rows = [src_u8, dst_u8, flow_to_color(flow)]
    if holes is not None:
        rows.append(np.repeat((holes * 255).astype(np.uint8)[..., None], 3, -1))
    return np.concatenate(rows, axis=0)
