"""North-star benchmark: 4-image 1080p panorama end-to-end (BASELINE.json:
"stitch the 4-image Input/ set at 1080p end-to-end in <50 ms on one TPU
chip"). The Input/ images are upsampled to 1080-class resolution
(1080x810, preserving 3:4 portrait aspect) so the content still registers.

Run alone — single-client TPU tunnel.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def upscale(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Simple bilinear numpy upscale (host-side input prep, not timed)."""
    src_h, src_w = img.shape[:2]
    ys = np.linspace(0, src_h - 1, h)
    xs = np.linspace(0, src_w - 1, w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, src_h - 1)
    x1 = np.minimum(x0 + 1, src_w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    img = img.astype(np.float32)
    out = (img[y0][:, x0] * (1 - fy) * (1 - fx)
           + img[y0][:, x1] * (1 - fy) * fx
           + img[y1][:, x0] * fy * (1 - fx)
           + img[y1][:, x1] * fy * fx)
    return np.clip(out, 0, 255).astype(np.uint8)


def main():
    from computervisionimagestich2_tpu.models.stitcher import Stitcher
    from computervisionimagestich2_tpu.utils.io import load_image

    images = [upscale(load_image(f"/root/reference/Input/{i}.bmp"), 1440, 1080)
              for i in range(1, 5)]
    st = Stitcher()
    out = st.stitch(images)

    times = []
    for _ in range(5):
        gc.collect()
        time.sleep(0.5)
        t0 = time.perf_counter()
        out = st.stitch(images)
        times.append((time.perf_counter() - t0) * 1000.0)

    print(json.dumps({
        "metric": "panorama_4img_1080p_e2e_ms",
        "value": round(min(times), 1),
        "unit": "ms",
        "canvas": list(out.shape[:2]),
        "runs": [round(t) for t in times],
    }))


if __name__ == "__main__":
    main()
