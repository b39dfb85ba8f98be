"""Image-grid saving (the torchvision.utils.save_image role in the
reference's snapshot code, custom/training_loop_aio.py:750-777)."""

from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray, lo: float = 0.0, hi: float = 1.0) -> np.ndarray:
    img = (np.asarray(img, np.float32) - lo) / (hi - lo)
    return (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """[N, H, W, C] → one [GH, GW, C] grid image."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.full((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c),
                   pad_value, dtype=images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y:y + h, x:x + w] = images[i]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8,
                    lo: float = 0.0, hi: float = 1.0) -> None:
    from PIL import Image
    grid = to_uint8(make_grid(images, nrow=nrow), 0, 255) \
        if images.dtype == np.uint8 else to_uint8(make_grid(images, nrow=nrow), lo, hi)
    mode = {1: 'L', 3: 'RGB', 4: 'RGBA'}[grid.shape[-1]]
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid, mode).save(path)
