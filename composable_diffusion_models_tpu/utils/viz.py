"""Host-side visualization (U7): image grids, scatters, loss curves, GIFs.

Parity targets: mnist/viz.py:8-64 (save_grid, save_gif, scatter2d[_labeled],
plot_loss), shapes/viz.py:13-19 (save_grid_ gray->RGB),
src/utils/visualization.py:14-102. Pure host code on fetched numpy arrays —
not TPU work; kept minimal and dependency-light (matplotlib only).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _to_numpy_grid(images: np.ndarray, nrow: int, pad: int = 2) -> np.ndarray:
    """(N, H, W, C) in [-1, 1] or [0, 1] -> one (GH, GW, 3) uint8 grid."""
    images = np.asarray(images, np.float32)
    if images.min() < -0.01:
        images = (images + 1.0) / 2.0
    images = np.clip(images, 0.0, 1.0)
    if images.shape[-1] == 1:
        images = np.repeat(images, 3, axis=-1)
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.ones((nrows * (h + pad) + pad, ncol * (w + pad) + pad, 3),
                   np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y:y + h, x:x + w] = images[i]
    return (grid * 255).astype(np.uint8)


def save_grid(images, path: str, nrow: int = 8, title: Optional[str] = None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    grid = _to_numpy_grid(np.asarray(images), nrow)
    fig, ax = plt.subplots(figsize=(grid.shape[1] / 50, grid.shape[0] / 50))
    ax.imshow(grid)
    ax.axis("off")
    if title:
        ax.set_title(title)
    fig.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)
    return path


def save_gif(frames: Sequence, path: str, nrow: int = 8, fps: int = 8):
    """Trajectory animation from a list of (N, H, W, C) snapshots."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    grids = [_to_numpy_grid(np.asarray(f), nrow) for f in frames]
    fig, ax = plt.subplots()
    ax.axis("off")
    im = ax.imshow(grids[0])

    def update(i):
        im.set_data(grids[i])
        return [im]

    ani = animation.FuncAnimation(fig, update, frames=len(grids))
    ani.save(path, writer="pillow", fps=fps)
    plt.close(fig)
    return path


def scatter2d(points, path: str, labels=None, title: Optional[str] = None,
              lim: float = 3.0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pts = np.asarray(points)
    fig, ax = plt.subplots(figsize=(5, 5))
    if labels is not None:
        labels = np.asarray(labels)
        for lab in np.unique(labels):
            sel = labels == lab
            ax.scatter(pts[sel, 0], pts[sel, 1], s=4, alpha=0.5, label=str(lab))
        ax.legend()
    else:
        ax.scatter(pts[:, 0], pts[:, 1], s=4, alpha=0.5)
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.grid(True)
    if title:
        ax.set_title(title)
    fig.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)
    return path


def plot_loss(losses, path: str, title: str = "training loss"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, ax = plt.subplots()
    ax.plot(np.asarray(losses))
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.set_yscale("log")
    ax.set_title(title)
    ax.grid(True)
    fig.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)
    return path
