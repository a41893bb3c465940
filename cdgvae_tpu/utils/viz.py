"""Visualisation helpers (reference modules/viz.py + the inline matplotlib
dumps in the entry points). All functions write PNGs and return the figure."""
from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def viz_recon_grid(xhat: np.ndarray, path: str, n: int = 9):
    """3x3 grid of reconstructions in [0,1] (reference main.py:213-220).
    Draws min(n, len(xhat)) panels — small smoke batches must not crash
    the epoch-0 viz."""
    plt = _plt()
    n = min(n, len(xhat))
    fig = plt.figure(figsize=(4, 4))
    for i in range(n):
        plt.subplot(3, 3, i + 1)
        plt.imshow(np.clip((np.asarray(xhat[i]) + 1) / 2, 0, 1))
        plt.axis("off")
    plt.savefig(path)
    plt.close(fig)
    return fig


def viz_do_grid(images: np.ndarray, path: str, row_names=None):
    """[node, n_values, H, W, 3] do-intervention sweep grid
    (reference inference.py:298-334)."""
    plt = _plt()
    node, k = images.shape[:2]
    # squeeze=False: ax is always 2-D, also for 1-row/1-column grids.
    # ~1.3in per cell: constant-per-cell sizing keeps large grids (e.g.
    # celeba 6x7 at 128px) readable instead of shrinking rows
    fig, ax = plt.subplots(node, k, figsize=(k * 1.3, node * 1.3 + 0.3),
                           squeeze=False)
    for i in range(node):
        for j in range(k):
            a = ax[i, j]
            a.imshow(np.clip((np.asarray(images[i, j]) + 1) / 2, 0, 1))
            a.axis("off")
        if row_names is not None:
            # axis('off') suppresses ylabel artists — draw the row name as
            # text in axes coordinates instead
            ax[i, 0].text(-0.08, 0.5, str(row_names[i]), rotation=90,
                          va="center", ha="right",
                          transform=ax[i, 0].transAxes, fontsize=8)
    plt.tight_layout()
    plt.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return fig


def viz_heatmap(arr: np.ndarray, path: str | None = None, size=(7, 7)):
    """pcolor heatmap (reference modules/viz.py:viz_heatmap)."""
    plt = _plt()
    fig = plt.figure(figsize=size)
    plt.pcolor(np.asarray(arr), cmap="coolwarm")
    plt.colorbar()
    if path:
        plt.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return fig


def viz_graph(B: np.ndarray, names, path: str | None = None):
    """networkx DAG drawing (reference modules/viz.py:viz_graph)."""
    import networkx as nx
    plt = _plt()
    fig = plt.figure(figsize=(5, 5))
    g = nx.DiGraph()
    n = B.shape[0]
    g.add_nodes_from(names[:n])
    for i in range(n):
        for j in range(n):
            if abs(B[i, j]) > 0:
                g.add_edge(names[i], names[j])
    nx.draw_networkx(g, pos=nx.circular_layout(g), node_color="lightblue",
                     node_size=1200)
    if path:
        plt.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return fig


def viz_bars(vals, names, ylabel: str, path: str, ylim=None):
    """Per-node diagnostic bar chart (reference inference.py:193-248:
    latent ranges, posterior variance, alignment cross-entropy)."""
    plt = _plt()
    fig = plt.figure(figsize=(5, 3))
    plt.bar(np.arange(len(vals)), np.asarray(vals), width=0.2)
    plt.xticks(np.arange(len(vals)), names)
    plt.ylabel(ylabel, fontsize=12)
    if ylim:
        plt.ylim(*ylim)
    plt.tight_layout()
    plt.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return fig


def viz_pair(x: np.ndarray, xhat: np.ndarray, path: str):
    """Original/reconstruction side-by-side (reference inference.py:252-262),
    images in [-1, 1]."""
    plt = _plt()
    fig, ax = plt.subplots(1, 2, figsize=(4, 4))
    ax[0].imshow(np.clip((x + 1) / 2, 0, 1))
    ax[0].axis("off")
    ax[0].set_title("original")
    ax[1].imshow(np.clip((xhat + 1) / 2, 0, 1))
    ax[1].axis("off")
    ax[1].set_title("recon")
    plt.tight_layout()
    plt.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return fig


def viz_gam_blocks(blocks: np.ndarray, path: str):
    """Per-block GAM decoder outputs [K, H, W, 3] in [-1, 1]
    (reference inference.py:285-296)."""
    plt = _plt()
    k = blocks.shape[0]
    fig, ax = plt.subplots(1, k, figsize=(7, 4))
    for i in range(k):
        ax[i].imshow(np.clip((blocks[i] + 1) / 2, 0, 1))
        ax[i].axis("off")
    plt.tight_layout()
    plt.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return fig
