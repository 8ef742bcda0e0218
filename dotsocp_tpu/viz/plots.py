"""Visualization & diagnostics (the reference's top-level ``utils/`` layer):
density evolution, movement quivers, residual curves, violation histograms,
mass-conservation reports — matplotlib equivalents of ``show_evolution_1d/2d``,
``show_movement_2d``, ``show_residualCurve``, ``hist_negative_density``,
``hist_violation_q_{1d,2d}``, ``check_massConservation_{1d,2d}``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def show_evolution_1d(rho, mode: str = "join", title: str = "Density evolution",
                      save: Optional[str] = None):
    """Line plots of rho(t, x) (``show_evolution_1d.m``): mode 'join'
    overlays all time slabs, 'tile' shows a panel grid."""
    plt = _mpl()
    rho = np.asarray(rho)
    nt, nx = rho.shape
    x = np.linspace(0, 1, nx)
    if mode == "join":
        fig, ax = plt.subplots(figsize=(7, 4))
        cmap = plt.get_cmap("viridis")
        for i in range(nt):
            ax.plot(x, rho[i], color=cmap(i / max(nt - 1, 1)), lw=1)
        ax.set_title(title)
    else:
        k = min(nt, 9)
        idx = np.linspace(0, nt - 1, k).astype(int)
        cols = 3
        rows = (k + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 2.2 * rows))
        for ax, i in zip(np.ravel(axes), idx):
            ax.plot(x, rho[i])
            ax.set_title(f"t = {i / (nt - 1):.2f}")
        fig.suptitle(title)
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=130)
        plt.close(fig)
    return fig


def show_evolution_2d(rho, mode: str = "imshow", title: str = "Density evolution",
                      barrier_mask=None, times: Sequence[float] = (0.0, 0.5, 1.0),
                      save: Optional[str] = None):
    """Frames of rho at selected times (``show_evolution_2d.m``): modes
    'imshow', 'contourf', 'contour', 'mesh'; optional barrier overlay."""
    plt = _mpl()
    rho = np.asarray(rho)
    nt = rho.shape[0]
    idx = [int(round(t * (nt - 1))) for t in times]
    fig, axes = plt.subplots(1, len(idx), figsize=(3.2 * len(idx), 3.2))
    if len(idx) == 1:
        axes = [axes]
    vmax = rho.max()
    for ax, i in zip(axes, idx):
        frame = rho[i]
        if mode == "imshow":
            ax.imshow(frame, origin="lower", cmap="turbo", vmin=0, vmax=vmax)
        elif mode == "contourf":
            ax.contourf(frame, levels=20, cmap="turbo")
        elif mode == "contour":
            ax.contour(frame, levels=12, cmap="turbo")
        elif mode == "mesh":
            ax.imshow(frame, origin="lower", cmap="turbo")
        if barrier_mask is not None:
            m = np.asarray(barrier_mask, float)
            ax.contour(m, levels=[0.5], colors="k", linewidths=1.0)
        ax.set_title(f"t = {i / (nt - 1):.2f}")
        ax.set_xticks([])
        ax.set_yticks([])
    fig.suptitle(title)
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=130)
        plt.close(fig)
    return fig


def show_evolution_3d(rho, axis: int = 0, title: str = "Density evolution (3D)",
                      times: Sequence[float] = (0.0, 0.25, 0.5, 0.75, 1.0),
                      slices: Sequence[float] = (0.25, 0.5, 0.75),
                      save: Optional[str] = None):
    """Grid of mid-volume slices of a 3D density over time: rows = slice
    position along ``axis`` of the (nz, ny, nx) volume, columns = time.
    A 3D-DOT capability the reference does not have (its viz layer is
    1D/2D only — top-level ``utils/show_evolution_2d.m``)."""
    plt = _mpl()
    rho = np.asarray(rho)
    nt = rho.shape[0]
    tidx = [int(round(t * (nt - 1))) for t in times]
    nslice = rho.shape[1 + axis]
    sidx = [int(round(s * (nslice - 1))) for s in slices]
    fig, axes = plt.subplots(
        len(sidx), len(tidx), figsize=(2.4 * len(tidx), 2.4 * len(sidx)),
        squeeze=False,
    )
    vmax = rho.max()
    for r, si in enumerate(sidx):
        for c, ti in enumerate(tidx):
            frame = np.take(rho[ti], si, axis=axis)
            ax = axes[r][c]
            ax.imshow(frame, origin="lower", cmap="turbo", vmin=0, vmax=vmax)
            if r == 0:
                ax.set_title(f"t = {ti / (nt - 1):.2f}")
            if c == 0:
                ax.set_ylabel(f"slice {si}/{nslice - 1}")
            ax.set_xticks([])
            ax.set_yticks([])
    fig.suptitle(title)
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=130)
        plt.close(fig)
    return fig


def show_movement_2d(rho, Ex, Ey, title: str = "Density movement",
                     barrier_mask=None, t: float = 0.5, stride: int = 4,
                     save: Optional[str] = None):
    """Quiver of momentum over density (``show_movement_2d.m``)."""
    plt = _mpl()
    rho = np.asarray(rho)
    Ex = np.asarray(Ex)
    Ey = np.asarray(Ey)
    nt = rho.shape[0]
    i = int(round(t * (nt - 1)))
    ie = min(i, Ex.shape[0] - 1)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(rho[i], origin="lower", cmap="Greys")
    ny, nx = rho.shape[1:]
    yy, xx = np.mgrid[0:ny:stride, 0:nx:stride]
    ax.quiver(xx, yy, Ex[ie, ::stride, ::stride], Ey[ie, ::stride, ::stride],
              color="tab:red", scale=None)
    if barrier_mask is not None:
        ax.contour(np.asarray(barrier_mask, float), levels=[0.5], colors="b")
    ax.set_title(f"{title} (t = {i / (nt - 1):.2f})")
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=130)
        plt.close(fig)
    return fig


def show_residual_curve(kkt, title: str = "KKT errors", names=None,
                        x=None, x_label: str = "iteration",
                        save: Optional[str] = None):
    """Semilogy KKT histories vs iteration or time (``show_residualCurve.m``)."""
    plt = _mpl()
    kkt = np.atleast_2d(np.asarray(kkt))
    if kkt.shape[0] == 1:
        kkt = kkt.T
    n = kkt.shape[1] if kkt.ndim > 1 else 1
    fig, ax = plt.subplots(figsize=(7, 4.5))
    xs = np.arange(kkt.shape[0]) if x is None else np.asarray(x)
    for j in range(n):
        label = names[j] if names and j < len(names) else f"kkt{j + 1}"
        ax.semilogy(xs, kkt[:, j], label=label, lw=1.2)
    ax.set_xlabel(x_label)
    ax.set_ylabel("relative residual")
    ax.set_title(title)
    ax.legend(fontsize=7)
    ax.grid(True, which="both", alpha=0.3)
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=130)
        plt.close(fig)
    return fig


def hist_negative_density(rho, title: str = "Density < 0",
                          save: Optional[str] = None):
    """Histogram of negative density values (``hist_negative_density.m``)."""
    plt = _mpl()
    vals = np.asarray(rho).ravel()
    neg = vals[vals < 0]
    fig, ax = plt.subplots(figsize=(5, 3.5))
    if neg.size:
        ax.hist(neg, bins=50)
    ax.set_title(f"{title} ({neg.size} values, min {vals.min():.2e})")
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=130)
        plt.close(fig)
    return fig


def violation_q(q0, bs):
    """f(q) = q0 + (1/2) sum of centered face-value squares — the dual-cone
    violation field (``hist_violation_q_2d.m:4``)."""
    q0 = np.asarray(q0)
    acc = np.zeros_like(q0)
    for b in bs:
        acc = acc + np.asarray(b) ** 2
    return q0 + 0.5 * acc


def hist_violation_q(q0, bs, title: str = "f(q) > 0",
                     save: Optional[str] = None):
    """Histogram of positive f(q) values (``hist_violation_q_{1d,2d}.m``)."""
    plt = _mpl()
    f = violation_q(q0, bs).ravel()
    pos = f[f > 0]
    fig, ax = plt.subplots(figsize=(5, 3.5))
    if pos.size:
        ax.hist(pos, bins=50)
    ax.set_title(f"{title} ({pos.size} values, max {f.max():.2e})")
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=130)
        plt.close(fig)
    return fig


def export_evolution_2d(rho, path_prefix: str, times=None, mode="imshow"):
    """Per-frame image export (``export_evolution_2d.m``)."""
    rho = np.asarray(rho)
    nt = rho.shape[0]
    if times is None:
        times = np.linspace(0, 1, min(nt, 9))
    paths = []
    for t in times:
        p = f"{path_prefix}_t{t:.2f}.png"
        show_evolution_2d(rho, mode=mode, times=(t,), save=p)
        paths.append(p)
    return paths
