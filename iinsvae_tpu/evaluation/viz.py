"""Visualization utilities: residual CDFs and latent-space scatter plots
(reference utils.py:60-123), decoupled from the eval loop.

The reference runs UMAP *inside* the per-batch test loop (test.py:89) —
an O(batch^2) CPU cost per batch. Here latents are collected once on device
and reduced once. UMAP is optional (not in the baked image); PCA is the
fallback reducer.
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from iinsvae_tpu.data.zenodo import label_dictionary  # noqa: E402


def cdf_curve(err_arr: np.ndarray, num: int = 200):
    """Histogram-accumulated CDF of |err| (reference utils.py:100-121).
    Returns (x, cdf) arrays of length num+1. Non-finite residuals (a
    diverged model) are dropped rather than crashing np.bincount with
    negative cast indices."""
    data = np.abs(np.asarray(err_arr)).reshape(-1)
    data = data[np.isfinite(data)]
    vmax = float(data.max()) if data.size else 1.0
    if vmax == 0.0:
        vmax = 1.0
    step = vmax / num
    idx = np.minimum((data / step).astype(np.int64), num)
    counts = np.bincount(idx, minlength=num + 1).astype(np.float64)
    cdf = np.cumsum(counts / counts.sum())
    x = np.linspace(0.0, vmax, num=num + 1)
    return x, cdf


def cdf_plot(err_arr: np.ndarray, num: int = 200, color: str = "brown", xlim: float = 0.6):
    x, cdf = cdf_curve(err_arr, num)
    plt.plot(x, cdf, color=color)
    plt.xlim((0.0, xlim))


def reduce_latents(latents: np.ndarray, method: str = "auto"):
    """(N, D) -> ((N, 2), method_used). UMAP when available and requested,
    else PCA. The second element names the reducer that actually ran
    ("umap" / "pca" / "identity") so artifacts can self-describe — the
    reference always claims UMAP (utils.py:60-71) even though the method
    is environment-dependent."""
    latents = np.asarray(latents).reshape(latents.shape[0], -1)
    if latents.shape[1] <= 2:
        return latents, "identity"
    if not np.isfinite(latents).all():
        # a diverged model produces NaN/inf latents; the eval must still
        # complete and report its (NaN) metrics instead of dying inside
        # the SVD ("SVD did not converge")
        return np.zeros((latents.shape[0], 2), latents.dtype), "degenerate"
    if method in ("auto", "umap"):
        try:
            import umap  # type: ignore

            return umap.UMAP().fit_transform(latents), "umap"
        except Exception:
            if method == "umap":
                raise
    # PCA fallback
    centered = latents - latents.mean(axis=0)
    try:
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
    except np.linalg.LinAlgError:
        return np.zeros((latents.shape[0], 2), latents.dtype), "degenerate"
    return centered @ vt[:2].T, "pca"


def visualize_latents(
    features2d: np.ndarray,
    labels: np.ndarray,
    save_path: str,
    epoch: int,
    dataset_env: str = "nlos",
    title: str | None = None,
    method: str | None = None,
):
    """Per-class scatter with deterministic class->color order (fixes the
    set-iteration nondeterminism, reference utils.py:88). ``method`` names
    the 2-D reducer that produced ``features2d`` and is recorded on the
    axes/title so the artifact self-describes."""
    labels = np.asarray(labels).reshape(-1).astype(int)
    label_names = label_dictionary(dataset_env)
    cmap = plt.get_cmap("tab10").colors
    fig, ax = plt.subplots()
    for cls in sorted(set(labels.tolist())):
        pts = features2d[labels == cls]
        ax.scatter(
            pts[:, 0], pts[:, 1], c=[cmap[cls % len(cmap)]],
            label=label_names.get(cls, str(cls)), s=2, alpha=0.5,
        )
    if method:
        ax.set_xlabel("%s dim 1" % method.upper())
        ax.set_ylabel("%s dim 2" % method.upper())
        title = (title + " (%s)" % method.upper()) if title else (
            "env latents (%s), epoch %d" % (method.upper(), epoch)
        )
    if title:
        ax.set_title(title)
    ax.legend()
    os.makedirs(save_path, exist_ok=True)
    out = os.path.join(save_path, "latent_env_epoch%d.png" % epoch)
    fig.savefig(out)
    plt.close(fig)
    return out


def visualize_recon(
    cir_gt: np.ndarray,
    cir_recon: np.ndarray,
    save_path: str,
    epoch: int,
    n: int = 4,
):
    """Side-by-side original vs reconstructed CIR waveforms — the
    ``visualize_recon`` the reference sketches but leaves commented out
    (train_semi.py:275-278)."""
    n = min(n, cir_gt.shape[0])
    fig, axes = plt.subplots(n, 1, figsize=(6, 2 * n), squeeze=False)
    for i in range(n):
        ax = axes[i][0]
        ax.plot(np.asarray(cir_gt[i]), color="tab:blue", label="original")
        ax.plot(np.asarray(cir_recon[i]), color="tab:orange", label="reconstruction")
        if i == 0:
            ax.legend()
    os.makedirs(save_path, exist_ok=True)
    out = os.path.join(save_path, "recon_epoch%d.png" % epoch)
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return out


def save_cdf_comparison(
    save_path: str,
    name: str,
    curves: list,
    legends: list,
    xlim: float = 0.6,
):
    """curves: [(err_array, color), ...] drawn on one figure."""
    fig = plt.figure()
    for err_arr, color in curves:
        x, cdf = cdf_curve(err_arr)
        plt.plot(x, cdf, color=color)
    plt.xlim((0.0, xlim))
    plt.legend(legends, loc="lower right")
    os.makedirs(save_path, exist_ok=True)
    out = os.path.join(save_path, name)
    fig.savefig(out)
    plt.close(fig)
    return out
