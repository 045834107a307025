"""Viz-layer tests: reducer selection (UMAP via stub / PCA fallback /
identity) and the method-labeled latent scatter artifact
(reference utils.py:60-97)."""

import os
import sys
import types

import numpy as np
import pytest

from iinsvae_tpu.evaluation.viz import reduce_latents, visualize_latents


def test_reduce_latents_pca_fallback():
    # umap is not installed in this image -> the auto path must take PCA
    # and say so.
    rng = np.random.RandomState(0)
    lat = rng.randn(50, 8).astype(np.float32)
    coords, method = reduce_latents(lat)
    assert coords.shape == (50, 2)
    assert method == "pca"


def test_reduce_latents_identity_for_2d():
    lat = np.zeros((10, 2), dtype=np.float32)
    coords, method = reduce_latents(lat)
    assert coords.shape == (10, 2)
    assert method == "identity"


def test_reduce_latents_umap_branch_via_stub(monkeypatch):
    """Exercise the UMAP code path (evaluation/viz.py) with a stub module so
    it is not first-run-on-user code (the image has no umap)."""
    calls = {}

    class _StubUMAP:
        def fit_transform(self, x):
            calls["n"] = x.shape[0]
            return np.ones((x.shape[0], 2), dtype=np.float32)

    stub = types.ModuleType("umap")
    stub.UMAP = _StubUMAP
    monkeypatch.setitem(sys.modules, "umap", stub)

    lat = np.zeros((7, 16), dtype=np.float32)
    coords, method = reduce_latents(lat)
    assert method == "umap"
    assert calls["n"] == 7
    assert coords.shape == (7, 2)

    # method="pca" must bypass the stub even when umap is importable
    coords, method = reduce_latents(lat, method="pca")
    assert method == "pca"


def test_reduce_latents_umap_required_raises():
    # method="umap" with no umap installed must raise, not silently fall back
    sys.modules.pop("umap", None)
    with pytest.raises(Exception):
        reduce_latents(np.zeros((5, 4), dtype=np.float32), method="umap")


def test_visualize_latents_records_method(tmp_path):
    rng = np.random.RandomState(1)
    feats = rng.randn(30, 2).astype(np.float32)
    labels = rng.randint(0, 2, size=30)
    out = visualize_latents(
        feats, labels, str(tmp_path), epoch=3, dataset_env="nlos", method="pca"
    )
    assert os.path.exists(out)
    assert out.endswith("latent_env_epoch3.png")


def test_reduce_latents_nonfinite_degenerate():
    # a diverged model's NaN latents must not crash the eval (round-4
    # finding: np.linalg.svd raised "SVD did not converge" and killed the
    # CLI at the final evaluation)
    lat = np.full((10, 8), np.nan, dtype=np.float32)
    coords, method = reduce_latents(lat)
    assert method == "degenerate"
    assert coords.shape == (10, 2)
    assert np.isfinite(coords).all()
