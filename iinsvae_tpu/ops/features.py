"""Hand-crafted CIR features for the SVM baseline, fully vectorized.

The reference computes 6 features with pure-python per-sample loops
(reference data_tools.py:340-414) — the dominant cost of its baseline path.
Here everything is a single fused jnp program (jit-able, runs on TPU or
CPU backend alike); a numpy wrapper feeds sklearn.

Features, in the reference's column order [Er, T_EMD, T_RMS, Kur, R_T, M_AMP]:
  * M_AMP: max amplitude; max_pos its index (data_tools.py:344-350)
  * R_T:   rise time max(0, first(x > 0.6*M_AMP) - first(x > 6*(sigma+mu)))
           with missing crossings treated as index 0 (data_tools.py:353-366)
  * 35-tap window around the peak: start = clip(max_pos - 20, 0, L - 35)
           — exactly the reference's 3-branch clamping (data_tools.py:369-377)
  * Er:    sum of the window (the reference sums amplitudes, not squares —
           kept as-is, data_tools.py:382-383)
  * T_EMD: sum_i (i+1) * fhi_i with fhi = w^2 / Er (data_tools.py:388-393)
  * T_RMS: sum_i ((i+1) - (i+2) * fhi_i)^2 * fhi_i (data_tools.py:394)
  * Kur:   kurtosis sum((w - mu)^4) / (35 * sigma^2). The reference raises
           to power 1 (data_tools.py:407-408, a typo); intent (power 4) is
           implemented — SURVEY.md §2.4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

WINDOW = 35


def _first_crossing(x: jnp.ndarray, thresh: jnp.ndarray) -> jnp.ndarray:
    """Index of the first tap above thresh, or 0 if none (B,) int32."""
    above = x > thresh[:, None]
    any_above = jnp.any(above, axis=1)
    idx = jnp.argmax(above, axis=1)
    return jnp.where(any_above, idx, 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def feature_extraction(cir: jnp.ndarray) -> jnp.ndarray:
    """cir (B, L) -> features (B, 6)."""
    cir = jnp.asarray(cir)
    b, l = cir.shape

    m_amp = jnp.max(cir, axis=1)
    max_pos = jnp.argmax(cir, axis=1).astype(jnp.int32)

    mean_n = jnp.mean(cir, axis=1)
    sigma_n = jnp.std(cir, axis=1)
    rise_t1 = _first_crossing(cir, 6.0 * (sigma_n + mean_n))
    rise_t2 = _first_crossing(cir, 0.6 * m_amp)
    r_t = jnp.maximum(0, rise_t2 - rise_t1).astype(cir.dtype)

    start = jnp.clip(max_pos - 20, 0, l - WINDOW)
    gather_idx = start[:, None] + jnp.arange(WINDOW)[None, :]
    w = jnp.take_along_axis(cir, gather_idx, axis=1)  # (B, 35)

    er = jnp.sum(w, axis=1)
    fhi = (w**2) / er[:, None]
    i1 = jnp.arange(1, WINDOW + 1, dtype=cir.dtype)
    i2 = jnp.arange(2, WINDOW + 2, dtype=cir.dtype)
    t_emd = jnp.sum(i1[None, :] * fhi, axis=1)
    t_rms = jnp.sum((i1[None, :] - i2[None, :] * fhi) ** 2 * fhi, axis=1)

    mu = jnp.mean(w, axis=1)
    centered = w - mu[:, None]
    sigma2 = jnp.mean(centered**2, axis=1)
    kur = jnp.sum(centered**4, axis=1) / (WINDOW * sigma2**2)

    return jnp.stack([er, t_emd, t_rms, kur, r_t, m_amp], axis=1)


def feature_extraction_np(cir: np.ndarray) -> np.ndarray:
    """numpy wrapper for the sklearn/SVM path."""
    return np.asarray(feature_extraction(jnp.asarray(cir, dtype=jnp.float32)))
