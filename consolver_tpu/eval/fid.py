"""Frechet Inception Distance, computed in-repo.

Replaces the reference's clean-fid dependency (fid_test.py:1-16).  The
Frechet distance and running statistics are computed here; the Inception
feature extractor is pluggable (``encode_fn``: images [B,H,W,3] in [0,1] ->
features [B,D]) so an in-repo backbone with converted weights — or any
other embedding — can back it.
"""

from __future__ import annotations

from typing import Callable, Iterable, Tuple

import numpy as np


def feature_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, covariance) of [N, D] features."""
    mu = features.mean(axis=0)
    cov = np.cov(features, rowvar=False)
    return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(cov1 @ cov2)
    if isinstance(covmean, tuple):  # older scipy returns (sqrtm, errest)
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * np.trace(covmean))


def compute_fid(
    encode_fn: Callable[[np.ndarray], np.ndarray],
    generated: Iterable[np.ndarray],
    reference: Iterable[np.ndarray],
) -> float:
    """FID between two streams of image batches ([B,H,W,3] in [0,1])."""
    gen_feats = np.concatenate([np.asarray(encode_fn(b)) for b in generated])
    ref_feats = np.concatenate([np.asarray(encode_fn(b)) for b in reference])
    mu1, c1 = feature_statistics(gen_feats)
    mu2, c2 = feature_statistics(ref_feats)
    return frechet_distance(mu1, c1, mu2, c2)
