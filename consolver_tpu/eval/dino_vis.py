"""DINO patch-feature PCA visualization (qualitative consistency check).

Rebuild of dino_vis.py:8-50: project ViT patch features to 3 principal
components and render them as an RGB heatmap.  Works with any in-repo ViT
(models/vit.py) instead of the torch-hub dinov2_vitl14.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def pca_rgb(patch_features: np.ndarray, grid_hw: tuple[int, int]) -> np.ndarray:
    """[N, D] patch features -> [h, w, 3] RGB in [0, 1] via PCA(3)."""
    feats = np.asarray(patch_features, np.float64)
    feats = feats - feats.mean(axis=0, keepdims=True)
    # PCA via SVD (the reference uses sklearn PCA(3); identical up to sign)
    _, _, vt = np.linalg.svd(feats, full_matrices=False)
    proj = feats @ vt[:3].T  # [N, 3]
    lo = proj.min(axis=0, keepdims=True)
    hi = proj.max(axis=0, keepdims=True)
    rgb = (proj - lo) / (hi - lo + 1e-8)
    h, w = grid_hw
    return rgb.reshape(h, w, 3).astype(np.float32)


def visualize(vit, params, image01: np.ndarray) -> np.ndarray:
    """image [H, W, 3] in [0,1] -> PCA RGB heatmap over the patch grid."""
    from consolver_tpu.models.vit import preprocess

    x = preprocess(jnp.asarray(image01)[None], vit.cfg.image_size)
    hidden = np.asarray(vit.apply(params, x))
    patches = hidden[0, 1:] if vit.cfg.class_embedding else hidden[0]
    side = int(np.sqrt(patches.shape[0]))
    return pca_rgb(patches, (side, side))
