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


def _score_batch(reward_fn, gen: np.ndarray, ref: np.ndarray, mesh) -> np.ndarray:
    """Run the batched reward, optionally sharding the batch over the mesh's
    data axis (multi-chip eval: batch-parallelism replaces the reference's
    one-worker-per-GPU process pool, compute_reward.py:98-181)."""
    if mesh is None:
        return np.asarray(reward_fn(gen, ref)).reshape(-1)
    from consolver_tpu.dist import mesh as meshlib

    n = gen.shape[0]
    pad = (-n) % meshlib.data_axis_size(mesh)
    if pad:
        gen = np.concatenate([gen, np.repeat(gen[-1:], pad, axis=0)])
        ref = np.concatenate([ref, np.repeat(ref[-1:], pad, axis=0)])
    gen_s, ref_s = meshlib.shard_batch(mesh, (gen, ref))
    return np.asarray(reward_fn(gen_s, ref_s)).reshape(-1)[:n]


def evaluate_consistency(
    reward_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    dir_generated: str,
    dir_reference: str,
    batch_size: int = 32,
    size: Optional[Tuple[int, int]] = None,
    output_json: Optional[str] = None,
    mesh=None,
) -> Dict[str, float]:
    """Compute reward stats over all paired images; returns/saves the same
    aggregate shape as the reference (compute_reward.py:332-365,447-463):
    mean/std/min/max/median + counts, plus per-item ``errors`` records
    [{path, reason}] (the reference pushes per-item error entries through
    the result queue, compute_reward.py:171-181).  Pass ``mesh`` to shard
    each reward batch over the data axis for multi-chip eval."""
    pairs = pair_images(dir_generated, dir_reference)
    if not pairs:
        raise FileNotFoundError(
            f"No paired images between {dir_generated} and {dir_reference}"
        )
    scores: List[float] = []
    error_records: List[Dict[str, str]] = []

    def record_error(path: str, exc: Exception):
        error_records.append(
            {"path": os.path.relpath(path, dir_generated), "reason": repr(exc)}
        )

    for start in range(0, len(pairs), batch_size):
        chunk = pairs[start : start + batch_size]
        loaded = []  # (gen_path, gen_img, ref_img)
        for a, b in chunk:
            try:
                loaded.append((a, _load_image(a, size), _load_image(b, size)))
            except Exception as e:
                record_error(a, e)
        if not loaded:
            continue
        try:
            gen = np.stack([g for _, g, _ in loaded])
            ref = np.stack([r for _, _, r in loaded])
            rewards = _score_batch(reward_fn, gen, ref, mesh)
            scores.extend(float(r) for r in rewards[: len(loaded)])
        except Exception:
            # mixed shapes or a model failure: fall back to per-item scoring
            # so one bad pair doesn't discard the chunk
            for a, g, r in loaded:
                try:
                    scores.append(
                        float(_score_batch(reward_fn, g[None], r[None], mesh)[0])
                    )
                except Exception as e:
                    record_error(a, e)
    arr = np.asarray(scores)
    stats = {
        "num_pairs": len(pairs),
        "num_scored": len(scores),
        "num_errors": len(error_records),
        "errors": error_records,
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
