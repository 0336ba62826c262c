"""Generation sweep: batched image generation over the solver zoo.

TPU-native rebuild of gen_ppo.py:110-468 — the reference shards COCO
captions over 8 GPUs with a thread pool of pipeline replicas; here one chip
runs large jitted batches (and a multi-chip mesh shards the batch axis via
dist.mesh), with the reference's per-batch seed offsets (gen_ppo.py:258-260)
mapped to jax.random.fold_in.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def save_png(path: str, image01: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.asarray(image01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def generate_sweep(
    generate_batch: Callable[[jax.Array, Sequence[str]], np.ndarray],
    prompts: Sequence[str],
    output_dir: str,
    batch_size: int = 8,
    seed: int = 0,
) -> List[str]:
    """Run ``generate_batch(key, prompt_batch) -> images [B,H,W,3] in [0,1]``
    over all prompts, saving {idx}.png + {idx}.txt pairs (gen_ppo.py:319-330).
    Per-batch keys use fold_in(seed, batch_idx) — the jax.random analogue of
    ``seed + batch_idx`` torch generators."""
    os.makedirs(output_dir, exist_ok=True)
    written = []
    base = jax.random.key(seed)
    for batch_idx in range(0, (len(prompts) + batch_size - 1) // batch_size):
        chunk = list(prompts[batch_idx * batch_size : (batch_idx + 1) * batch_size])
        if not chunk:
            break
        pad = batch_size - len(chunk)
        padded = chunk + [chunk[-1]] * pad
        key = jax.random.fold_in(base, batch_idx)
        images = np.asarray(generate_batch(key, padded))[: len(chunk)]
        for j, (img, prompt) in enumerate(zip(images, chunk)):
            idx = batch_idx * batch_size + j
            png = os.path.join(output_dir, f"{idx:06d}.png")
            save_png(png, img)
            with open(os.path.join(output_dir, f"{idx:06d}.txt"), "w") as f:
                f.write(prompt)
            written.append(png)
    return written


def read_coco_captions(json_file: str, max_captions: Optional[int] = None) -> List[str]:
    """First caption per image from a COCO captions annotation file
    (gen_ppo.py:55-89)."""
    with open(json_file) as f:
        data = json.load(f)
    by_image = {}
    for ann in data["annotations"]:
        by_image.setdefault(ann["image_id"], ann["caption"])
    caps = [by_image[i] for i in sorted(by_image)]
    return caps[:max_captions] if max_captions else caps
