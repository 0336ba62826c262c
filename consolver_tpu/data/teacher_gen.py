"""Teacher-trajectory data generation.

TPU-native rebuild of gen_pretrain/generate_data.py (SD: 32 pipeline
replicas over 8 GPUs via a thread pool, 40-step multistep-DPM teacher) and
edit_ppo/edit_pretrain/generate.py (FLUX, 28 steps, fixed seed 42):
one jitted batched generator per chip — batch-parallelism replaces the
reference's replica thread pools — saving our .npz sample format
(noise / latent / prompt_ids [+ image]) consumed by data.group.TeacherDataset.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def generate_teacher_set(
    denoise_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    prompt_ids: np.ndarray,
    output_dir: str,
    noise_shape: Sequence[int],
    batch_size: int = 8,
    seed: int = 0,
    decode_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    save_sanity_images: int = 10,
) -> int:
    """For each prompt: sample init noise, run the teacher solver via
    ``denoise_fn(key, noise, prompt_ids_batch) -> final latents``, save
    ``{i}.npz`` with (noise, latent, prompt_ids).  NaN samples are dropped
    (generate_data.py:209).  Returns the number of samples written."""
    os.makedirs(output_dir, exist_ok=True)
    n = len(prompt_ids)
    written = 0
    base = jax.random.key(seed)
    for start in range(0, n, batch_size):
        ids = np.asarray(prompt_ids[start : start + batch_size])
        b = len(ids)
        key = jax.random.fold_in(base, start)
        knoise, kdenoise = jax.random.split(key)
        noise = jax.random.normal(knoise, (b, *noise_shape), jnp.float32)
        latents = np.asarray(denoise_fn(kdenoise, noise, jnp.asarray(ids)))
        images = (
            np.asarray(decode_fn(jnp.asarray(latents)))
            if decode_fn is not None and written < save_sanity_images
            else None
        )
        for j in range(b):
            if np.isnan(latents[j]).any():
                continue
            idx = start + j
            np.savez(
                os.path.join(output_dir, f"{idx:06d}.npz"),
                noise=np.asarray(noise[j]),
                latent=latents[j],
                prompt_ids=ids[j],
            )
            if images is not None and idx < save_sanity_images:
                from consolver_tpu.eval.gen_sweep import save_png

                save_png(os.path.join(output_dir, f"sanity_{idx:03d}.png"), images[j])
            written += 1
    return written
