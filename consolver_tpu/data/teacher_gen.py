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
    uncond_ids: Optional[np.ndarray] = None,
) -> int:
    """For each prompt: sample init noise, run the teacher solver via
    ``denoise_fn(key, noise, prompt_ids_batch) -> final latents``, save
    ``{i}.npz`` with (noise, latent, prompt_ids).  NaN samples are dropped
    (generate_data.py:209).  Returns the number of samples written.

    ``uncond_ids`` is the tokenized-empty-prompt row ``[S]`` (or ``[1, S]``)
    for the CFG negative branch (denoise_ppo.py:39-48); when given it is
    stored in every sample so PPOTrainer conditions the negative branch on
    the same ids the teacher used."""
    os.makedirs(output_dir, exist_ok=True)
    if uncond_ids is not None:
        uncond_ids = np.asarray(uncond_ids).reshape(-1)
        width = np.asarray(prompt_ids).shape[-1]
        if uncond_ids.size != width:
            raise ValueError(
                f"uncond_ids must be one [S]={width} row (the tokenized "
                f"empty prompt), got {uncond_ids.size} values — pass "
                "uncond_input_ids(tokenizer, 1, max_length)"
            )
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
            sample = dict(
                noise=np.asarray(noise[j]), latent=latents[j], prompt_ids=ids[j]
            )
            if uncond_ids is not None:
                sample["uncond_ids"] = uncond_ids
            np.savez(os.path.join(output_dir, f"{idx:06d}.npz"), **sample)
            if images is not None and idx < save_sanity_images:
                from consolver_tpu.eval.gen_sweep import save_png

                save_png(os.path.join(output_dir, f"sanity_{idx:03d}.png"), images[j])
            written += 1
    return written


def generate_edit_teacher_set(
    denoise_fn: Callable[..., jax.Array],
    tokenize: Callable[[Sequence[str]], tuple],
    prepared_dir: str,
    output_dir: str,
    noise_shape: Sequence[int],
    batch_size: int = 1,
    seed: int = 42,
    decode_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    save_sanity_images: int = 10,
    max_samples: Optional[int] = None,
) -> int:
    """FLUX edit teacher generation (edit_pretrain/generate.py:34-144): for
    each prepared sample (``{i}.npz`` with ref_image [-1,1] + instruction,
    from data.edit_prep.prepare_edit_set), run the full-step teacher solver
    from a per-example deterministic noise (fixed seed 42, generate.py:80)
    and save the edit training sample the trainer consumes
    (rl/train_edit.train_step batch keys): noise / latent / ref_image /
    t5_ids / clip_ids (+ instruction for provenance).

    ``denoise_fn(key, noise, t5_ids, clip_ids, ref_image) -> final latents``
    (unpacked [B, h, w, C] — our canonical latent layout; the reference
    stores packed tokens).  ``tokenize(instructions) -> (t5_ids, clip_ids)``.
    NaN samples are dropped.  Returns the number of samples written.

    Determinism: the INIT NOISE is per-example (fold_in(seed, example_idx),
    independent of batch_size); the rollout key is per-BATCH, so with a
    stochastic teacher solver (sde variants) reproducibility additionally
    requires a fixed batch_size — the production teachers (euler /
    multistep-dpm, generate.py:118-122) consume no rollout randomness."""
    os.makedirs(output_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(prepared_dir) if f.endswith(".npz"))
    files = files[:max_samples]
    if not files:
        raise FileNotFoundError(f"No prepared .npz samples under {prepared_dir}")
    base = jax.random.key(seed)
    written = 0
    for start in range(0, len(files), batch_size):
        chunk = files[start : start + batch_size]
        refs, instructions = [], []
        for f in chunk:
            with np.load(os.path.join(prepared_dir, f)) as z:
                refs.append(np.asarray(z["ref_image"], np.float32))
                instructions.append(str(z["instruction"]))
        ref = jnp.asarray(np.stack(refs))
        t5_ids, clip_ids = tokenize(instructions)
        t5_ids = jnp.asarray(t5_ids)
        clip_ids = jnp.asarray(clip_ids)
        # per-example deterministic noise, independent of batching
        noise = jnp.concatenate([
            jax.random.normal(
                jax.random.fold_in(base, start + j), (1, *noise_shape), jnp.float32
            )
            for j in range(len(chunk))
        ])
        latents = np.asarray(
            denoise_fn(jax.random.fold_in(base, 10_000_000 + start), noise,
                       t5_ids, clip_ids, ref)
        )
        images = (
            np.asarray(decode_fn(jnp.asarray(latents)))
            if decode_fn is not None and written < save_sanity_images
            else None
        )
        for j in range(len(chunk)):
            if np.isnan(latents[j]).any():
                continue
            idx = start + j
            np.savez(
                os.path.join(output_dir, f"{idx:06d}.npz"),
                noise=np.asarray(noise[j]),
                latent=latents[j],
                ref_image=refs[j],
                t5_ids=np.asarray(t5_ids[j]),
                clip_ids=np.asarray(clip_ids[j]),
                instruction=np.asarray(instructions[j]),
            )
            if images is not None and idx < save_sanity_images:
                from consolver_tpu.eval.gen_sweep import save_png

                save_png(
                    os.path.join(output_dir, f"sanity_{idx:03d}.png"), images[j]
                )
            written += 1
    return written
