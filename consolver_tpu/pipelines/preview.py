"""Diffusion Preview sessions: cheap learnable-solver previews, full-step
refinement on acceptance.

This is the product loop of the paper (readme.md:135-150): generate low-step
previews with the ConsistencySolver; only when the user accepts a preview,
re-run the SAME initial noise through a full-step teacher solver — the
learned solver is trained so the preview predicts the full-step result.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from consolver_tpu.models.vae import decode_latents
from consolver_tpu.pipelines.solver_zoo import make_baseline_denoise_fn
from consolver_tpu.pipelines.t2i import TextToImagePipeline


@dataclasses.dataclass
class Preview:
    """One preview candidate: decoded image + the noise that produced it."""

    image: jax.Array  # [H, W, 3] in [0, 1]
    noise: jax.Array  # [h, w, c] initial latent noise
    prompt_ids: jax.Array
    num_steps: int


class PreviewSession:
    """Preview -> accept -> refine workflow over a TextToImagePipeline whose
    solver is the trained ConsistencySolver."""

    def __init__(
        self,
        pipeline: TextToImagePipeline,
        preview_steps: int = 8,
        refine_steps: int = 40,
        refine_solver: str = "multistep-dpm",
        guidance_scale: float = 3.0,
    ):
        self.pipe = pipeline
        self.preview_steps = preview_steps
        self.refine_steps = refine_steps
        self.guidance_scale = guidance_scale
        self._refine = make_baseline_denoise_fn(
            lambda p, x, t, c: pipeline.unet.apply(p, x, t, c),
            pipeline.schedule, refine_solver, refine_steps, guidance_scale,
        )

    def preview(
        self,
        key: jax.Array,
        prompt_ids: jax.Array,
        latent_hw: tuple[int, int] = (64, 64),
        num_candidates: int = 4,
    ) -> Sequence[Preview]:
        """Generate ``num_candidates`` cheap previews for one prompt."""
        knoise, kdenoise = jax.random.split(key)
        h, w = latent_hw
        noise = jax.random.normal(knoise, (num_candidates, h, w, 4))
        ids = jnp.tile(prompt_ids.reshape(1, -1), (num_candidates, 1))
        images, _ = self.pipe(
            kdenoise, ids, noise, num_inference_steps=self.preview_steps,
            guidance_scale=self.guidance_scale,
        )
        return [
            Preview(images[i], noise[i], prompt_ids, self.preview_steps)
            for i in range(num_candidates)
        ]

    def refine(self, preview: Preview) -> jax.Array:
        """Full-step generation from the accepted preview's exact noise."""
        ids = preview.prompt_ids.reshape(1, -1)
        context, uncond = self.pipe._encode(
            self.pipe.text_params, ids, self.pipe.uncond_ids_for(ids)
        )
        latents = self._refine(
            self.pipe.unet_params, preview.noise[None], context, uncond
        )
        return decode_latents(self.pipe.vae, self.pipe.vae_params, latents)[0]
