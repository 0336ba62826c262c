"""consolver-tpu: TPU-native JAX framework for diffusion previews with a
learnable consistency solver.

Re-designed from scratch with the capabilities of G-U-N/consolver
("Image Diffusion Preview with Consistency Solver", arXiv 2512.13592):
a learnable high-order linear-multistep ODE solver whose per-step combination
coefficients are emitted by a small policy network and trained with PPO so
that few-step previews maximally match full-step reference generations.

Package map (see SURVEY.md section 7):
  core/      - pure-math schedules + the scan-compatible learnable-LMM solver
  policy/    - FactorNet policy networks (action grids, sample/logprob/entropy)
  models/    - SD-1.5 UNet, VAE, CLIP text encoder; FLUX DiT + T5 (JAX impls)
  kernels/   - Pallas TPU kernels (flash attention, fused solver step)
  pipelines/ - jitted scan denoise loops (text-to-image, image editing)
  rl/        - PPO rollout/advantage/update/training loop
  rewards/   - consistency reward stack (PSNR, feature-cosine, depth, seg, ...)
  data/      - teacher-trajectory generation + datasets
  dist/      - device mesh + sharding rules (data-parallel training over ICI)
  eval/      - generation sweeps, consistency statistics, FID
  configs/   - typed configuration dataclasses
"""

__version__ = "0.1.0"
