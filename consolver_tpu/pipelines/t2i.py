"""Text-to-image denoise pipeline: one jitted ``lax.scan`` over solver steps.

TPU-native redesign of the reference's rollout recorder ``denoise_diffusion``
(/root/reference/denoise_ppo.py:6-120) and the diffusers pipeline denoise loop
(gen_pretrain/pipeline.py:1048-1098): the whole loop — CFG-batched UNet
forward, FactorNet sampling, learnable-LMM combine, DDIM update — compiles to
a single XLA program per step count, with the RL trajectory (conds, actions,
probs, masks) recorded functionally as scan outputs.

The plain-DDIM baseline is the degenerate solver ``order_dim=1, scaler_dim=0``
(combine is a passthrough), so one code path serves both.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from consolver_tpu.core import schedules, solver
from consolver_tpu.policy.factor_net import FactorNet


@dataclasses.dataclass(frozen=True)
class Trajectory:
    """Stacked per-step PPO records, shaped [B, steps-1, ...] to match the
    reference's `if i > 0` recording (denoise_ppo.py:105-120).

    ``valid`` marks real (non-pad) rows of a padded rollout
    (make_padded_denoise_fn); None means every row is real."""

    conds_x: jax.Array  # [B, S-1, 2]
    actions: jax.Array  # [B, S-1, A]
    probs: jax.Array  # [B, S-1, A]
    masks: jax.Array  # [B, S-1, A]
    conds_eps: Optional[jax.Array] = None  # [B, S-1, order_dim, ...] if use_conv
    valid: Optional[jax.Array] = None  # [B, S-1]


jax.tree_util.register_dataclass(
    Trajectory,
    data_fields=["conds_x", "actions", "probs", "masks", "conds_eps", "valid"],
    meta_fields=[],
)


def make_denoise_fn(
    unet_apply: Callable[..., jax.Array],
    schedule: schedules.DiffusionSchedule,
    factor_net: Optional[FactorNet],
    num_inference_steps: int,
    guidance_scale: float = 3.0,
    timestep_spacing: str = "trailing",
    steps_offset: int = 1,
    record_trajectory: bool = True,
    deterministic_policy: bool = False,
) -> Callable[..., Tuple[jax.Array, Optional[Trajectory]]]:
    """Build the jitted denoise function.

    unet_apply: (unet_params, latents_nhwc, timesteps, context) -> epsilon.
    Returned fn: (unet_params, factor_params, key, noise, context,
    uncond_context) -> (final latents, Trajectory or None).

    CFG runs as one 2B-batched UNet call (denoise_ppo.py:66,89-100); with
    guidance_scale <= 1 the uncond branch is skipped entirely.

    ``deterministic_policy=True`` takes the mode action each step
    (FactorNet.mode_action) instead of sampling — serving-mode knob making
    a row's output independent of its batch slot; training must sample.
    """
    if factor_net is None:
        # Degenerate DDIM solver: passthrough combine, no sampled actions.
        order_dim, scaler_dim, action_dims = 1, 0, 1
    else:
        order_dim = factor_net.config.order_dim
        scaler_dim = factor_net.config.scaler_dim
        action_dims = factor_net.config.action_dims

    ts = schedules.spaced_timesteps(
        schedule.num_train_timesteps, num_inference_steps, timestep_spacing, steps_offset
    )
    prev_ts = ts - schedule.num_train_timesteps // num_inference_steps
    ts_arr = jnp.asarray(ts, jnp.int32)
    prev_arr = jnp.asarray(prev_ts, jnp.int32)
    alphas = jnp.asarray(schedule.alphas_cumprod)
    do_cfg = guidance_scale > 1.0
    use_conv = factor_net is not None and factor_net.config.use_conv

    @jax.jit
    def denoise(unet_params, factor_params, key, noise, context, uncond_context):
        batch = noise.shape[0]
        sample_shape = noise.shape[1:]
        state = solver.init_state(batch, order_dim, sample_shape)
        if do_cfg:
            full_context = jnp.concatenate([uncond_context, context], axis=0)
        else:
            full_context = context

        def body(carry, xs):
            st, latents, k = carry
            t, t_prev = xs
            if do_cfg:
                latent_in = jnp.concatenate([latents, latents], axis=0)
                t_in = jnp.broadcast_to(t, (2 * batch,))
                eps_all = unet_apply(unet_params, latent_in, t_in, full_context)
                eps_uncond, eps_text = jnp.split(eps_all, 2, axis=0)
                eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
            else:
                eps = unet_apply(
                    unet_params, latents, jnp.broadcast_to(t, (batch,)), full_context
                )
            eps = eps.astype(jnp.float32)

            conds_x = jnp.tile(
                jnp.stack([t, t_prev]).astype(jnp.float32)[None], (batch, 1)
            )
            # History must be pushed before the policy sees it (the reference
            # samples from conds built AFTER the ets append,
            # scheduler_ppo.py:214-240).
            st = solver.push(st, eps)
            if factor_net is not None:
                k, sub = jax.random.split(k)
                conds = {"x": conds_x, "epsilon": st.ets}
                if deterministic_policy:
                    actions, probs = factor_net.mode_action(factor_params, conds)
                else:
                    actions, probs = factor_net.sample_action(
                        factor_params, sub, conds
                    )
            else:
                actions = jnp.zeros((batch, action_dims), jnp.float32)
                probs = jnp.ones((batch, action_dims), jnp.float32)

            order_actions, scale_actions, _ = solver.split_actions(
                actions, order_dim, scaler_dim
            )
            coeffs = solver.normalized_coefficients(
                order_actions.astype(jnp.float32), st.num_ets, order_dim
            )
            effective = solver.combine(st, coeffs)
            effective, scaled_sample = solver.apply_scalers(
                effective, latents.astype(jnp.float32), scale_actions.astype(jnp.float32)
            )
            masks = solver.warmup_masks(st.num_ets, order_dim, action_dims, batch)

            a_t, a_prev = solver.gather_alpha_prods(
                alphas, t, t_prev, schedule.final_alpha_cumprod
            )
            latents = solver.ddim_update(
                scaled_sample, effective, a_t, a_prev, schedule.prediction_type
            )
            record = (conds_x, actions, probs, masks) + (
                (st.ets,) if use_conv else ()
            )
            return (st, latents, k), record

        (_, latents, _), records = jax.lax.scan(
            body, (state, jnp.asarray(noise, jnp.float32), key), (ts_arr, prev_arr)
        )

        if not record_trajectory:
            return latents, None

        # scan stacks the step axis first: [S, B, ...] -> [B, S-1, ...],
        # dropping step 0 (denoise_ppo.py:105).
        def to_traj(x):
            return jnp.swapaxes(x[1:], 0, 1)

        conds_eps = to_traj(records[4]) if use_conv else None
        traj = Trajectory(
            conds_x=to_traj(records[0]),
            actions=to_traj(records[1]),
            probs=to_traj(records[2]),
            masks=to_traj(records[3]),
            conds_eps=conds_eps,
        )
        return latents, traj

    return denoise


def padded_ladder(
    schedule: schedules.DiffusionSchedule,
    num_inference_steps: int,
    max_steps: int,
    timestep_spacing: str = "trailing",
    steps_offset: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Host-side ladder for :func:`make_padded_denoise_fn`: the true
    ``num_inference_steps`` ladder front-loaded into [max_steps] arrays with
    a validity mask (pad steps repeat the last entry and are masked out)."""
    assert 1 <= num_inference_steps <= max_steps
    ts = schedules.spaced_timesteps(
        schedule.num_train_timesteps, num_inference_steps, timestep_spacing,
        steps_offset,
    )
    prev_ts = ts - schedule.num_train_timesteps // num_inference_steps
    pad = max_steps - num_inference_steps
    ts_p = np.concatenate([ts, np.repeat(ts[-1:], pad)])
    prev_p = np.concatenate([prev_ts, np.repeat(prev_ts[-1:], pad)])
    valid = np.concatenate([np.ones(num_inference_steps), np.zeros(pad)])
    return (
        jnp.asarray(ts_p, jnp.int32),
        jnp.asarray(prev_p, jnp.int32),
        jnp.asarray(valid, jnp.float32),
    )


def make_padded_denoise_fn(
    unet_apply: Callable[..., jax.Array],
    schedule: schedules.DiffusionSchedule,
    factor_net: Optional[FactorNet],
    max_steps: int,
    guidance_scale: float = 3.0,
    record_trajectory: bool = True,
    deterministic_policy: bool = False,
) -> Callable[..., Tuple[jax.Array, Optional[Trajectory]]]:
    """Pad-to-max variant of :func:`make_denoise_fn` (SURVEY §7 "Hard parts"
    bullet 1): ONE compiled program serves every inference-step count in
    [1, max_steps].  The (t, t_prev, valid) ladder is scan DATA
    (:func:`padded_ladder`), not a compile-time constant — pad steps run the
    UNet but their state/latent updates are masked to passthrough and their
    trajectory masks are zeroed, so the PPO advantage ignores them
    (flatten_trajectory multiplies adv by masks).

    Trade-off vs per-count programs, measured on the real chip by
    scripts/probe_padded.py: one compile instead of 14
    (train_ppo.py:345 randomizes steps in [2,16)), but every rollout pays
    max_steps UNet forwards.  The trajectory carries the valid-row flags so
    the PPO loss excludes pad rows from BOTH the surrogate and the entropy
    means (ppo.ppo_loss weighted means) — the padded program is
    semantically identical to the per-count one on valid steps.

    Returned fn: (unet_params, factor_params, key, noise, context,
    uncond_context, ts[M], prev_ts[M], valid[M]) -> (latents, Trajectory).
    """
    if factor_net is None:
        order_dim, scaler_dim, action_dims = 1, 0, 1
    else:
        order_dim = factor_net.config.order_dim
        scaler_dim = factor_net.config.scaler_dim
        action_dims = factor_net.config.action_dims

    alphas = jnp.asarray(schedule.alphas_cumprod)
    do_cfg = guidance_scale > 1.0
    use_conv = factor_net is not None and factor_net.config.use_conv

    @jax.jit
    def denoise(unet_params, factor_params, key, noise, context, uncond_context,
                ts, prev_ts, valid):
        batch = noise.shape[0]
        state = solver.init_state(batch, order_dim, noise.shape[1:])
        if do_cfg:
            full_context = jnp.concatenate([uncond_context, context], axis=0)
        else:
            full_context = context

        def body(carry, xs):
            st0, latents0, k = carry
            t, t_prev, v = xs
            if do_cfg:
                latent_in = jnp.concatenate([latents0, latents0], axis=0)
                t_in = jnp.broadcast_to(t, (2 * batch,))
                eps_all = unet_apply(unet_params, latent_in, t_in, full_context)
                eps_uncond, eps_text = jnp.split(eps_all, 2, axis=0)
                eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
            else:
                eps = unet_apply(
                    unet_params, latents0, jnp.broadcast_to(t, (batch,)), full_context
                )
            eps = eps.astype(jnp.float32)

            conds_x = jnp.tile(
                jnp.stack([t, t_prev]).astype(jnp.float32)[None], (batch, 1)
            )
            st = solver.push(st0, eps)
            if factor_net is not None:
                k, sub = jax.random.split(k)
                conds = {"x": conds_x, "epsilon": st.ets}
                if deterministic_policy:
                    actions, probs = factor_net.mode_action(factor_params, conds)
                else:
                    actions, probs = factor_net.sample_action(
                        factor_params, sub, conds
                    )
            else:
                actions = jnp.zeros((batch, action_dims), jnp.float32)
                probs = jnp.ones((batch, action_dims), jnp.float32)

            order_actions, scale_actions, _ = solver.split_actions(
                actions, order_dim, scaler_dim
            )
            coeffs = solver.normalized_coefficients(
                order_actions.astype(jnp.float32), st.num_ets, order_dim
            )
            effective = solver.combine(st, coeffs)
            effective, scaled_sample = solver.apply_scalers(
                effective, latents0.astype(jnp.float32),
                scale_actions.astype(jnp.float32),
            )
            masks = solver.warmup_masks(st.num_ets, order_dim, action_dims, batch)
            masks = masks * v  # pad steps contribute no advantage

            a_t, a_prev = solver.gather_alpha_prods(
                alphas, t, t_prev, schedule.final_alpha_cumprod
            )
            latents = solver.ddim_update(
                scaled_sample, effective, a_t, a_prev, schedule.prediction_type
            )
            # passthrough on pad steps: latent and solver history unchanged
            latents = jnp.where(v > 0, latents, latents0)
            st = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(v > 0, (1,) * new.ndim), new, old
                ),
                st, st0,
            )
            valid_row = jnp.broadcast_to(v, (batch,))
            record = (conds_x, actions, probs, masks, valid_row) + (
                (st.ets,) if use_conv else ()
            )
            return (st, latents, k), record

        (_, latents, _), records = jax.lax.scan(
            body, (state, jnp.asarray(noise, jnp.float32), key),
            (ts, prev_ts, valid),
        )
        if not record_trajectory:
            return latents, None

        def to_traj(x):
            return jnp.swapaxes(x[1:], 0, 1)

        traj = Trajectory(
            conds_x=to_traj(records[0]),
            actions=to_traj(records[1]),
            probs=to_traj(records[2]),
            masks=to_traj(records[3]),
            conds_eps=to_traj(records[5]) if use_conv else None,
            valid=to_traj(records[4]),
        )
        return latents, traj

    return denoise


def encode_prompt_fn(text_encoder_apply: Callable[..., jax.Array]):
    """Build a jitted (params, prompt_ids, uncond_ids) -> (context,
    uncond_context) embedder (denoise_ppo.py:25-50)."""

    @jax.jit
    def encode(te_params, prompt_ids, uncond_ids):
        return (
            text_encoder_apply(te_params, prompt_ids),
            text_encoder_apply(te_params, uncond_ids),
        )

    return encode


class TextToImagePipeline:
    """Convenience bundle mirroring the diffusers pipeline surface: holds
    models + params, builds/caches jitted denoise fns per (steps, cfg)."""

    def __init__(
        self,
        unet,
        unet_params,
        text_encoder,
        text_params,
        vae,
        vae_params,
        schedule: schedules.DiffusionSchedule,
        factor_net: Optional[FactorNet] = None,
        factor_params: Optional[Any] = None,
        timestep_spacing: str = "trailing",
        steps_offset: int = 1,
        tokenizer=None,
    ):
        self.unet = unet
        self.unet_params = unet_params
        self.text_encoder = text_encoder
        self.text_params = text_params
        self.vae = vae
        self.vae_params = vae_params
        self.schedule = schedule
        self.factor_net = factor_net
        self.factor_params = factor_params
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        self.tokenizer = tokenizer
        self._denoise_cache = {}
        self._decode_cache = {}
        self._encode = encode_prompt_fn(
            lambda p, ids: self.text_encoder.apply(p, ids)
        )

    def decode_latents(self, latents, chunk=None):
        """Jitted scaled-latents -> [0,1] images (models/vae.decode_latents
        in ONE compiled program).  The jit matters beyond fusion: serving
        calls this outside any enclosing jit, and an eager decode dispatches
        every decoder op as its own device RPC — measured ~3 s/batch of
        tunnel round-trips at SD-1.5 512^2 batch 8 vs ~0.2 s compiled."""
        if chunk not in self._decode_cache:
            from consolver_tpu.models.vae import decode_latents as _decode

            self._decode_cache[chunk] = jax.jit(
                lambda vp, lat: _decode(self.vae, vp, lat, chunk=chunk)
            )
        return self._decode_cache[chunk](self.vae_params, latents)

    def _unet_apply(self, params, latents, t, context):
        return self.unet.apply(params, latents, t, context)

    def uncond_ids_for(self, prompt_ids) -> jax.Array:
        """Empty-prompt negative ids for CFG (denoise_ppo.py:39-48): the
        reference tokenizes ``[""]`` with padding="max_length" — NOT all-zero
        ids (id 0 is a real CLIP vocab token).  Uses the attached tokenizer;
        in tokenizer-less smoke mode falls back to the HashTokenizer's
        empty-prompt encoding ([BOS, EOS, pad...])."""
        from consolver_tpu.data.tokenizer import HashTokenizer, uncond_input_ids

        max_len = int(prompt_ids.shape[1])
        tok = self.tokenizer or HashTokenizer(max_length=max_len)
        return jnp.asarray(uncond_input_ids(
            tok, int(prompt_ids.shape[0]), max_len,
            vocab_size=self.text_encoder.cfg.vocab_size,
        ))

    def quantize(self, skip_levels: Tuple[int, ...] = (0,)) -> "TextToImagePipeline":
        """Return a W8A8 int8 serving copy of this pipeline: UNet projections
        and VAE decoder run on the int8 MXU path (kernels/quant.py), text
        encoder and solver untouched.  The float checkpoint converts
        mechanically; quality-gate with rewards (the bench gates on preview
        PSNR vs the float path).

        ``skip_levels`` defaults to the measured-fastest HYBRID: UNet level
        0 stays bf16.  Isolated, a lane-padded int8 conv beats bf16 even at
        the 64^2x320 shape (scripts/probe_int8_l0.py), but at the MODEL
        level bf16 level-0 convs also fuse with the following GroupNorm
        statistics, which int8's dequant breaks — measured on chip: hybrid
        8.31 vs padded-uniform int8 8.25 vs bf16 7.27 img/s/chip,
        identical quality.  Pass () for uniform int8."""
        import dataclasses as _dc

        from consolver_tpu.kernels.quant import quantize_params_like
        from consolver_tpu.models.unet_2d import UNet2DCondition
        from consolver_tpu.models.vae import AutoencoderKL

        qucfg = _dc.replace(
            self.unet.cfg, quant_int8=True,
            quant_skip_levels=tuple(skip_levels),
        )
        qunet = UNet2DCondition(qucfg, dtype=self.unet.dtype)
        ch = self.unet.cfg.in_channels
        cross = self.unet.cfg.cross_attention_dim
        ushapes = jax.eval_shape(
            qunet.init, jax.random.key(0), jnp.zeros((1, 8, 8, ch)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 4, cross)),
        )
        qvcfg = _dc.replace(self.vae.cfg, quant_int8=True)
        qvae = AutoencoderKL(qvcfg, dtype=self.vae.dtype)
        vshapes = jax.eval_shape(
            qvae.init, jax.random.key(0),
            jnp.zeros((1, 16, 16, self.vae.cfg.in_channels)), jax.random.key(1),
        )
        return TextToImagePipeline(
            qunet, quantize_params_like(ushapes, self.unet_params),
            self.text_encoder, self.text_params,
            qvae, quantize_params_like(vshapes, self.vae_params),
            self.schedule, factor_net=self.factor_net,
            factor_params=self.factor_params,
            timestep_spacing=self.timestep_spacing,
            steps_offset=self.steps_offset,
            tokenizer=self.tokenizer,
        )

    def denoise_fn(
        self,
        num_inference_steps: int,
        guidance_scale: float,
        record: bool = True,
        solver: str = "consistencysolver",
        deterministic_policy: bool = False,
    ):
        """``solver='consistencysolver'`` uses the learnable LMM (or plain
        DDIM when no factor net is attached); any other name selects a
        baseline zoo solver (pipelines/solver_zoo.SOLVERS).
        ``deterministic_policy`` = mode actions (serving; see
        make_denoise_fn)."""
        if solver != "consistencysolver":
            deterministic_policy = False  # no policy: don't fork programs
        key = (num_inference_steps, float(guidance_scale), record, solver,
               deterministic_policy)
        if key not in self._denoise_cache:
            if solver == "consistencysolver":
                self._denoise_cache[key] = make_denoise_fn(
                    self._unet_apply,
                    self.schedule,
                    self.factor_net,
                    num_inference_steps,
                    guidance_scale,
                    self.timestep_spacing,
                    self.steps_offset,
                    record_trajectory=record,
                    deterministic_policy=deterministic_policy,
                )
            else:
                from consolver_tpu.pipelines.solver_zoo import (
                    make_baseline_denoise_fn,
                )

                base = make_baseline_denoise_fn(
                    self._unet_apply, self.schedule, solver,
                    num_inference_steps, guidance_scale,
                )
                if solver.startswith("sde-"):
                    # stochastic variants thread the rollout key through to
                    # the per-step variance noise
                    self._denoise_cache[key] = (
                        lambda up, fp, k, noise, ctx, unc: (
                            base(up, k, noise, ctx, unc), None)
                    )
                else:
                    self._denoise_cache[key] = (
                        lambda up, fp, k, noise, ctx, unc: (
                            base(up, noise, ctx, unc), None)
                    )
        return self._denoise_cache[key]

    def padded_denoise_fn(
        self,
        max_steps: int,
        guidance_scale: float,
        record: bool = True,
        deterministic_policy: bool = False,
    ):
        """One compiled rollout for every step count in [1, max_steps]
        (make_padded_denoise_fn); call with a :func:`padded_ladder`."""
        key = ("padded", max_steps, float(guidance_scale), record,
               deterministic_policy)
        if key not in self._denoise_cache:
            self._denoise_cache[key] = make_padded_denoise_fn(
                self._unet_apply, self.schedule, self.factor_net, max_steps,
                guidance_scale, record_trajectory=record,
                deterministic_policy=deterministic_policy,
            )
        return self._denoise_cache[key]

    def __call__(
        self,
        key: jax.Array,
        prompt_ids: jax.Array,
        noise: jax.Array,
        num_inference_steps: int = 8,
        guidance_scale: float = 3.0,
        uncond_ids: Optional[jax.Array] = None,
        decode: bool = True,
        solver: str = "consistencysolver",
        deterministic_policy: bool = False,
        padded_max_steps: Optional[int] = None,
        record: bool = True,
    ):
        """Returns (images or final latents, trajectory — None when
        ``record=False``, which skips materializing the per-step RL
        trajectory; serving uses that).

        ``padded_max_steps`` routes through the pad-to-max program
        (make_padded_denoise_fn): ONE compile serves every
        ``num_inference_steps`` in [1, padded_max_steps] — the serving-side
        answer to the reference's per-count programs when step counts vary
        (each call still pays max_steps UNet forwards).  Learnable solver
        only; results equal the per-count program on valid steps."""
        if uncond_ids is None:
            uncond_ids = self.uncond_ids_for(prompt_ids)
        context, uncond_context = self._encode(self.text_params, prompt_ids, uncond_ids)
        if padded_max_steps is not None:
            if solver != "consistencysolver":
                raise ValueError(
                    "padded_max_steps supports only the learnable "
                    "consistencysolver program"
                )
            denoise = self.padded_denoise_fn(
                padded_max_steps, guidance_scale, record=record,
                deterministic_policy=deterministic_policy,
            )
            ladder = padded_ladder(
                self.schedule, num_inference_steps, padded_max_steps,
                self.timestep_spacing, self.steps_offset,
            )
            latents, traj = denoise(
                self.unet_params, self.factor_params, key, noise, context,
                uncond_context, *ladder,
            )
        else:
            denoise = self.denoise_fn(
                num_inference_steps, guidance_scale, solver=solver,
                record=record, deterministic_policy=deterministic_policy,
            )
            latents, traj = denoise(
                self.unet_params, self.factor_params, key, noise, context,
                uncond_context,
            )
        if not decode:
            return latents, traj
        return self.decode_latents(latents), traj
