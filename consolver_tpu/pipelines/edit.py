"""FLUX-Kontext instructional image-editing pipeline.

TPU-native rebuild of the reference's editing rollout
(edit_ppo/denoise_diffusion.py:11-176 + the vendored FluxKontextPipeline,
edit_ppo/pipeline.py:206-1158): T5+CLIP prompt encoding, VAE-encode of the
reference image, 2x2 latent packing with RoPE ids (ids[...,0]=1 for the
reference tokens), resolution-dependent mu shift, guidance embeds, then the
flow-matching denoise — either the learnable FMPPO solver (with trajectory
recording for PPO) or a baseline FM zoo solver — and VAE decode.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from consolver_tpu.core import schedules
from consolver_tpu.models import flux as flux_lib
from consolver_tpu.pipelines import fm
from consolver_tpu.policy.factor_net import FactorNet


class FluxKontextPipeline:
    """Bundle of FLUX transformer + T5/CLIP encoders + 16ch VAE.

    All models are in-repo flax modules; weights convert from the hub
    (models/convert.py, models/t5.convert_t5).
    """

    def __init__(
        self,
        transformer,
        transformer_params,
        t5,
        t5_params,
        clip,
        clip_params,
        vae,
        vae_params,
        fm_config: Optional[schedules.FlowMatchConfig] = None,
        factor_net: Optional[FactorNet] = None,
        factor_params: Optional[Any] = None,
        vae_scaling_factor: float = 0.3611,
        vae_shift_factor: float = 0.1159,
    ):
        self.transformer = transformer
        self.transformer_params = transformer_params
        self.t5 = t5
        self.t5_params = t5_params
        self.clip = clip
        self.clip_params = clip_params
        self.vae = vae
        self.vae_params = vae_params
        self.fm_config = fm_config or schedules.FlowMatchConfig.flux()
        self.factor_net = factor_net
        self.factor_params = factor_params
        self.vae_scaling_factor = vae_scaling_factor
        self.vae_shift_factor = vae_shift_factor
        self._denoise_cache = {}
        self._jit_cache = {}

    # ------------------------------------------------------------------
    # Each encode/decode below runs as ONE jitted program (cached per
    # instance/shape): serving calls them outside any enclosing jit, and an
    # eager flax apply dispatches every op as its own device RPC through
    # the tunneled TPU backend — seconds of round-trips per batch for the
    # T5/VAE stacks.  Inside a trainer's jitted step the nested jit inlines.
    def encode_prompt(self, t5_ids, clip_ids):
        """(T5 joint embeddings, CLIP pooled)  — edit_ppo/denoise_diffusion.py:35-41."""
        if "encode_prompt" not in self._jit_cache:
            self._jit_cache["encode_prompt"] = jax.jit(
                lambda tp, cp, tids, cids: (
                    self.t5.apply(tp, tids),
                    self.clip.apply(cp, cids, return_pooled=True)[1],
                )
            )
        return self._jit_cache["encode_prompt"](
            self.t5_params, self.clip_params, t5_ids, clip_ids
        )

    def encode_image(self, image):
        """Reference image [B,H,W,3] in [-1,1] -> scaled latents NHWC."""
        if "encode_image" not in self._jit_cache:
            def _enc(vp, img):
                mean, _ = self.vae.apply(vp, img, method=self.vae.encode)
                return (mean - self.vae_shift_factor) * self.vae_scaling_factor

            self._jit_cache["encode_image"] = jax.jit(_enc)
        return self._jit_cache["encode_image"](self.vae_params, image)

    def decode_latents(self, latents, chunk=None):
        """``chunk=k`` micro-batches the decode inside one program
        (models/vae.chunked_apply) — bounds decoder activation HBM at large
        train/serving batches."""
        if ("decode", chunk) not in self._jit_cache:
            from consolver_tpu.models.vae import chunked_apply

            def _dec(vp, lat):
                x = lat / self.vae_scaling_factor + self.vae_shift_factor
                img = chunked_apply(
                    lambda c: self.vae.apply(vp, c, method=self.vae.decode),
                    x, chunk,
                )
                return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

            self._jit_cache[("decode", chunk)] = jax.jit(_dec)
        return self._jit_cache[("decode", chunk)](self.vae_params, latents)

    def quantize(self, bits: int = 8) -> "FluxKontextPipeline":
        """Quantized serving copy.  ``bits=8``: W8A8 int8 DiT stream-block
        projections + modulation and int8 VAE decoder (kernels/quant.py) —
        the SPEED config; at flux_kontext size the 11.9B DiT is ~12GB, a
        single 16GB chip (bf16 needs >= 2 chips + dist/tp).  ``bits=4``:
        packed 4-bit DiT weights, bf16 compute (W4A16 group-128) — the
        MEMORY config (~6.3GB DiT: 2x faster host->device loads + ~6GB of
        HBM headroom for 1024^2 activations); VAE decoder stays int8.
        Encoders stay float either way."""
        import dataclasses as _dc

        from consolver_tpu.kernels.quant import quantize_params_like
        from consolver_tpu.models.flux import FluxTransformer
        from consolver_tpu.models.vae import AutoencoderKL

        if bits not in (4, 8):
            raise ValueError(f"bits must be 4 or 8, got {bits}")
        cfg = self.transformer.cfg
        qcfg = (_dc.replace(cfg, quant_int4=True) if bits == 4
                else _dc.replace(cfg, quant_int8=True))
        qtr = FluxTransformer(qcfg, dtype=self.transformer.dtype)
        s_img, s_txt = 8, 4
        tshapes = jax.eval_shape(
            qtr.init, jax.random.key(0),
            jnp.zeros((1, s_img, cfg.in_channels)),
            jnp.zeros((1, s_txt, cfg.joint_text_dim)),
            jnp.zeros((1, cfg.pooled_text_dim)),
            jnp.ones((1,)), jnp.ones((1,)),
            jnp.zeros((s_img, 3)), jnp.zeros((s_txt, 3)),
        )
        qvae = AutoencoderKL(_dc.replace(self.vae.cfg, quant_int8=True),
                             dtype=self.vae.dtype)
        vshapes = jax.eval_shape(
            qvae.init, jax.random.key(0),
            jnp.zeros((1, 16, 16, self.vae.cfg.in_channels)), jax.random.key(1),
        )
        return FluxKontextPipeline(
            qtr, quantize_params_like(tshapes, self.transformer_params),
            self.t5, self.t5_params, self.clip, self.clip_params,
            qvae, quantize_params_like(vshapes, self.vae_params),
            fm_config=self.fm_config, factor_net=self.factor_net,
            factor_params=self.factor_params,
            vae_scaling_factor=self.vae_scaling_factor,
            vae_shift_factor=self.vae_shift_factor,
        )

    # ------------------------------------------------------------------
    def _velocity_fn(
        self, seq_len_target, img_ids, txt_ids, guidance_scale,
        true_cfg_scale=None,
    ):
        """Wrap the transformer as velocity_fn(params, packed_target, t, cond):
        concatenates the conditioning reference tokens, runs the DiT with
        timestep/1000 (edit_ppo/denoise_diffusion.py:135-145), slices back.

        With ``true_cfg_scale`` set, cond additionally carries negative-prompt
        embeddings and the forward is the true-CFG double pass
        (edit_ppo/pipeline.py:1100-1115) — here 2x-batched so both branches
        share one MXU-friendly DiT call:
        v = v_neg + s * (v_pos - v_neg)."""

        def velocity(params, x, t, cond):
            if true_cfg_scale is None:
                prompt_embeds, pooled, ref_tokens = cond
                tokens = jnp.concatenate([x, ref_tokens], axis=1)
                guidance = jnp.full((x.shape[0],), guidance_scale, jnp.float32)
                v = self.transformer.apply(
                    params, tokens, prompt_embeds, pooled, t, guidance,
                    img_ids, txt_ids,
                )
                return v[:, :seq_len_target]

            pe, pooled, neg_pe, neg_pooled, ref_tokens = cond
            tokens = jnp.concatenate([x, ref_tokens], axis=1)
            tokens2 = jnp.concatenate([tokens, tokens], axis=0)
            pe2 = jnp.concatenate([pe, neg_pe], axis=0)
            pooled2 = jnp.concatenate([pooled, neg_pooled], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            guidance = jnp.full((tokens2.shape[0],), guidance_scale, jnp.float32)
            v = self.transformer.apply(
                params, tokens2, pe2, pooled2, t2, guidance, img_ids, txt_ids
            )[:, :seq_len_target]
            v_pos, v_neg = jnp.split(v, 2, axis=0)
            return v_neg + true_cfg_scale * (v_pos - v_neg)

        return velocity

    def denoise_fn(
        self,
        lh: int,
        lw: int,
        seq_txt: int,
        num_inference_steps: int,
        guidance_scale: float,
        solver: str = "fmppo",
        record: bool = True,
        true_cfg_scale: Optional[float] = None,
        deterministic_policy: bool = False,
    ):
        """Build/caches the jitted denoise fn for a (latent resolution,
        steps, solver) combination.  mu follows the target-image sequence
        length (edit_ppo/denoise_diffusion.py:75-84).
        ``deterministic_policy`` = mode actions (serving; see
        fm.make_fm_denoise_fn)."""
        if solver != "fmppo":
            deterministic_policy = False  # no policy: don't fork programs
        seq_len = (lh // 2) * (lw // 2)
        key = (lh, lw, seq_txt, num_inference_steps, guidance_scale, solver,
               record, true_cfg_scale, deterministic_policy)
        if key in self._denoise_cache:
            return self._denoise_cache[key]

        mu = schedules.calculate_flux_mu(
            seq_len,
            self.fm_config.base_image_seq_len,
            self.fm_config.max_image_seq_len,
            self.fm_config.base_shift,
            self.fm_config.max_shift,
        )
        img_ids = jnp.concatenate(
            [
                flux_lib.latent_image_ids(lh, lw),
                flux_lib.latent_image_ids(lh, lw, offset=1.0),
            ],
            axis=0,
        )
        txt_ids = jnp.zeros((seq_txt, 3))
        velocity = self._velocity_fn(
            seq_len, img_ids, txt_ids, guidance_scale, true_cfg_scale
        )
        if solver == "fmppo":
            fn = fm.make_fm_denoise_fn(
                velocity, self.fm_config, self.factor_net, num_inference_steps,
                mu=mu, record_trajectory=record,
                deterministic_policy=deterministic_policy,
            )
        else:
            base = fm.make_fm_baseline_denoise_fn(
                velocity, self.fm_config, solver, num_inference_steps, mu=mu
            )
            fn = lambda mp, fp, k, noise, cond: (base(mp, noise, cond), None)
        self._denoise_cache[key] = fn
        return fn

    def padded_denoise_fn(
        self,
        lh: int,
        lw: int,
        seq_txt: int,
        max_steps: int,
        guidance_scale: float,
        record: bool = True,
        true_cfg_scale: Optional[float] = None,
        deterministic_policy: bool = False,
        use_policy: bool = True,
    ):
        """One compiled rollout for every step count in [1, max_steps] at
        this latent resolution (fm.make_padded_fm_denoise_fn); call with a
        :func:`fm.padded_fm_ladder` built with this resolution's mu.
        ``use_policy=False`` drops the factor net — the degenerate order-1
        program IS the Euler baseline (coeffs normalize to [1]), used for
        the trainer's padded baseline rollout."""
        seq_len = (lh // 2) * (lw // 2)
        key = ("padded", lh, lw, seq_txt, max_steps, guidance_scale,
               record, true_cfg_scale, deterministic_policy, use_policy)
        if key not in self._denoise_cache:
            img_ids = jnp.concatenate(
                [
                    flux_lib.latent_image_ids(lh, lw),
                    flux_lib.latent_image_ids(lh, lw, offset=1.0),
                ],
                axis=0,
            )
            velocity = self._velocity_fn(
                seq_len, img_ids, jnp.zeros((seq_txt, 3)), guidance_scale,
                true_cfg_scale,
            )
            self._denoise_cache[key] = fm.make_padded_fm_denoise_fn(
                velocity, self.fm_config,
                self.factor_net if use_policy else None, max_steps,
                record_trajectory=record,
                deterministic_policy=deterministic_policy,
            )
        return self._denoise_cache[key]

    def mu_for(self, lh: int, lw: int) -> float:
        """Resolution-dependent FM shift (edit_ppo/pipeline.py:119-130)."""
        return schedules.calculate_flux_mu(
            (lh // 2) * (lw // 2),
            self.fm_config.base_image_seq_len,
            self.fm_config.max_image_seq_len,
            self.fm_config.base_shift,
            self.fm_config.max_shift,
        )

    # ------------------------------------------------------------------
    def __call__(
        self,
        key: jax.Array,
        t5_ids: jax.Array,
        clip_ids: jax.Array,
        ref_image: jax.Array,
        noise: jax.Array,
        num_inference_steps: int = 5,
        guidance_scale: float = 2.5,
        solver: str = "fmppo",
        decode: bool = True,
        neg_t5_ids: Optional[jax.Array] = None,
        neg_clip_ids: Optional[jax.Array] = None,
        true_cfg_scale: float = 1.0,
        deterministic_policy: bool = False,
        record: bool = True,
        padded_max_steps: Optional[int] = None,
    ):
        """ref_image [B,H,W,3] in [-1,1]; noise [B,h,w,16] latent noise.
        Returns (edited image or final latents, trajectory — None when
        ``record=False``; serving skips the RL trajectory).

        ``padded_max_steps`` routes through the pad-to-max program (ONE
        compile serves every step count in [1, N]; fmppo only; results
        equal the per-count program on valid steps).

        Passing ``neg_t5_ids``/``neg_clip_ids`` with ``true_cfg_scale > 1``
        enables the negative-prompt true-CFG double forward
        (edit_ppo/pipeline.py:1100-1115); at scale 1 (or with no negative
        prompt) the distilled guidance-embeds path runs unchanged."""
        b, lh, lw, _ = noise.shape
        prompt_embeds, pooled = self.encode_prompt(t5_ids, clip_ids)
        ref_latents = self.encode_image(ref_image)
        ref_tokens = flux_lib.pack_latents(ref_latents)
        packed_noise = flux_lib.pack_latents(noise)

        do_true_cfg = neg_t5_ids is not None and true_cfg_scale > 1.0
        ladder = None
        if padded_max_steps is not None:
            if solver not in ("fmppo", "euler"):
                raise ValueError(
                    "padded_max_steps supports the learnable fmppo program "
                    "and the degenerate euler baseline"
                )
            denoise = self.padded_denoise_fn(
                lh, lw, int(t5_ids.shape[1]), padded_max_steps,
                guidance_scale, record=record,
                true_cfg_scale=true_cfg_scale if do_true_cfg else None,
                deterministic_policy=deterministic_policy,
                use_policy=(solver == "fmppo"),
            )
            ladder = fm.padded_fm_ladder(
                self.fm_config, num_inference_steps, padded_max_steps,
                mu=self.mu_for(lh, lw),
            )
        else:
            denoise = self.denoise_fn(
                lh, lw, int(t5_ids.shape[1]), num_inference_steps,
                guidance_scale, solver, record=record,
                true_cfg_scale=true_cfg_scale if do_true_cfg else None,
                deterministic_policy=deterministic_policy,
            )
        if do_true_cfg:
            if neg_clip_ids is None:
                # T5 ids are NOT valid CLIP ids (different tokenizer/vocab/
                # length) — silently reusing them would corrupt the negative
                # pooled embedding; the reference tokenizes the negative
                # prompt separately per encoder (edit_ppo/pipeline.py:417-436)
                raise ValueError(
                    "true-CFG needs neg_clip_ids alongside neg_t5_ids "
                    "(tokenize the negative prompt with BOTH tokenizers)"
                )
            neg_embeds, neg_pooled = self.encode_prompt(neg_t5_ids, neg_clip_ids)
            cond = (prompt_embeds, pooled, neg_embeds, neg_pooled, ref_tokens)
        else:
            cond = (prompt_embeds, pooled, ref_tokens)
        if ladder is not None:
            packed_out, traj = denoise(
                self.transformer_params, self.factor_params, key,
                packed_noise, cond, *ladder,
            )
        else:
            packed_out, traj = denoise(
                self.transformer_params, self.factor_params, key,
                packed_noise, cond,
            )
        latents = flux_lib.unpack_latents(packed_out, lh, lw)
        if not decode:
            return latents, traj
        return self.decode_latents(latents), traj
