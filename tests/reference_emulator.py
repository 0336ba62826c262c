"""A list-based numpy emulator of the reference scheduler-step semantics.

Written from the behavioral description in SURVEY.md (scheduler_ppo.py:178-299,
scheduler_fmppo.py:306-455) purely as a test oracle for the scan-compatible
ring-buffer solver in consolver_tpu.core.solver.  It intentionally mirrors the
reference's Python-list history handling so the warmup masking semantics can be
property-tested.
"""

from __future__ import annotations

import numpy as np


class ListLMM:
    """Keeps a growing-then-trimmed list of model outputs like the reference's
    ``self.ets`` and applies the same normalize/combine/scale rules."""

    def __init__(self, order_dim: int, scaler_dim: int):
        self.order_dim = order_dim
        self.scaler_dim = scaler_dim
        self.ets: list[np.ndarray] = []

    def reset(self):
        self.ets = []

    def _set_default_coefficients(self, action_params, scale_params, num_ets):
        action_params = list(action_params)
        action_params.append(action_params[-1])  # placeholder
        action_params[0] = action_params[0] + 1
        if num_ets > 1:
            action_params[num_ets - 1] = 1 - np.sum(
                np.stack(action_params[: num_ets - 1]), axis=0
            )
        scale_params = [s + 1 for s in scale_params]
        return action_params, scale_params

    def step(self, model_output: np.ndarray, sample: np.ndarray, actions: np.ndarray):
        """actions: [B, order_dim + scaler_dim - 1].  Returns
        (effective_model_output, scaled_sample, masks)."""
        self.ets.append(model_output)
        self.ets = self.ets[-self.order_dim :]
        num_ets = len(self.ets)

        n_params = self.order_dim + self.scaler_dim - 1
        expand = [actions[:, i].reshape(-1, *([1] * (model_output.ndim - 1))) for i in range(n_params)]
        action_params = expand[: self.order_dim - 1]
        scale_params = expand[self.order_dim - 1 :]
        if self.order_dim == 1:
            # Degenerate case: no order actions; placeholder append would fail
            # in the reference too, so only defined for order_dim >= 2 there.
            action_params = [np.ones_like(expand[0])] if expand else []
            action_params, scale_params = action_params, [s + 1 for s in scale_params]
        else:
            action_params, scale_params = self._set_default_coefficients(
                action_params, scale_params, num_ets
            )

        if num_ets == 1:
            effective = self.ets[-1].copy()
        else:
            coeffs = action_params[:num_ets]
            ets_rev = self.ets[::-1]
            effective = sum(c * e for c, e in zip(coeffs, ets_rev))

        sample = sample.copy()
        if len(scale_params) == 1:
            effective = effective * scale_params[0]
        elif len(scale_params) == 2:
            effective = effective * scale_params[0]
            sample = sample * scale_params[1]

        masks = np.ones((actions.shape[0], actions.shape[1]), dtype=np.float32)
        masks[:, num_ets - 1 : self.order_dim - 1] = 0
        return effective, sample, masks


def ddim_update_np(sample, model_output, alpha_prod_t, alpha_prod_t_prev, prediction_type="epsilon"):
    beta_prod_t = 1 - alpha_prod_t
    beta_prod_t_prev = 1 - alpha_prod_t_prev
    if prediction_type == "v_prediction":
        model_output = alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
    x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
    return alpha_prod_t_prev**0.5 * x0 + beta_prod_t_prev**0.5 * model_output
