"""Minimal no-op `diffusers` API surface so the REFERENCE schedulers import
and run as TRUE step-level golden oracles (VERDICT r2 Missing #4): torch is
installed but diffusers is not, and the reference schedulers only touch this
thin slice of it (ConfigMixin/register_to_config/SchedulerMixin/
SchedulerOutput/BaseOutput/logging/randn_tensor).

`install()` registers the stub modules in sys.modules; `load_reference(...)`
then imports a reference scheduler file against them.  The stub mimics
diffusers semantics exactly where the reference depends on them — notably
register_to_config sets `self.config` BEFORE the wrapped __init__ body runs
(scheduler_fm.py:108 reads self.config inside __init__).
"""

from __future__ import annotations

import enum
import functools
import importlib.util
import inspect
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def install():
    """Register stub `diffusers` modules in sys.modules (idempotent)."""
    if "diffusers" in sys.modules:
        return sys.modules["diffusers"]
    import torch

    root = types.ModuleType("diffusers")
    cfg_mod = types.ModuleType("diffusers.configuration_utils")
    sched_pkg = types.ModuleType("diffusers.schedulers")
    sched_utils = types.ModuleType("diffusers.schedulers.scheduling_utils")
    utils_mod = types.ModuleType("diffusers.utils")
    torch_utils = types.ModuleType("diffusers.utils.torch_utils")

    class ConfigMixin:
        pass

    class SchedulerMixin:
        pass

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            bound = inspect.signature(init).bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            self.config = types.SimpleNamespace(**cfg)
            return init(self, *args, **kwargs)

        return wrapper

    class SchedulerOutput:
        def __init__(self, **kwargs):
            self.__dict__.update(kwargs)

    class BaseOutput:
        pass

    class KarrasDiffusionSchedulers(enum.Enum):
        DDIMScheduler = 1  # only iterated for the _compatibles name list

    def is_scipy_available():
        try:
            import scipy  # noqa: F401

            return True
        except ImportError:
            return False

    class _Logger:
        def get_logger(self, *_a, **_k):
            import logging as _pylogging

            return _pylogging.getLogger("diffusers_stub")

    def deprecate(*_a, **_k):
        pass

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(
            shape, generator=generator, device=device or "cpu",
            dtype=dtype or torch.float32,
        )

    class DPMSolverMultistepScheduler(SchedulerMixin, ConfigMixin):
        """Faithful slice of diffusers' DPMSolverMultistepScheduler base —
        exactly the members the AMED plugin subclass relies on (config,
        alphas_cumprod, sigma<->alpha conversion, convert_model_output,
        step-index machinery).  The plugin overrides set_timesteps and every
        update rule itself (diffusers_amed_plugin_dpmpp.py:27-436)."""

        @register_to_config
        def __init__(
            self,
            num_train_timesteps: int = 1000,
            beta_start: float = 0.0001,
            beta_end: float = 0.02,
            beta_schedule: str = "linear",
            solver_order: int = 2,
            prediction_type: str = "epsilon",
            algorithm_type: str = "dpmsolver++",
            solver_type: str = "midpoint",
            lower_order_final: bool = True,
            euler_at_final: bool = False,
            final_sigmas_type: str = "zero",
        ):
            if beta_schedule == "linear":
                betas = torch.linspace(
                    beta_start, beta_end, num_train_timesteps,
                    dtype=torch.float32,
                )
            elif beta_schedule == "scaled_linear":
                betas = (
                    torch.linspace(
                        beta_start**0.5, beta_end**0.5, num_train_timesteps,
                        dtype=torch.float32,
                    )
                    ** 2
                )
            else:
                raise NotImplementedError(beta_schedule)
            self.alphas = 1.0 - betas
            self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
            self.model_outputs = [None] * solver_order
            self.lower_order_nums = 0
            self.num_inference_steps = None
            self._step_index = None
            self._begin_index = None

        @property
        def step_index(self):
            return self._step_index

        @property
        def begin_index(self):
            return self._begin_index

        def _sigma_to_alpha_sigma_t(self, sigma):
            alpha_t = 1 / ((sigma**2 + 1) ** 0.5)
            return alpha_t, sigma * alpha_t

        def convert_model_output(self, model_output, *args, sample=None, **_k):
            # epsilon prediction only (the SD production config)
            if self.config.algorithm_type in ("dpmsolver++", "sde-dpmsolver++"):
                sigma = self.sigmas[self.step_index]
                alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
                return (sample - sigma_t * model_output) / alpha_t
            return model_output

        def index_for_timestep(self, timestep, schedule_timesteps=None):
            if schedule_timesteps is None:
                schedule_timesteps = self.timesteps
            idx = (schedule_timesteps == timestep).nonzero()
            pos = 1 if len(idx) > 1 else 0
            return idx[pos].item()

        def _init_step_index(self, timestep):
            if self._begin_index is None:
                self._step_index = self.index_for_timestep(timestep)
            else:
                self._step_index = self._begin_index

        def set_timesteps(self, num_inference_steps=None, device=None):
            raise NotImplementedError(
                "stub base: drive the AMED plugin with explicit timesteps"
            )

    cfg_mod.ConfigMixin = ConfigMixin
    cfg_mod.register_to_config = register_to_config
    root.DPMSolverMultistepScheduler = DPMSolverMultistepScheduler
    sched_utils.SchedulerMixin = SchedulerMixin
    sched_utils.SchedulerOutput = SchedulerOutput
    sched_utils.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    utils_mod.BaseOutput = BaseOutput
    utils_mod.is_scipy_available = is_scipy_available
    utils_mod.logging = _Logger()
    utils_mod.deprecate = deprecate
    torch_utils.randn_tensor = randn_tensor

    root.configuration_utils = cfg_mod
    root.schedulers = sched_pkg
    sched_pkg.scheduling_utils = sched_utils
    root.utils = utils_mod
    utils_mod.torch_utils = torch_utils
    root.ConfigMixin = ConfigMixin
    root.SchedulerMixin = SchedulerMixin

    sys.modules["diffusers"] = root
    sys.modules["diffusers.configuration_utils"] = cfg_mod
    sys.modules["diffusers.schedulers"] = sched_pkg
    sys.modules["diffusers.schedulers.scheduling_utils"] = sched_utils
    sys.modules["diffusers.utils"] = utils_mod
    sys.modules["diffusers.utils.torch_utils"] = torch_utils
    return root


def _stub_missing_reference_modules():
    """scheduler_ppo.py imports factor_net_ppo_continous, a module the
    reference repo does NOT ship (its dead import) — stub it."""
    if "factor_net_ppo_continous" not in sys.modules:
        mod = types.ModuleType("factor_net_ppo_continous")

        class FactorNetPPOContinous:  # matches the reference's (sic) spelling
            def __init__(self, *_a, **_k):
                raise NotImplementedError("dead import in the reference")

        mod.FactorNetPPOContinous = FactorNetPPOContinous
        sys.modules["factor_net_ppo_continous"] = mod


_SIBLING_DIRS: dict = {}  # sibling module name -> directory it was loaded from


def load_reference(relpath: str):
    """Import a reference python file (e.g. "scheduler_ppo.py" or
    "edit_ppo/scheduler_fmppo.py") under the stub, returning the module.
    The file's own directory is put on sys.path for its sibling imports
    (factor_net_ppo, conv_net) — and siblings cached from a DIFFERENT
    reference directory are evicted first, since the root and edit_ppo
    trees both ship a factor_net_ppo.py with different signatures."""
    install()
    _stub_missing_reference_modules()
    path = os.path.join(REFERENCE_ROOT, relpath)
    moddir = os.path.dirname(path)
    name = "ref_" + relpath.replace("/", "_").removesuffix(".py")
    if name in sys.modules:
        return sys.modules[name]
    for sibling in ("factor_net_ppo", "conv_net"):
        if _SIBLING_DIRS.get(sibling, moddir) != moddir:
            sys.modules.pop(sibling, None)
        _SIBLING_DIRS[sibling] = moddir
    added = moddir not in sys.path
    if added:
        sys.path.insert(0, moddir)
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        if added:
            sys.path.remove(moddir)
    return mod


class FixedActionNet:
    """Stands in for the reference's torch FactorNetPPO inside a scheduler:
    sample_action returns the pre-planned torch actions for each call, so
    both the oracle and our solver consume identical action sequences."""

    def __init__(self, actions_per_step):
        import torch

        self._seq = [torch.as_tensor(a, dtype=torch.float32)
                     for a in actions_per_step]
        self.calls = 0

    def sample_action(self, conds):
        import torch

        a = self._seq[self.calls]
        self.calls += 1
        return a, torch.full_like(a, 0.5)
