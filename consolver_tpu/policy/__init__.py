from consolver_tpu.policy.factor_net import FactorNet, FactorNetConfig  # noqa: F401
