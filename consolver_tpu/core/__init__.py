from consolver_tpu.core import schedules, solver  # noqa: F401
