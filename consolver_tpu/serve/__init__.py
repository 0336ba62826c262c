"""Production serving: micro-batching engine + HTTP front-end."""

from consolver_tpu.serve.engine import (
    EngineShutDown,
    GenerationRequest,
    InferenceEngine,
)
from consolver_tpu.serve.http import ServeServer, make_server

__all__ = [
    "EngineShutDown",
    "GenerationRequest",
    "InferenceEngine",
    "ServeServer",
    "make_server",
]
