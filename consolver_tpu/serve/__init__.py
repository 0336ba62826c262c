"""Production serving: micro-batching engines + HTTP front-end."""

from consolver_tpu.serve.engine import (
    EditInferenceEngine,
    EditRequest,
    EngineShutDown,
    GenerationRequest,
    InferenceEngine,
    ReplicaGroup,
    RequestExpired,
    make_replicas,
)
from consolver_tpu.serve.http import ServeServer, make_server

__all__ = [
    "EditInferenceEngine",
    "EditRequest",
    "EngineShutDown",
    "GenerationRequest",
    "InferenceEngine",
    "ReplicaGroup",
    "RequestExpired",
    "ServeServer",
    "make_replicas",
    "make_server",
]
