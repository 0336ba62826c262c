"""Device mesh + sharding rules: the TPU-native replacement for the
reference's HF-Accelerate DDP over NCCL (SURVEY.md section 2.7).

Design: a 1-D "data" mesh axis over ICI shards the rollout/training batch;
the factor net (and frozen model weights) are replicated.  Gradients need no
hand-written all-reduce — with batch-sharded inputs and replicated params,
XLA inserts the psum for the global-mean loss automatically under jit.  An
optional "model" axis is reserved for tensor-sharding large denoisers.

This replaces: accelerator.prepare DDP wrap (train_ppo.py:257-259), implicit
gradient all-reduce (train_ppo.py:430), and the step-count broadcast
(edit_ppo/train_ppo.py:275-283 — here made deterministic per-step instead,
see rl/train.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: Optional[int] = None,
    axis_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the fastest (ICI) dimension first.

    Defaults to a 1-D data mesh over all local devices.  For multi-slice
    (DCN) topologies pass an explicit ``axis_shape`` with the DCN axis
    leading so collectives ride ICI within a slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    if axis_shape is None:
        axis_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(axis_shape)
    return Mesh(arr, tuple(axis_names))


def make_hybrid_mesh(
    ici_shape: Tuple[int, ...],
    dcn_shape: Tuple[int, ...],
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Multi-slice (DCN) mesh: per-slice ICI submeshes stitched over the
    data-center network, so intra-axis collectives ride ICI within a slice
    and only the leading (data) axis crosses DCN — the layout the scaling
    playbook prescribes for multi-slice data parallelism.

    ``ici_shape``/``dcn_shape`` multiply elementwise to the global device
    count (e.g. 2 slices of v5e-8 as dp x tp: ici=(1, 8), dcn=(2, 1)).
    On a single-slice (or CPU-virtual) topology where devices carry no
    slice index, falls back to a plain :func:`make_mesh` of the same total
    shape — same program, same shardings, no DCN axis to optimize."""
    from jax.experimental import mesh_utils

    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=jax.devices()
        )
        return Mesh(devices, tuple(axis_names))
    except (ValueError, AssertionError, KeyError):
        shape = tuple(i * d for i, d in zip(ici_shape, dcn_shape))
        return make_mesh(
            num_devices=int(np.prod(shape)), axis_shape=shape,
            axis_names=axis_names,
        )


def mesh_from_config(
    data_parallel: int = 1,
    model_parallel: int = 1,
    warn=print,
) -> Optional[Mesh]:
    """Build the training mesh from config knobs (configs.DistConfig — the
    TPU-native replacement for accelerate's --num_processes,
    edit_ppo/run_ppo.sh:5).  Returns None for a 1x1 topology (no mesh).

    Requested shards clamp to the visible devices with a warning, so a
    production preset written for a v5e-8 still smoke-runs on one chip."""
    ndev = jax.device_count()
    if data_parallel * model_parallel <= 1:
        return None
    if model_parallel > ndev or ndev % max(model_parallel, 1):
        warn(
            f"[dist] model_parallel={model_parallel} does not fit "
            f"{ndev} devices; disabling model axis"
        )
        model_parallel = 1
    dp = min(data_parallel, ndev // model_parallel)
    if dp != data_parallel:
        warn(
            f"[dist] clamping data_parallel {data_parallel} -> {dp} "
            f"({ndev} visible devices, model_parallel={model_parallel})"
        )
    if dp * model_parallel <= 1:
        return None
    if model_parallel > 1:
        return make_mesh(
            num_devices=dp * model_parallel, axis_shape=(dp, model_parallel),
            axis_names=(DATA_AXIS, MODEL_AXIS),
        )
    return make_mesh(num_devices=dp)


def data_axis_size(mesh: Mesh, axis: str = DATA_AXIS) -> int:
    """Number of shards along the data axis — the multiple batch sizes must
    pad to before :func:`shard_batch`."""
    return int(mesh.shape.get(axis, 1))


def resolve_num_groups(configured: Optional[int], mesh: Optional[Mesh]) -> int:
    """GRPO group count for a trainer: the configured override, else one
    group per data shard (the reference's per-rank groups,
    edit_ppo/train_ppo.py:258-326), else 1."""
    if configured:
        return configured
    return data_axis_size(mesh) if mesh is not None else 1


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis: str = DATA_AXIS) -> Any:
    """Device-put every leaf with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_jit(fn, mesh: Mesh, batch_argnums: Sequence[int], static_argnums=()):
    """jit ``fn`` with the given positional args batch-sharded and everything
    else replicated.  XLA inserts the cross-device collectives (grad psum)
    automatically; this is the pjit-style replacement for DDP."""
    import inspect

    bshard = batch_sharding(mesh)
    rshard = replicated(mesh)
    nargs = len(inspect.signature(fn).parameters)
    in_shardings = tuple(
        bshard if i in batch_argnums else rshard for i in range(nargs)
    )
    return jax.jit(fn, in_shardings=in_shardings, static_argnums=static_argnums)


def assert_params_synced(params: Any) -> float:
    """Debug probe mirroring the reference's DDP param-sum print
    (train_ppo.py:452-455): returns the global param sum (identical on every
    host iff replication is intact)."""
    return float(
        sum(jax.tree.leaves(jax.tree.map(lambda p: p.sum(), params)))
    )
