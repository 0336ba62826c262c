"""Tensor-parallel sharding rules for the large denoisers.

Beyond reference parity (the reference is DP-only, SURVEY.md section 2.7):
for serving FLUX-class DiTs across a slice, parameters are sharded over the
``model`` mesh axis with regex -> PartitionSpec rules and XLA inserts the
collectives.  Attention q/k/v and MLP up-projections split the output
feature dim (head-parallel); out/down-projections split the input dim so
each requires one reduce-scatter/all-reduce, the classic Megatron cut.

Usage:
    mesh = make_mesh(axis_shape=(dp, tp), axis_names=("data", "model"))
    sharded = shard_params_by_rules(mesh, params, FLUX_TP_RULES)
    out = jax.jit(model.apply)(sharded, *batch_sharded_inputs)
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from consolver_tpu.dist.mesh import MODEL_AXIS

Rules = Sequence[Tuple[str, P]]

# FluxTransformer parameter tree rules (paths are '/'-joined param paths).
FLUX_TP_RULES: Rules = (
    # attention projections: split heads (output dim)
    (r"attn_(to|add)_(q|k|v)/kernel$", P(None, MODEL_AXIS)),
    # attention output projections: split input dim (all-reduce after)
    (r"attn_to_out_0/kernel$", P(MODEL_AXIS, None)),
    (r"attn_to_add_out/kernel$", P(MODEL_AXIS, None)),
    # MLPs: up-proj splits output, down-proj splits input
    (r"ff(_context)?_net_0_proj/kernel$", P(None, MODEL_AXIS)),
    (r"ff(_context)?_net_2/kernel$", P(MODEL_AXIS, None)),
    # single-stream fused projections
    (r"proj_mlp/kernel$", P(None, MODEL_AXIS)),
    (r"proj_out/kernel$", P(MODEL_AXIS, None)),
    # adaLN modulation linears: h -> 6h/3h/2h — at flux_kontext size these
    # are the LARGEST weights (~3.2B params total); split the output dim
    # (the 6-way split + per-token broadcast reshard under jit)
    (r"norm1(_context)?_linear/kernel$", P(None, MODEL_AXIS)),
    (r"norm_linear/kernel$", P(None, MODEL_AXIS)),
    (r"norm_out_linear/kernel$", P(None, MODEL_AXIS)),
)

# SD UNet: split attention + GEGLU projections in the transformer blocks.
UNET_TP_RULES: Rules = (
    (r"to_(q|k|v)/kernel$", P(None, MODEL_AXIS)),
    (r"to_out_0/kernel$", P(MODEL_AXIS, None)),
    (r"ff/net_0/proj/kernel$", P(None, MODEL_AXIS)),
    (r"ff/net_2/kernel$", P(MODEL_AXIS, None)),
)


def _spec_for(path: str, rules: Rules) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()  # replicate


def _spec_for_leaf(path: str, leaf: Any, rules: Rules) -> P:
    """Rule lookup that also understands quantized kernel layouts.

    Rules are written against float ``.../kernel`` paths.  Quantized
    modules (kernels/quant.py) replace that leaf with:
      * int8:  ``kernel`` int8 [in, out] (same spec applies directly) +
        ``kernel_scale`` f32 [out] — split iff the kernel's OUTPUT dim is;
      * int4:  ``kernel_packed`` uint8 [in//2, out] (packing halves the
        input dim, so the kernel's spec applies dim-for-dim) +
        ``kernel_scale`` f32 [groups, out] (groups tile the input dim, so
        again the kernel's spec applies dim-for-dim).
    The divisibility guard in :func:`shard_params_by_rules` falls back to
    replication when a halved/grouped dim no longer divides the axis."""
    if path.endswith("/kernel_packed"):
        return _spec_for(path[: -len("_packed")], rules)
    if path.endswith("/kernel_scale"):
        kspec = _spec_for(path[: -len("_scale")], rules)
        ndim = len(np.shape(leaf))
        if ndim == 2:  # int4 group-wise: [groups(in), out] — mirror the kernel
            return kspec
        # int8 per-channel: [out] — follows the kernel's output dim
        out_axis = kspec[1] if len(kspec) > 1 else None
        return P(out_axis) if out_axis is not None else P()
    return _spec_for(path, rules)


def shard_params_by_rules(mesh: Mesh, params: Any, rules: Rules) -> Any:
    """device_put every leaf according to the first matching rule
    (replicated otherwise; quantized ``kernel_packed``/``kernel_scale``
    leaves inherit the matching float-kernel rule — see
    :func:`_spec_for_leaf`).  Dims that don't divide the axis size fall
    back to replication for that leaf."""
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for path, leaf in flat:
        path_str = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        spec = _spec_for_leaf(path_str, leaf, rules)
        # divisibility guard
        ok = True
        for dim, axis in enumerate(spec):
            if axis is not None and np.shape(leaf)[dim] % axis_size != 0:
                ok = False
        sharding = NamedSharding(mesh, spec if ok else P())
        leaves.append(jax.device_put(leaf, sharding))
    return jax.tree_util.tree_unflatten(treedef, leaves)
