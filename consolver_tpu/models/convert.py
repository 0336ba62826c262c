"""HF/torch checkpoint -> flax param-tree conversion.

The reference never defines the big models; it pulls them from the HF hub
(train_ppo.py:102-131).  Our in-repo flax models mirror diffusers /
transformers checkpoint key structure, so conversion is a mechanical walk:

  * dotted integer components merge into their parent ("down_blocks.0" ->
    "down_blocks_0"), matching the flax module names;
  * 4D conv weights transpose OIHW -> HWIO, 2D linear weights transpose,
    1D "weight" becomes a norm "scale", embeddings keep layout under the
    "embedding" leaf name.

Works on any mapping of key -> array-like (torch tensors, numpy arrays,
or safetensors slices).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Mapping, Sequence, Tuple

import numpy as np


def _to_numpy(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu()
        if hasattr(v, "float") and str(getattr(v, "dtype", "")).endswith("bfloat16"):
            v = v.float()
        return v.numpy()
    return np.asarray(v)


_CLIP_RENAMES: Sequence[Tuple[str, str]] = (
    (r"^text_model\.", ""),
    (r"^embeddings\.token_embedding", "token_embedding"),
    (r"^embeddings\.position_embedding", "position_embedding"),
    (r"^encoder\.layers\.", "layers."),
    (r"\.mlp\.fc1\.", ".mlp_fc1."),
    (r"\.mlp\.fc2\.", ".mlp_fc2."),
)

# diffusers FluxTransformer2DModel naming -> our flattened module names.
_FLUX_RENAMES: Sequence[Tuple[str, str]] = (
    (r"^time_text_embed\.timestep_embedder", "timestep_embedder"),
    (r"^time_text_embed\.guidance_embedder", "guidance_embedder"),
    (r"^time_text_embed\.text_embedder", "text_embedder"),
    (r"\.norm1\.linear\.", ".norm1_linear."),
    (r"\.norm1_context\.linear\.", ".norm1_context_linear."),
    (r"\.norm\.linear\.", ".norm_linear."),
    (r"^norm_out\.linear\.", "norm_out_linear."),
    (r"\.attn\.to_q\.", ".attn_to_q."),
    (r"\.attn\.to_k\.", ".attn_to_k."),
    (r"\.attn\.to_v\.", ".attn_to_v."),
    (r"\.attn\.add_q_proj\.", ".attn_add_q."),
    (r"\.attn\.add_k_proj\.", ".attn_add_k."),
    (r"\.attn\.add_v_proj\.", ".attn_add_v."),
    (r"\.attn\.norm_q\.", ".attn_norm_q."),
    (r"\.attn\.norm_k\.", ".attn_norm_k."),
    (r"\.attn\.norm_added_q\.", ".attn_norm_added_q."),
    (r"\.attn\.norm_added_k\.", ".attn_norm_added_k."),
    (r"\.attn\.to_out\.0\.", ".attn_to_out_0."),
    (r"\.attn\.to_add_out\.", ".attn_to_add_out."),
    (r"\.ff\.net\.0\.proj\.", ".ff_net_0_proj."),
    (r"\.ff\.net\.2\.", ".ff_net_2."),
    (r"\.ff_context\.net\.0\.proj\.", ".ff_context_net_0_proj."),
    (r"\.ff_context\.net\.2\.", ".ff_context_net_2."),
)

# In the double-stream attention our q/k/v live under names like
# "attn_to_q" where diffusers uses "attn.to_q"; single-stream "proj_mlp" /
# "proj_out" match directly.

# Old-format SD VAE attention naming -> modern diffusers naming.
_VAE_ATTN_RENAMES: Sequence[Tuple[str, str]] = (
    (r"\.query\.", ".to_q."),
    (r"\.key\.", ".to_k."),
    (r"\.value\.", ".to_v."),
    (r"\.proj_attn\.", ".to_out.0."),
)

_SKIP_PATTERNS = (
    r"position_ids$",
    r"num_batches_tracked$",
    r"mask_token$",
    r"^logit_scale$",
    r"text_projection",
)


def _merge_indices(key: str) -> Tuple[str, ...]:
    """'down_blocks.0.resnets.1.conv1.weight' ->
    ('down_blocks_0', 'resnets_1', 'conv1', 'weight')."""
    parts: list[str] = []
    for comp in key.split("."):
        if re.fullmatch(r"\d+", comp) and parts:
            parts[-1] = f"{parts[-1]}_{comp}"
        else:
            parts.append(comp)
    return tuple(parts)


def _convert_leaf(path: Tuple[str, ...], value: np.ndarray) -> Tuple[Tuple[str, ...], np.ndarray]:
    *prefix, leaf = path
    embed_parents = {"token_embedding", "position_embedding", "shared", "embed_tokens"}
    if leaf == "weight":
        if prefix and prefix[-1] in embed_parents:
            return (*prefix, "embedding"), value
        if value.ndim == 4:  # conv OIHW -> HWIO
            return (*prefix, "kernel"), value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear out,in -> in,out
            return (*prefix, "kernel"), value.T
        if value.ndim == 1:  # norm scale
            return (*prefix, "scale"), value
        raise ValueError(f"Unexpected weight ndim {value.ndim} at {path}")
    if leaf == "bias":
        return (*prefix, "bias"), value
    return path, value


def convert_state_dict(
    state_dict: Mapping[str, Any],
    renames: Iterable[Tuple[str, str]] = (),
    dtype=np.float32,
) -> Dict[str, Any]:
    """Convert a torch state dict into a nested flax ``{"params": ...}`` tree."""
    tree: Dict[str, Any] = {}
    for key, value in state_dict.items():
        if any(re.search(p, key) for p in _SKIP_PATTERNS):
            continue
        renamed = key
        for pat, repl in renames:
            renamed = re.sub(pat, repl, renamed)
        path = _merge_indices(renamed)
        path, arr = _convert_leaf(path, _to_numpy(value))
        node = tree
        for comp in path[:-1]:
            node = node.setdefault(comp, {})
        node[path[-1]] = arr.astype(dtype)
    return {"params": tree}


def convert_unet(state_dict: Mapping[str, Any], dtype=np.float32) -> Dict[str, Any]:
    """diffusers UNet2DConditionModel state dict -> UNet2DCondition params."""
    return convert_state_dict(state_dict, renames=(), dtype=dtype)


def convert_vae(state_dict: Mapping[str, Any], dtype=np.float32) -> Dict[str, Any]:
    """diffusers AutoencoderKL state dict -> AutoencoderKL params."""
    return convert_state_dict(state_dict, renames=_VAE_ATTN_RENAMES, dtype=dtype)


def convert_clip_text(state_dict: Mapping[str, Any], dtype=np.float32) -> Dict[str, Any]:
    """transformers CLIPTextModel state dict -> ClipTextEncoder params."""
    return convert_state_dict(state_dict, renames=_CLIP_RENAMES, dtype=dtype)


def convert_flux(state_dict: Mapping[str, Any], dtype=np.float32) -> Dict[str, Any]:
    """diffusers FluxTransformer2DModel state dict -> FluxTransformer params."""
    return convert_state_dict(state_dict, renames=_FLUX_RENAMES, dtype=dtype)


def assert_tree_matches(converted: Dict[str, Any], initialized: Dict[str, Any], path=""):
    """Sanity check: converted tree has the same structure/shapes as an
    init()-produced tree.  Raises with the offending path."""
    ck, ik = set(converted.keys()), set(initialized.keys())
    if ck != ik:
        raise ValueError(f"Key mismatch at '{path}': only-converted={sorted(ck - ik)} only-init={sorted(ik - ck)}")
    for k in converted:
        c, i = converted[k], initialized[k]
        if isinstance(c, dict) != isinstance(i, dict):
            raise ValueError(f"Node/leaf mismatch at '{path}/{k}'")
        if isinstance(c, dict):
            assert_tree_matches(c, i, f"{path}/{k}")
        elif tuple(np.shape(c)) != tuple(np.shape(i)):
            raise ValueError(
                f"Shape mismatch at '{path}/{k}': converted {np.shape(c)} vs init {np.shape(i)}"
            )
