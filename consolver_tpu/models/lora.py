"""LoRA loading/merging for the distilled baselines.

The reference evaluates distilled methods (LCM @ 1-8 steps, BASELINE.md)
by applying LCM-LoRA weights to the SD UNet (gen_ppo.py load_pipeline takes
``lcm_lora_path``; the kohya conversion helper at gen_ppo.py:92-106).
On TPU we merge LoRA deltas into the converted flax params once at load
time: W' = W + scale * (alpha / r) * B @ A — merged weights run at full
speed with zero runtime overhead.

Supports both diffusers-style peft keys
(``...processor.to_q_lora.down.weight`` / ``lora_A``/``lora_B``) and
kohya-style (``lora_unet_..._lora_down``/``_lora_up`` + ``.alpha``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().float()
        return v.numpy()
    return np.asarray(v, np.float32)


def collect_lora_pairs(state_dict: Mapping[str, Any]) -> Dict[str, Tuple[np.ndarray, np.ndarray, float]]:
    """Group LoRA tensors into {base_module_key: (down/A [r,in], up/B [out,r],
    alpha_scale)}.  base_module_key is the dotted diffusers module path."""
    downs, ups, alphas = {}, {}, {}
    for key, value in state_dict.items():
        k = key
        # kohya: lora_unet_down_blocks_0_..._lora_down.weight
        if k.startswith("lora_unet_"):
            k = k[len("lora_unet_"):]
            if k.endswith(".alpha"):
                alphas[k[: -len(".alpha")].replace("_lora", "")] = float(_to_numpy(value))
                continue
            m = re.match(r"(.*)_lora_(down|up)\.weight$", k)
            if not m:
                continue
            base, kind = m.group(1), m.group(2)
            (downs if kind == "down" else ups)[base] = _to_numpy(value)
            continue
        # peft/diffusers: <path>.lora_A.weight / lora_B.weight
        m = re.match(r"(.*)\.lora_A(?:\.default)?\.weight$", k)
        if m:
            downs[m.group(1)] = _to_numpy(value)
            continue
        m = re.match(r"(.*)\.lora_B(?:\.default)?\.weight$", k)
        if m:
            ups[m.group(1)] = _to_numpy(value)
            continue
        # old diffusers attn-processor style: <path>_lora.down.weight
        m = re.match(r"(.*)_lora\.down\.weight$", k)
        if m:
            downs[m.group(1)] = _to_numpy(value)
            continue
        m = re.match(r"(.*)_lora\.up\.weight$", k)
        if m:
            ups[m.group(1)] = _to_numpy(value)
            continue
        if k.endswith(".alpha"):
            alphas[k[: -len(".alpha")]] = float(_to_numpy(value))

    pairs = {}
    for base, down in downs.items():
        up = ups.get(base)
        if up is None:
            continue
        r = down.shape[0]
        alpha = alphas.get(base, float(r))
        pairs[base] = (down, up, alpha / r)
    return pairs


def _flax_path(base_key: str) -> Tuple[str, ...]:
    """diffusers/kohya module path -> our flax param path components."""
    key = base_key.replace("_lora", "")
    # kohya uses underscores throughout; normalize known separators back to
    # dots so the standard index-merge applies
    key = re.sub(r"processor\.?", "", key)
    key = key.replace("to_out.0", "to_out_0").replace("to_out_lora", "to_out_0")
    from consolver_tpu.models.convert import _merge_indices

    if "." in key:
        return _merge_indices(key)
    # kohya underscore-style: down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q
    m = re.match(
        r"(down_blocks|up_blocks|mid_block)_?(\d+)?_attentions_(\d+)_transformer_blocks_(\d+)_(attn\d)_(to_\w+?)(?:_0)?$",
        key,
    )
    if m:
        blk, bi, ai, ti, attn, proj = m.groups()
        path = [f"{blk}_{bi}" if bi is not None else blk, f"attentions_{ai}",
                f"transformer_blocks_{ti}", attn,
                "to_out_0" if proj.startswith("to_out") else proj]
        return tuple(path)
    raise KeyError(f"Cannot map LoRA key {base_key!r} to a flax path")


def merge_lora(params: Dict[str, Any], lora_state: Mapping[str, Any], scale: float = 1.0) -> Dict[str, Any]:
    """Return params with LoRA deltas merged into the matching kernels.

    Unmatched LoRA modules raise (silent drops would change quality
    invisibly).  params is the {'params': tree} from models/convert.py.
    """
    import jax

    tree = jax.tree.map(lambda x: np.array(x), params)  # copy
    root = tree["params"]
    for base, (down, up, alpha_scale) in collect_lora_pairs(lora_state).items():
        path = _flax_path(base)
        node = root
        for comp in path[:-1]:
            if comp not in node:
                raise KeyError(f"LoRA target path {path} missing at {comp!r}")
            node = node[comp]
        leaf_name = path[-1]
        if leaf_name not in node:
            raise KeyError(f"LoRA target {path} not found")
        leaf = node[leaf_name]
        kern = leaf["kernel"] if isinstance(leaf, dict) else leaf
        delta = (up @ down) * (alpha_scale * scale)  # [out, in] torch layout
        kern = kern + delta.T  # flax kernel is [in, out]
        if isinstance(leaf, dict):
            leaf["kernel"] = kern
        else:
            node[leaf_name] = kern
    return tree
