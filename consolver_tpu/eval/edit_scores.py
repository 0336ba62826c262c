"""EditScore / EditReward evaluation harness for the kontext-bench layout.

Rebuild of edit_ppo/compute_score.py and edit_ppo/compute_reward.py: the
reference shards result folders over 8 GPUs and scores each example
(ref_image.jpg, instruction.txt, edited_image.jpg) with external VLM scorer
repos (guarded by ``assert 0`` until cloned).  Here the folder protocol and
aggregation are first-class and the scorer is a pluggable callable — wire in
consolver_tpu.rewards.vlm.load_transformers_judge or any local scorer.
Also covers the benchmark result writer used by generate_ours.py /
generate_pretrain.py (folder-per-example outputs).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np

EXAMPLE_FILES = ("ref_image.jpg", "instruction.txt", "edited_image.jpg")


def write_example(
    out_dir: str, name: str, ref_image01: np.ndarray, instruction: str,
    edited_image01: np.ndarray,
) -> str:
    """Write one folder-per-example result (edit_ppo/generate_ours.py
    output layout consumed by the scorers)."""
    from consolver_tpu.eval.gen_sweep import save_png

    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    save_png(os.path.join(d, "ref_image.jpg"), ref_image01)
    with open(os.path.join(d, "instruction.txt"), "w") as f:
        f.write(instruction)
    save_png(os.path.join(d, "edited_image.jpg"), edited_image01)
    return d


def list_examples(results_dir: str) -> List[str]:
    out = []
    for name in sorted(os.listdir(results_dir)):
        d = os.path.join(results_dir, name)
        if os.path.isdir(d) and all(os.path.exists(os.path.join(d, f)) for f in EXAMPLE_FILES):
            out.append(d)
    return out


def score_results(
    results_dir: str,
    scorer: Callable[[np.ndarray, str, np.ndarray], float],
    output_json: Optional[str] = None,
) -> Dict[str, float]:
    """scorer(ref_image01, instruction, edited_image01) -> scalar score.
    Returns mean/std/count aggregates (compute_score.py:57-65 shape)."""
    from consolver_tpu.eval.consistency import _load_image

    dirs = list_examples(results_dir)
    if not dirs:
        raise FileNotFoundError(f"No scored examples under {results_dir}")
    scores, errors = [], 0
    for d in dirs:
        try:
            ref = _load_image(os.path.join(d, "ref_image.jpg"))
            edited = _load_image(os.path.join(d, "edited_image.jpg"))
            with open(os.path.join(d, "instruction.txt")) as f:
                instruction = f.read().strip()
            scores.append(float(scorer(ref, instruction, edited)))
        except Exception:
            errors += 1
    arr = np.asarray(scores)
    stats = {
        "num_examples": len(dirs),
        "num_scored": len(scores),
        "num_errors": errors,
        "mean": float(arr.mean()) if len(arr) else float("nan"),
        "std": float(arr.std()) if len(arr) else float("nan"),
    }
    if output_json:
        with open(output_json, "w") as f:
            json.dump(stats, f, indent=2)
    return stats
