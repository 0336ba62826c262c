"""VLM-judge rewards (llava / qwen_vl): host-side generative scoring.

Rebuild of reward_model.py:164-214 (LLaVA) and :259-317 (Qwen2.5-VL): the
judge scores each (prediction, target) pair on four similarity dimensions
0-100, retrying parse failures up to 5 times with a 50.0 fallback.  Judges
are host callables (generative VLMs are services, not jittable graphs) and
plug into rewards.registry.RewardModel.vlm_judge.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional

import numpy as np

# The four judged similarity dimensions (reward_model.py:25-30).
SIMILARITY_DIMENSIONS = (
    "overall visual similarity",
    "structural similarity",
    "color similarity",
    "semantic content similarity",
)

_PROMPT = (
    "Evaluate the {dimension} between these two images on a scale from 0 to "
    "100, where 0 means completely dissimilar and 100 means identical. "
    "Provide only the numerical score."
)


def parse_score(text: str) -> Optional[float]:
    """First number in the generation, clamped to [0, 100]."""
    m = re.search(r"-?\d+(?:\.\d+)?", text)
    if m is None:
        return None
    return float(np.clip(float(m.group()), 0.0, 100.0))


def parse_score_strict(text: str) -> Optional[float]:
    """Qwen-path parse: ``float(generated_text)`` directly
    (edit_ppo/reward_model.py:303-305) — any surrounding text is a parse
    failure (retried), unlike the llava path's first-number regex.
    "nan"/"inf" parse as floats but would poison the reward mean, so they
    count as parse failures too (np.clip propagates NaN)."""
    try:
        value = float(text.strip())
    except ValueError:
        return None
    if not np.isfinite(value):
        return None
    return float(np.clip(value, 0.0, 100.0))


def make_vlm_judge(
    generate_fn: Callable[[np.ndarray, np.ndarray, str], str],
    max_retries: int = 5,
    fallback_score: float = 50.0,
    parse: Callable[[str], Optional[float]] = parse_score,
):
    """Build a RewardModel.vlm_judge from a raw generation callable.

    generate_fn(pred_image [H,W,3] in [0,1], target_image, prompt) -> text.
    Retry-with-fallback mirrors reward_model.py:194-206,288-310; ``parse``
    selects the llava (regex) or qwen (strict float) score extraction.
    """

    def judge(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
        scores: List[float] = []
        for i in range(len(pred)):
            dim_scores = []
            for dimension in SIMILARITY_DIMENSIONS:
                prompt = _PROMPT.format(dimension=dimension)
                score = None
                for _ in range(max_retries):
                    try:
                        text = generate_fn(pred[i], target[i], prompt)
                        score = parse(text)
                        if score is not None:
                            break
                    except Exception:
                        continue
                dim_scores.append(score if score is not None else fallback_score)
            scores.append(float(np.mean(dim_scores)))
        return np.asarray(scores, np.float32)

    return judge


def load_transformers_generate_fn(model_path: str, device: str = "cpu"):
    """Two-image generation callable from a local transformers checkpoint
    (LLaVA-class 'image-text-to-text').  Requires the checkpoint on local
    disk — judges are multi-billion-param hub models the reference also
    loads externally (reward_model.py:67-87)."""
    from transformers import AutoModelForImageTextToText, AutoProcessor

    processor = AutoProcessor.from_pretrained(model_path, local_files_only=True)
    model = AutoModelForImageTextToText.from_pretrained(
        model_path, local_files_only=True
    ).to(device)

    def generate_fn(pred: np.ndarray, target: np.ndarray, prompt: str) -> str:
        import torch
        from PIL import Image

        imgs = [
            Image.fromarray((np.clip(x, 0, 1) * 255).astype(np.uint8))
            for x in (pred, target)
        ]
        messages = [
            {
                "role": "user",
                "content": [
                    {"type": "image"},
                    {"type": "image"},
                    {"type": "text", "text": prompt},
                ],
            }
        ]
        text = processor.apply_chat_template(messages, add_generation_prompt=True)
        inputs = processor(text=[text], images=imgs, return_tensors="pt").to(device)
        with torch.no_grad():
            out = model.generate(**inputs, max_new_tokens=5)
        gen = out[0][inputs["input_ids"].shape[1] :]
        return processor.batch_decode(gen[None], skip_special_tokens=True)[0].strip()

    return generate_fn


def load_transformers_judge(model_path: str, device: str = "cpu"):
    """Similarity judge (rewards) from a local checkpoint — the llava
    reward type (reward_model.py:164-214)."""
    return make_vlm_judge(load_transformers_generate_fn(model_path, device))


def load_transformers_qwen_generate_fn(
    model_path: str, device: str = "cpu", resize: int = 224
):
    """Qwen2.5-VL-style two-image generation callable
    (edit_ppo/reward_model.py:258-317).  Distinct from the llava glue:
    images are resized to 224x224 first, embedded IN the chat messages
    (``{"type": "image", "image": pil}``) and extracted via
    qwen_vl_utils.process_vision_info when that package exists (falling
    back to pulling the PILs straight out of the messages), and the chat
    template is applied with ``tokenize=False``."""
    from transformers import AutoModelForImageTextToText, AutoProcessor

    processor = AutoProcessor.from_pretrained(model_path, local_files_only=True)
    model = AutoModelForImageTextToText.from_pretrained(
        model_path, local_files_only=True
    ).to(device)

    def generate_fn(pred: np.ndarray, target: np.ndarray, prompt: str) -> str:
        import torch
        from PIL import Image

        imgs = [
            Image.fromarray(
                (np.clip(x, 0, 1) * 255).astype(np.uint8)
            ).resize((resize, resize), Image.BILINEAR)
            for x in (pred, target)
        ]
        messages = [
            {
                "role": "user",
                "content": [
                    {"type": "image", "image": imgs[0]},
                    {"type": "image", "image": imgs[1]},
                    {"type": "text", "text": prompt},
                ],
            }
        ]
        text = processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        try:
            from qwen_vl_utils import process_vision_info

            image_inputs, _ = process_vision_info(messages)
        except ImportError:
            image_inputs = imgs
        inputs = processor(
            text=[text], images=image_inputs, padding=True, return_tensors="pt"
        ).to(device)
        with torch.no_grad():
            out = model.generate(**inputs, max_new_tokens=5)
        gen = out[0][inputs["input_ids"].shape[1] :]
        return processor.batch_decode(gen[None], skip_special_tokens=True)[0].strip()

    return generate_fn


def load_transformers_qwen_judge(model_path: str, device: str = "cpu"):
    """Qwen-variant similarity judge: qwen message format + 224x224 resize
    + strict float parse — the qwen_vl reward type
    (edit_ppo/reward_model.py:258-317)."""
    return make_vlm_judge(
        load_transformers_qwen_generate_fn(model_path, device),
        parse=parse_score_strict,
    )


# EditScore-style instruction-following prompt (the role of the external
# EditScore/EditReward scorers, edit_ppo/compute_score.py — 0-10 scale like
# the published EditScore column, assets/flux-kontext.png).
_EDIT_PROMPT = (
    "The first image is the original and the second is an edited version "
    'following the instruction: "{instruction}". Rate from 0 to 10 how well '
    "the edit fulfils the instruction while preserving everything else. "
    "Provide only the numerical score."
)


def make_edit_scorer(
    generate_fn: Callable[[np.ndarray, np.ndarray, str], str],
    max_retries: int = 5,
    fallback_score: float = 5.0,
):
    """(ref_image01, instruction, edited_image01) -> 0-10 score, pluggable
    into eval.edit_scores.score_results; retry-with-fallback like the
    similarity judges."""

    def scorer(ref: np.ndarray, instruction: str, edited: np.ndarray) -> float:
        prompt = _EDIT_PROMPT.format(instruction=instruction)
        for _ in range(max_retries):
            try:
                score = parse_score(generate_fn(ref, edited, prompt))
                if score is not None:
                    return float(np.clip(score, 0.0, 10.0))
            except Exception:
                continue
        return fallback_score

    return scorer


def load_transformers_edit_scorer(model_path: str, device: str = "cpu"):
    """Local-checkpoint EditScore stand-in for score_results."""
    return make_edit_scorer(load_transformers_generate_fn(model_path, device))
