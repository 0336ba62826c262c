"""Editing-dataset preparation (OmniEdit-style -> teacher layout).

Rebuild of edit_ppo/edit_pretrain/prepare_data.py:14-43: center-crop
reference images to a square resolution and pair them with edit
instructions.  The reference streams 2000 samples from the HF hub; here the
source is a local folder of images + a jsonl/txt of instructions (or any
iterator), producing the inputs that data/teacher_gen + the edit teacher
rollout turn into training .npz samples.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


def center_crop_resize(image: np.ndarray, size: int) -> np.ndarray:
    """[H,W,3] uint8/float -> [size,size,3] float32 in [0,1]."""
    from PIL import Image

    img = Image.fromarray(
        image.astype(np.uint8) if image.dtype != np.uint8 else image
    )
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.LANCZOS)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, np.float32) / 255.0


def read_instruction_records(root: str) -> List[dict]:
    """``{"path", "instruction", "key"}`` records from either
    ``metadata.jsonl`` or sidecar .txt files next to images.

    Handles the real kontext-bench layout exactly as the reference does
    (edit_ppo/generate_ours.py:18-19,50-63): entries carry ``file_name`` /
    ``instruction`` / ``key``, and the image lives at
    ``<root>/images/<basename(file_name)>``.  Generic layouts
    ({"image"|"ref_image": ..., "instruction"|"prompt"|"edit": ...} with the
    image relative to ``root``) keep working; entries whose image file does
    not exist are skipped (generate_ours.py:62-64)."""
    jsonl = os.path.join(root, "metadata.jsonl")
    records: List[dict] = []
    if os.path.exists(jsonl):
        with open(jsonl) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                img = rec.get("image") or rec.get("ref_image") or rec.get("file_name")
                instr = rec.get("instruction") or rec.get("prompt") or rec.get("edit")
                if not (img and instr):
                    continue
                path = os.path.join(root, img)
                if not os.path.exists(path):
                    # kontext-bench: images/ subdir, basename only
                    alt = os.path.join(root, "images", os.path.basename(img))
                    if not os.path.exists(alt):
                        continue
                    path = alt
                records.append(
                    {"path": path, "instruction": instr, "key": rec.get("key")}
                )
        return records
    for f in sorted(os.listdir(root)):
        if f.lower().endswith((".png", ".jpg", ".jpeg")):
            txt = os.path.join(root, os.path.splitext(f)[0] + ".txt")
            if os.path.exists(txt):
                with open(txt) as fh:
                    records.append({
                        "path": os.path.join(root, f),
                        "instruction": fh.read().strip(),
                        "key": None,
                    })
    return records


def read_instruction_pairs(root: str) -> List[Tuple[str, str]]:
    """(image_path, instruction) pairs — see :func:`read_instruction_records`."""
    return [(r["path"], r["instruction"]) for r in read_instruction_records(root)]


def prepare_edit_set(
    source_dir: str,
    output_dir: str,
    resolution: int = 1024,
    max_samples: Optional[int] = None,
) -> int:
    """Write ``{i}.npz`` with (ref_image in [-1,1], instruction str) pairs;
    the teacher rollout (pipelines/edit with the full-step solver) then adds
    (noise, latent) to complete the training samples."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    pairs = read_instruction_pairs(source_dir)[:max_samples]
    n = 0
    for i, (img_path, instruction) in enumerate(pairs):
        try:
            image = np.asarray(Image.open(img_path).convert("RGB"))
            cropped = center_crop_resize(image, resolution) * 2.0 - 1.0
            np.savez(
                os.path.join(output_dir, f"{i:06d}.npz"),
                ref_image=cropped.astype(np.float32),
                instruction=np.asarray(instruction),
            )
            n += 1
        except Exception:
            continue
    return n
