import json
import os

import numpy as np
import pytest

from consolver_tpu.data.edit_prep import (
    center_crop_resize,
    prepare_edit_set,
    read_instruction_pairs,
)
from consolver_tpu.data.prompts import read_prompts


class TestPrompts:
    def test_parquet(self, tmp_path):
        pd = pytest.importorskip("pandas")
        p = tmp_path / "prompts.parquet"
        pd.DataFrame({"TEXT": ["a cat", "a dog", None, "a bird"]}).to_parquet(p)
        assert read_prompts(str(p)) == ["a cat", "a dog", "a bird"]
        assert read_prompts(str(p), max_prompts=2) == ["a cat", "a dog"]

    def test_text(self, tmp_path):
        p = tmp_path / "p.txt"
        p.write_text("one\n\ntwo\n")
        assert read_prompts(str(p)) == ["one", "two"]

    def test_coco_json(self, tmp_path):
        p = tmp_path / "captions.json"
        p.write_text(json.dumps({
            "annotations": [
                {"image_id": 2, "caption": "b"},
                {"image_id": 1, "caption": "a"},
                {"image_id": 1, "caption": "a2"},
            ],
            "images": [],
        }))
        assert read_prompts(str(p)) == ["a", "b"]


class TestEditPrep:
    def test_center_crop(self):
        img = np.zeros((100, 200, 3), np.uint8)
        img[:, 50:150] = 255
        out = center_crop_resize(img, 64)
        assert out.shape == (64, 64, 3)
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_prepare_from_sidecars(self, tmp_path):
        from PIL import Image

        for i in range(3):
            Image.fromarray(
                np.full((80, 120, 3), 40 * i, np.uint8)
            ).save(tmp_path / f"img{i}.png")
            (tmp_path / f"img{i}.txt").write_text(f"edit {i}")
        out = tmp_path / "out"
        n = prepare_edit_set(str(tmp_path), str(out), resolution=32)
        assert n == 3
        with np.load(out / "000001.npz") as z:
            assert z["ref_image"].shape == (32, 32, 3)
            assert -1.0 <= z["ref_image"].min() and z["ref_image"].max() <= 1.0
            assert str(z["instruction"]) == "edit 1"

    def test_jsonl_pairs(self, tmp_path):
        from PIL import Image

        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(tmp_path / "a.png")
        (tmp_path / "metadata.jsonl").write_text(
            json.dumps({"image": "a.png", "instruction": "make it red"}) + "\n"
        )
        pairs = read_instruction_pairs(str(tmp_path))
        assert len(pairs) == 1 and pairs[0][1] == "make it red"

    def test_kontext_bench_layout(self, tmp_path):
        """Real kontext-bench layout (edit_ppo/generate_ours.py:18-19,50-63):
        metadata.jsonl with file_name/instruction/key, image under images/,
        missing images skipped."""
        from PIL import Image

        from consolver_tpu.data.edit_prep import read_instruction_records

        (tmp_path / "images").mkdir()
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
            tmp_path / "images" / "0001.jpg"
        )
        lines = [
            {"file_name": "some/prefix/0001.jpg", "instruction": "add a hat",
             "key": "k_0001"},
            {"file_name": "missing.jpg", "instruction": "skip me", "key": "k2"},
            {"file_name": "images/0001.jpg", "instruction": "no key"},
        ]
        (tmp_path / "metadata.jsonl").write_text(
            "\n".join(json.dumps(r) for r in lines) + "\n"
        )
        recs = read_instruction_records(str(tmp_path))
        assert len(recs) == 2
        assert recs[0]["key"] == "k_0001"
        assert recs[0]["instruction"] == "add a hat"
        assert os.path.exists(recs[0]["path"])
        assert recs[1]["key"] is None  # generic entry falls back
