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


@pytest.mark.slow
def test_edit_teacher_chain_feeds_trainer(tmp_path):
    """Full FLUX data pipeline (edit_pretrain prepare_data.py + generate.py):
    prepare (ref, instruction) -> full-step edit teacher rollout ->
    TeacherDataset batches -> EditPPOTrainer.train_step."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from consolver_tpu.data.group import TeacherDataset
    from consolver_tpu.data.teacher_gen import generate_edit_teacher_set
    from consolver_tpu.rewards.registry import make_reward_fn
    from consolver_tpu.rl.ppo import PPOConfig
    from consolver_tpu.rl.train import TrainConfig
    from consolver_tpu.rl.train_edit import EditPPOTrainer

    # source images + sidecar instructions -> prepared npz
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (20, 20, 3), dtype=np.uint8), "RGB"
        ).save(src / f"im{i}.png")
        (src / f"im{i}.txt").write_text(f"make it {i}")
    prepared = tmp_path / "prepared"
    assert prepare_edit_set(str(src), str(prepared), resolution=16) == 3

    # tiny pipe (same construction as the edit tests)
    from tests.test_edit import pipe as pipe_fixture  # noqa: F401

    request_pipe = pipe_fixture.__wrapped__()  # call the undecorated fixture fn
    vae_factor = 2 ** (len(request_pipe.vae.cfg.block_out_channels) - 1)
    latent = 16 // vae_factor

    def tokenize(instructions):
        b = len(instructions)
        return (np.ones((b, 4), np.int32), np.ones((b, 4), np.int32))

    def teacher_denoise(key, noise, t5_ids, clip_ids, ref):
        latents, _ = request_pipe(
            key, t5_ids, clip_ids, ref, noise, num_inference_steps=3,
            guidance_scale=2.5, solver="euler", decode=False,
        )
        return latents

    teacher = tmp_path / "teacher"
    n = generate_edit_teacher_set(
        teacher_denoise, tokenize, str(prepared), str(teacher),
        noise_shape=(latent, latent, 4), batch_size=2, seed=42,
        decode_fn=request_pipe.decode_latents, save_sanity_images=1,
    )
    assert n == 3
    import glob
    assert glob.glob(str(teacher / "sanity_*.png"))

    ds = TeacherDataset(str(teacher))
    batch = next(ds.batches(batch_size=3))
    assert set(batch) >= {"noise", "latent", "ref_image", "t5_ids", "clip_ids"}
    assert batch["ref_image"].shape == (3, 16, 16, 3)

    trainer = EditPPOTrainer(
        request_pipe, make_reward_fn("image_psnr"),
        TrainConfig(min_inference_steps=2, max_inference_steps=3,
                    output_dir=str(tmp_path / "run"),
                    ppo=PPOConfig(ppo_epochs=1)),
    )
    metrics = trainer.train_step(
        {k: v for k, v in batch.items() if k != "instruction"}
    )
    assert np.isfinite(metrics["loss"]) and np.isfinite(metrics["reward"])


class TestGroupConstruction:
    """repeat_random_sample_groups: the per-rank group structure of the
    reference's DDP runs (edit_ppo/train_ppo.py:258-326)."""

    def test_single_group_tiles_one_sample(self):
        import random

        from consolver_tpu.data.group import repeat_random_sample

        batch = {"x": np.arange(12).reshape(4, 3)}
        out = repeat_random_sample(batch, random.Random(0))
        assert out["x"].shape == (4, 3)
        assert (out["x"] == out["x"][0]).all()

    def test_groups_are_independent_tiles(self):
        import random

        from consolver_tpu.data.group import repeat_random_sample_groups

        batch = {"x": np.arange(8)[:, None] * np.ones((1, 3))}
        out = repeat_random_sample_groups(batch, random.Random(3), 4)
        x = out["x"]
        assert x.shape == (8, 3)
        for g in range(4):
            chunk = x[2 * g : 2 * g + 2]
            # tiled within the group...
            assert (chunk == chunk[0]).all()
            # ...and drawn from the group's own contiguous shard
            assert 2 * g <= chunk[0, 0] < 2 * g + 2

    def test_indivisible_batch_raises(self):
        import random

        from consolver_tpu.data.group import repeat_random_sample_groups

        with pytest.raises(ValueError):
            repeat_random_sample_groups(
                {"x": np.zeros((5, 2))}, random.Random(0), 2
            )
