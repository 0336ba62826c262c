"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native replacement for "test DDP without a cluster"
(SURVEY.md section 4): multi-chip sharding is validated with
xla_force_host_platform_device_count on CPU, while real-TPU benchmarking is
done separately by bench.py.

The ambient environment pins JAX_PLATFORMS to the TPU plugin, which ignores
a plain env override — so we also set the config flag after importing jax
(before any backend is initialized).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the e2e tests are compile-bound (tiny-stack
# XLA compiles dominate the suite), so repeat runs load cached executables
# (~4.5x faster second run).  Keyed by HLO hash — code changes simply miss
# and recompile.  Opt out with CONSOLVER_JAX_CACHE=0.
if os.environ.get("CONSOLVER_JAX_CACHE", "1") != "0":
    _cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_compilation_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    # persist EVERYTHING: the suite dispatches hundreds of small eager ops
    # (flax inits, host-side schedule math) whose compiles are individually
    # <0.5s but sum to ~40% of some tests; caching them is a big win on the
    # single-core CI box
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_llava_ckpt(tmp_path_factory):
    """A real (tiny, random-weight) local LLaVA checkpoint: the drive target
    for the transformers VLM-judge glue (rewards/vlm.py)."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import (
        CLIPImageProcessor,
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
        LlavaProcessor,
        PreTrainedTokenizerFast,
    )

    vocab = {f"tok{i}": i for i in range(90)}
    vocab.update({"<unk>": 90, "<s>": 91, "</s>": 92, "50": 93, "0": 94,
                  "1": 95, "ASSISTANT": 96, ":": 97, "score": 98,
                  ".": 99, "<image>": 100})
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    t = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="</s>",
    )
    t.add_tokens(["<image>"])
    t.model_input_names = ["input_ids", "attention_mask"]

    vcfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
    )
    tcfg = LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, vocab_size=128, max_position_embeddings=512,
    )
    cfg = LlavaConfig(
        vision_config=vcfg, text_config=tcfg,
        image_token_index=t.convert_tokens_to_ids("<image>"),
    )
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg)
    chat = (
        "{% for message in messages %}{% for c in message['content'] %}"
        "{% if c['type']=='image' %}<image>{% elif c['type']=='text' %}"
        "{{ c['text'] }}{% endif %}{% endfor %}{% endfor %}"
        "{% if add_generation_prompt %}ASSISTANT:{% endif %}"
    )
    proc = LlavaProcessor(
        image_processor=CLIPImageProcessor(
            size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32}
        ),
        tokenizer=t, chat_template=chat, patch_size=16,
    )
    ckpt = str(tmp_path_factory.mktemp("vlm") / "tiny_llava")
    model.save_pretrained(ckpt)
    proc.save_pretrained(ckpt)
    return ckpt
