"""Tiny local LLaVA checkpoint builder — shared by the test fixture
(conftest.tiny_llava_ckpt) and the eval selftest (scripts/selftest_eval.py)
as the drive target for the transformers VLM-judge glue (rewards/vlm.py)."""

from __future__ import annotations


def build_tiny_llava(ckpt_dir: str) -> str:
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
    model.save_pretrained(ckpt_dir)
    proc.save_pretrained(ckpt_dir)
    return ckpt_dir
