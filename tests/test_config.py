from chitu_tpu.config import list_model_cards, load_config, load_model_card


def test_default_config():
    cfg = load_config()
    assert cfg.models.name == "tiny-llama-debug"
    assert cfg.infer.max_seq_len == 2048
    assert cfg.scheduler.policy == "prefill_first"


def test_overrides():
    cfg = load_config(
        overrides=[
            "models=DeepSeek-R1",
            "infer.tp_size=8",
            "infer.soft_fp8=true",
            "infer.decode_buckets=1,4,8",
            "request.max_new_tokens=64",
        ]
    )
    assert cfg.models.type == "deepseek-v3"
    assert cfg.models.moe.n_routed_experts == 256
    assert cfg.models.mla.kv_lora_rank == 512
    assert cfg.models.rope_scaling.kind == "yarn"
    assert cfg.infer.tp_size == 8
    assert cfg.infer.soft_fp8 is True
    assert cfg.infer.decode_buckets == (1, 4, 8)
    assert cfg.request.max_new_tokens == 64


def test_all_cards_parse():
    for name in list_model_cards():
        card = load_model_card(name)
        assert card.dim > 0 and card.n_layers > 0
        assert isinstance(card.norm_eps, float)
        assert isinstance(card.rope_theta, float)


def test_moe_cards():
    mix = load_model_card("Mixtral-8x7B-Instruct-v0.1")
    assert mix.moe.n_routed_experts == 8
    assert mix.moe.n_activated_experts == 2
    ds = load_model_card("DeepSeek-R1")
    assert ds.moe.score_func == "sigmoid"
    assert ds.moe.n_expert_groups == 8
    assert ds.weight_dtype == "float8_e4m3fn"
