"""HF interop parity: our transformer must reproduce transformers' torch
GPT-2/GPT-J logits exactly (fp32, CPU) from converted weights, and the
export path must round-trip.

Uses locally-constructed random HF models (no downloads; HF_HUB_OFFLINE).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lmrl_gym_tpu.models import hf as hf_interop  # noqa: E402
from lmrl_gym_tpu.models.transformer import Transformer  # noqa: E402


def _tiny_gpt2_hf():
    cfg = transformers.GPT2Config(
        vocab_size=257,
        n_positions=64,
        n_embd=32,
        n_layer=2,
        n_head=4,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    return transformers.GPT2LMHeadModel(cfg).eval()


def _tiny_gptj_hf():
    cfg = transformers.GPTJConfig(
        vocab_size=257,
        n_positions=64,
        n_embd=32,
        n_layer=2,
        n_head=4,
        rotary_dim=8,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    return transformers.GPTJForCausalLM(cfg).eval()


def _tiny_llama_hf():
    cfg = transformers.LlamaConfig(
        vocab_size=257,
        max_position_embeddings=64,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        intermediate_size=48,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(2)
    return transformers.LlamaForCausalLM(cfg).eval()


_FAMILIES = {"gpt2": _tiny_gpt2_hf, "gptj": _tiny_gptj_hf, "llama": _tiny_llama_hf}


@pytest.mark.parametrize("family", ["gpt2", "gptj", "llama"])
def test_hf_import_logits_parity(family):
    hf_model = _FAMILIES[family]()
    config = hf_interop.config_from_hf(hf_model.config).replace(
        dtype="float32", pad_vocab_to_multiple=64, use_flash_attention=False
    )
    params = hf_interop.params_from_hf_state_dict(hf_model.state_dict(), config)

    ids = np.array([[3, 9, 250, 17, 4, 99, 1, 0], [5, 5, 2, 200, 11, 7, 30, 8]])
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()

    logits, _, _ = Transformer(config).apply(
        {"params": params}, jnp.asarray(ids), deterministic=True
    )
    ours = np.asarray(logits)[:, :, : config.vocab_size]
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)
    # padded vocab columns must be exactly zero-weight contributions
    assert logits.shape[-1] == config.padded_vocab_size


@pytest.mark.parametrize("family", ["gpt2", "gptj", "llama"])
def test_hf_export_roundtrip(family, tmp_path):
    hf_model = _FAMILIES[family]()
    config = hf_interop.config_from_hf(hf_model.config).replace(
        dtype="float32", pad_vocab_to_multiple=64
    )
    params = hf_interop.params_from_hf_state_dict(hf_model.state_dict(), config)

    out = tmp_path / "export"
    hf_interop.export_hf_pretrained(params, config, str(out))
    reloaded = transformers.AutoModelForCausalLM.from_pretrained(str(out)).eval()

    ids = torch.randint(0, 250, (1, 12))
    with torch.no_grad():
        a = hf_model(ids).logits.numpy()
        b = reloaded(ids).logits.numpy()
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_load_hf_pretrained_local_dir(tmp_path):
    hf_model = _tiny_gpt2_hf()
    d = tmp_path / "ckpt"
    hf_model.save_pretrained(str(d))
    config, params = hf_interop.load_hf_pretrained(str(d))
    assert config.vocab_size == 257 and config.num_layers == 2
    assert params["wte"]["embedding"].shape[0] == config.padded_vocab_size
