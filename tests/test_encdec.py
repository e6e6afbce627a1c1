"""Encoder-decoder (T5) family: HF logits parity, cached-decode parity,
bucketing semantics, serving, sharding."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lmrl_gym_tpu.algos.value_policy import Seq2SeqServer  # noqa: E402
from lmrl_gym_tpu.models import hf as hf_interop  # noqa: E402
from lmrl_gym_tpu.models.encdec import (  # noqa: E402
    EncDecCore,
    EncoderDecoder,
    init_encdec_params,
    relative_position_bucket,
    tiny_encdec_config,
)
from lmrl_gym_tpu.models.generation import SamplingConfig  # noqa: E402
from lmrl_gym_tpu.models.transformer import mask_pad_logits  # noqa: E402
from lmrl_gym_tpu.parallel.mesh import (  # noqa: E402
    load_mesh,
    match_partition_rules,
    refine_specs_for_shapes,
    shard_pytree,
)
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer  # noqa: E402


def _tiny_hf_t5(proj: str, tied: bool):
    cfg = transformers.T5Config(
        vocab_size=257,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        dropout_rate=0.0,
        feed_forward_proj=proj,
        tie_word_embeddings=tied,
        decoder_start_token_id=0,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    return transformers.T5ForConditionalGeneration(cfg).eval()


@pytest.mark.parametrize(
    "proj,tied",
    [
        # the relu/tied variant dominates the file's wall time; the
        # gated-gelu variant exercises the same parity path
        pytest.param("relu", True, marks=pytest.mark.slow),
        ("gated-gelu", False),
    ],
)
def test_hf_t5_logits_parity(proj, tied):
    """Our T5 must reproduce transformers' torch logits from converted
    weights (both v1.0-relu-tied and v1.1/flan gated-gelu-untied)."""
    hf_model = _tiny_hf_t5(proj, tied)
    config = hf_interop.encdec_config_from_hf(hf_model.config).replace(
        dtype="float32", pad_vocab_to_multiple=1
    )
    params = hf_interop.encdec_params_from_hf_state_dict(hf_model.state_dict(), config)

    enc = np.array([[5, 6, 7, 0], [8, 9, 0, 0]], np.int64)
    em = (enc != 0).astype(np.int64)
    dec = np.array([[0, 11, 12], [0, 13, 14]], np.int64)
    with torch.no_grad():
        want = hf_model(
            input_ids=torch.tensor(enc),
            attention_mask=torch.tensor(em),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()

    model = EncoderDecoder(config)
    got, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(enc, jnp.int32),
        jnp.asarray(em, jnp.int32),
        jnp.asarray(dec, jnp.int32),
        jnp.ones(dec.shape, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_hf_t5_export_roundtrip():
    hf_model = _tiny_hf_t5("relu", True)
    config = hf_interop.encdec_config_from_hf(hf_model.config).replace(
        dtype="float32", pad_vocab_to_multiple=1
    )
    params = hf_interop.encdec_params_from_hf_state_dict(hf_model.state_dict(), config)
    sd = hf_interop.encdec_params_to_hf_state_dict(params, config)
    orig = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    for k, v in orig.items():
        np.testing.assert_allclose(sd[k], v, atol=1e-6, err_msg=k)


def test_cached_decode_matches_full_forward():
    cfg = tiny_encdec_config()
    core = EncDecCore(cfg)
    params = init_encdec_params(cfg, jax.random.PRNGKey(0))
    enc = jnp.array([[5, 6, 7, 0], [8, 9, 0, 0]], jnp.int32)
    em = (enc != 0).astype(jnp.int32)
    dec = jnp.array([[0, 11, 12, 13], [0, 14, 15, 16]], jnp.int32)

    full, _ = core.forward(params, enc, dec, attention_mask=em)
    full = mask_pad_logits(full, cfg.vocab_size)

    logits_fn, cache = core.make_seq2seq_logits_fn(params, enc, em, dec.shape[1])
    mask = jnp.ones(dec.shape, jnp.int32)
    # prefill 2 tokens then single-step the rest
    l01, cache = logits_fn(dec[:, :2], mask, cache)
    steps = [l01[:, 0], l01[:, 1]]
    for t in range(2, dec.shape[1]):
        lt, cache = logits_fn(dec[:, t : t + 1], mask, cache)
        steps.append(lt[:, 0])
    inc = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-4)


def test_relative_position_bucket_semantics():
    # exact values from the T5 bucketing definition
    rp = jnp.arange(-10, 11)
    causal = relative_position_bucket(rp, bidirectional=False, num_buckets=8, max_distance=16)
    # future positions (key > query) clamp to bucket 0
    assert np.all(np.asarray(causal[rp > 0]) == 0)
    # small negative offsets count exactly
    assert int(causal[list(rp).index(-3)]) == 3
    bid = relative_position_bucket(rp, bidirectional=True, num_buckets=8, max_distance=16)
    # symmetric split: positive rel positions land in the upper half
    assert np.all(np.asarray(bid[rp > 0]) >= 4)
    assert int(bid[list(rp).index(0)]) == 0


def test_seq2seq_server_generates():
    cfg = tiny_encdec_config(decoder_start_token_id=256, pad_token_id=256)
    core = EncDecCore(cfg)
    tok = ByteTokenizer()
    params = init_encdec_params(cfg, jax.random.PRNGKey(1))
    server = Seq2SeqServer(core, tok)
    sampling = SamplingConfig(max_new_tokens=8, greedy=True, pad_token_id=tok.pad_token_id)
    outs = server.generate_from_strs(
        params, ["question: up or down?", "q2"], 32, sampling, jax.random.PRNGKey(0)
    )
    assert len(outs) == 2
    assert all(isinstance(o, str) for o in outs)
    # greedy decode is deterministic
    outs2 = server.generate_from_strs(
        params, ["question: up or down?", "q2"], 32, sampling, jax.random.PRNGKey(7)
    )
    assert outs == outs2


def test_lm_oracle_with_seq2seq_server():
    """T5 plugs into the 20Q LM oracle exactly like the reference's
    T5Inference (twenty_questions/env/oracle.py:20-147)."""
    from lmrl_gym_tpu.envs.twenty_questions.data import get_default_word_list
    from lmrl_gym_tpu.envs.twenty_questions.oracle import LMOracle

    cfg = tiny_encdec_config(decoder_start_token_id=256, pad_token_id=256)
    core = EncDecCore(cfg)
    tok = ByteTokenizer()
    params = init_encdec_params(cfg, jax.random.PRNGKey(2))
    server = Seq2SeqServer(core, tok)
    sampling = SamplingConfig(max_new_tokens=4, greedy=True, pad_token_id=tok.pad_token_id)
    oracle = LMOracle(server, params, sampling, max_input_length=64)
    words = get_default_word_list()[:2]
    answers = oracle.generate_answers(words, ["Is it an animal?", "Is it red?"])
    assert all(a in ("Yes.", "No.") for a in answers)


def test_encdec_sharding_on_mesh():
    cfg = tiny_encdec_config()
    mesh = load_mesh((1, 2, 4))
    params = init_encdec_params(cfg, jax.random.PRNGKey(0))
    specs = refine_specs_for_shapes(
        match_partition_rules(cfg.partition_rules(), params), params, mesh
    )
    sharded = shard_pytree(params, specs, mesh)
    core = EncDecCore(cfg)
    enc = jnp.zeros((4, 8), jnp.int32)
    dec = jnp.zeros((4, 4), jnp.int32)
    logits, _ = core.forward(sharded, enc, dec)
    assert logits.shape == (4, 4, cfg.padded_vocab_size)
