"""Constrained (legal-set) decoding: models/generation.py::generate_constrained.

The serving-side composition of an env's legal-action set into the decode
loop (VERDICT r4 item 4). Decoding must (a) only ever emit token sequences
from the per-row proposal set, (b) still follow the guided logits WITHIN
the legal set, (c) terminate each completed proposal via eos.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lmrl_gym_tpu.algos.value_policy import ValueGuidedServer, ValueRLParams
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.generation import SamplingConfig, generate_constrained
from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

PAD = 0
EOS = 10  # '\n' in byte vocab


def _const_logits_fn(V, bias_fn):
    """logits_fn ignoring the cache: per-step logits from bias_fn(t)."""

    def logits_fn(tokens, attn_mask, carry):
        t = carry
        B, T = tokens.shape
        logits = jnp.broadcast_to(bias_fn(t), (B, T, V)).astype(jnp.float32)
        return logits, t + 1
    return logits_fn


def test_output_always_in_proposal_set():
    V = 32
    # logits prefer token 7 everywhere, but 7 is never legal
    logits_fn = _const_logits_fn(V, lambda t: jnp.zeros(V).at[7].set(100.0))
    # proposals: [3, 4, EOS] and [5, EOS]
    cands = jnp.asarray(
        [[[3, 4, EOS], [5, EOS, PAD]]] * 4, jnp.int32
    )  # [B=4, P=2, L=3]
    cmask = jnp.ones((4, 2), bool)
    prompt = jnp.full((4, 2), 1, jnp.int32)
    cfg = SamplingConfig(max_new_tokens=5, greedy=True, eos_token_id=EOS, pad_token_id=PAD)
    toks, mask = generate_constrained(
        logits_fn, jnp.asarray(0), prompt, jnp.ones_like(prompt), jax.random.PRNGKey(0),
        cfg, cands, cmask,
    )
    for row, mrow in zip(np.asarray(toks), np.asarray(mask)):
        emitted = [int(t) for t, m in zip(row, mrow) if m]
        assert emitted in ([3, 4, EOS], [5, EOS]), emitted


def test_greedy_picks_best_legal_token():
    V = 32
    # prefers 5 > 3 > everything; both legal at step 0 → picks 5-branch
    logits_fn = _const_logits_fn(
        V, lambda t: jnp.zeros(V).at[5].set(2.0).at[3].set(1.0)
    )
    cands = jnp.asarray([[[3, 4, EOS], [5, EOS, PAD]]], jnp.int32)
    cmask = jnp.ones((1, 2), bool)
    prompt = jnp.full((1, 2), 1, jnp.int32)
    cfg = SamplingConfig(max_new_tokens=4, greedy=True, eos_token_id=EOS, pad_token_id=PAD)
    toks, mask = generate_constrained(
        logits_fn, jnp.asarray(0), prompt, jnp.ones_like(prompt), jax.random.PRNGKey(0),
        cfg, cands, cmask,
    )
    emitted = [int(t) for t, m in zip(toks[0], mask[0]) if m]
    assert emitted == [5, EOS]


def test_trie_disambiguation_mid_sequence():
    V = 32
    # proposals share prefix 3: [3, 4, EOS] vs [3, 6, EOS]; step-1 logits
    # prefer 6 → must follow the 6-branch, never mix
    logits_fn = _const_logits_fn(
        V, lambda t: jnp.zeros(V).at[6].set(3.0).at[4].set(1.0).at[3].set(0.5)
    )
    cands = jnp.asarray([[[3, 4, EOS], [3, 6, EOS]]], jnp.int32)
    cmask = jnp.ones((1, 2), bool)
    prompt = jnp.full((1, 2), 1, jnp.int32)
    cfg = SamplingConfig(max_new_tokens=4, greedy=True, eos_token_id=EOS, pad_token_id=PAD)
    toks, mask = generate_constrained(
        logits_fn, jnp.asarray(0), prompt, jnp.ones_like(prompt), jax.random.PRNGKey(0),
        cfg, cands, cmask,
    )
    emitted = [int(t) for t, m in zip(toks[0], mask[0]) if m]
    assert emitted == [3, 6, EOS]


def test_sampled_decode_stays_legal():
    V = 64
    logits_fn = _const_logits_fn(V, lambda t: jnp.zeros(V))  # uniform
    cands = jnp.asarray(
        [[[3, 4, EOS], [5, EOS, PAD], [7, 8, EOS]]] * 8, jnp.int32
    )
    cmask = jnp.ones((8, 3), bool)
    prompt = jnp.full((8, 2), 1, jnp.int32)
    cfg = SamplingConfig(
        max_new_tokens=4, greedy=False, temperature=1.0,
        eos_token_id=EOS, pad_token_id=PAD,
    )
    legal = ([3, 4, EOS], [5, EOS], [7, 8, EOS])
    seen = set()
    for seed in range(4):
        toks, mask = generate_constrained(
            logits_fn, jnp.asarray(0), prompt, jnp.ones_like(prompt),
            jax.random.PRNGKey(seed), cfg, cands, cmask,
        )
        for row, mrow in zip(np.asarray(toks), np.asarray(mask)):
            emitted = tuple(int(t) for t, m in zip(row, mrow) if m)
            assert list(emitted) in [list(x) for x in legal], emitted
            seen.add(emitted)
    assert len(seen) >= 2  # sampling actually explores the set


def test_guided_server_generate_from_strs_legal():
    """End-to-end through ValueGuidedServer: a real tiny trunk + Q heads,
    proposal strings in, decoded action out — must equal one of the
    proposals verbatim."""
    tok = ByteTokenizer()
    config = tiny_test_config(hidden_size=32, num_layers=1, num_heads=2)
    core = LMCore(config)
    q_cfg = MLPHeadConfig(
        input_dim=32, hidden_dim=64, output_dim=config.padded_vocab_size,
        layer2_initializer_range=0.0,
    )
    v_cfg = MLPHeadConfig(
        input_dim=32, hidden_dim=64, output_dim=1, layer2_initializer_range=0.0
    )
    q_head, v_head = MLPHead(q_cfg), MLPHead(v_cfg)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params = ValueRLParams(
        pi_beta=init_params(config, ks[0]),
        base=init_params(config, ks[1]),
        q1_head=init_head_params(q_head, 32, ks[2]),
        q2_head=init_head_params(q_head, 32, ks[3]),
        v_head=init_head_params(v_head, 32, ks[3]),
    )
    server = ValueGuidedServer(core, q_head, v_head, tok, beta=4.0)
    sampling = SamplingConfig(
        max_new_tokens=16, greedy=True, eos_token_id=10,
        pad_token_id=tok.pad_token_id,
    )
    proposals = [
        ["move up\n", "move down\n"],
        ["move left\n", "move right\n"],
    ]
    outs = server.generate_from_strs_legal(
        params, ["state A:", "state B:"], proposals, 32, sampling,
        jax.random.PRNGKey(1), max_proposals=4, max_proposal_len=16,
    )
    assert outs[0] in proposals[0]
    assert outs[1] in proposals[1]
