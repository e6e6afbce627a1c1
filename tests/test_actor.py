"""Fused on-device actor tests (CPU backend via conftest).

- plumbing parity: a scripted fake policy (fixed guess every turn) must
  yield exactly the rewards/feedback of stepping WordleVectorEnv manually
  with the same key stream;
- text parity: the actor's token stream must decode to the same rendering
  the host-side ReformatWordleEnv produces;
- a real tiny LM drives a full rollout end-to-end with consistent masks.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lmrl_gym_tpu.envs.wordle.vector import WordleVectorEnv, WordleVocab
from lmrl_gym_tpu.loops import actor
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer


def _env():
    return WordleVectorEnv(WordleVocab.from_file())


def _scripted_step_fn(word: str, vocab_size: int = 320):
    """Fake policy: always outputs `word` as 'c o p s e\\n' action tokens."""
    pattern = []
    for i, ch in enumerate(word):
        pattern.append(ord(ch))
        pattern.append(10 if i == len(word) - 1 else 32)

    pattern = jnp.asarray(pattern, jnp.int32)  # [10]

    def step_fn(params, tokens, carry):
        B, T = tokens.shape
        if T == 1:  # decode step: advance within the action pattern
            new_carry = (carry + 1) % len(pattern)
        else:  # prefill / obs feed: next token is the action's first
            new_carry = 0
        nxt = pattern[new_carry]
        logits = jnp.full((B, T, vocab_size), -1e9, jnp.float32)
        logits = logits.at[:, :, :].set(-1e9).at[:, -1, nxt].set(0.0)
        return logits, new_carry

    return step_fn, jnp.asarray(9)  # so first advance lands on pattern[0]


def test_scripted_actor_matches_manual_env_stepping():
    env = _env()
    B = 4
    word = "allot"
    step_fn, carry0 = _scripted_step_fn(word)
    key = jax.random.PRNGKey(7)
    out = actor.rollout_wordle(
        env, step_fn, None, carry0, key, jnp.zeros((B,)), 1.0, True
    )

    # replicate the actor's env key stream
    from lmrl_gym_tpu.envs.wordle.vector import encode_word, initial_state

    keys = jax.random.split(key, actor.N_TRIES)
    state = initial_state(B)
    guess = jnp.broadcast_to(jnp.asarray(encode_word(word)), (B, 5))
    rewards, lives = [], []
    for t in range(actor.N_TRIES):
        _, ke = jax.random.split(keys[t])
        lives.append(np.asarray(~state.done))
        state, _ = env.step(state, guess, jnp.ones((B,), bool), ke)
        rewards.append(np.asarray(state.reward) * lives[-1])

    np.testing.assert_allclose(np.asarray(out.turn_reward), np.stack(rewards, 1))
    np.testing.assert_array_equal(np.asarray(out.turn_live), np.stack(lives, 1))


def test_actor_token_stream_is_reformat_rendering():
    env = _env()
    step_fn, carry0 = _scripted_step_fn("copse")
    out = actor.rollout_wordle(
        env, step_fn, None, carry0, jax.random.PRNGKey(0), jnp.zeros((2,)), 1.0, True
    )
    tok = ByteTokenizer()
    text = tok.decode([int(t) for t in np.asarray(out.tokens)[0]])
    lines = text.split("\n")
    assert lines[0] == "Wordle:"
    # alternating action/feedback lines: 5 space-separated single chars
    for line in lines[1:13]:
        parts = line.split(" ")
        assert len(parts) == 5 and all(len(p) == 1 for p in parts)
    # action lines repeat the scripted word; feedback lines use b/y/g
    assert lines[1] == "c o p s e"
    assert set(lines[2].split(" ")) <= {"b", "y", "g"}


def test_actor_layout_helpers():
    m = actor.episode_is_action_mask()
    assert m.shape == (actor.EPISODE_LEN,)
    assert not m[: len(actor.HEADER)].any()
    ends = actor.action_end_positions()
    assert m[ends].all()
    # each turn contributes exactly 10 action slots
    assert int(m.sum()) == actor.N_TRIES * 10


def test_lm_actor_end_to_end():
    env = _env()
    config = tiny_test_config(max_position_embeddings=actor.EPISODE_LEN)
    core = LMCore(config)
    params = init_params(config, jax.random.PRNGKey(0))
    B = 4
    step_fn, carry0 = actor.make_lm_step_fn(core, B)
    out = actor.rollout_wordle(
        env, step_fn, params, carry0, jax.random.PRNGKey(3), jnp.zeros((B,)), 1.0, False
    )
    assert out.tokens.shape == (B, actor.EPISODE_LEN)
    live = np.asarray(out.turn_live)
    # liveness is monotone non-increasing over turns
    assert (live[:, :-1] >= live[:, 1:]).all()
    # a random-LM guess is almost surely invalid → reward -1 per live turn
    tr = np.asarray(out.turn_reward)
    assert ((tr <= 0.0) & (tr >= -1.0)).all()
    # token reward/mask helpers agree with the layout
    token_r = np.asarray(out.token_rewards())
    assert token_r.sum() == tr.sum()
    mask = np.asarray(out.token_action_mask())
    assert mask.sum() == live.sum() * 10


def test_segmented_rollout_matches_scan_rollout():
    """rollout_wordle_segmented (turn-sized caches) must reproduce
    rollout_wordle exactly: same keys, same env stepping, only the cache
    length per turn differs — masked slots contribute exact zeros."""
    import numpy as np

    from lmrl_gym_tpu.envs.wordle.vector import WordleVectorEnv, WordleVocab
    from lmrl_gym_tpu.models.config import tiny_test_config
    from lmrl_gym_tpu.models.interface import LMCore
    from lmrl_gym_tpu.models.transformer import init_params

    env = WordleVectorEnv(WordleVocab.from_file())
    config = tiny_test_config(max_position_embeddings=actor.EPISODE_LEN)
    core = LMCore(config)
    params = init_params(config, jax.random.PRNGKey(0))
    B = 4
    step_fn, carry0 = actor.make_lm_step_fn(core, B)
    holder = jnp.zeros((B,))
    a = actor.rollout_wordle(
        env, step_fn, params, carry0, jax.random.PRNGKey(5), holder, 1.0, False
    )
    b = actor.rollout_wordle_segmented(
        env, step_fn, params, carry0, jax.random.PRNGKey(5), holder, 1.0, False
    )
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_allclose(
        np.asarray(a.turn_reward), np.asarray(b.turn_reward)
    )
    np.testing.assert_array_equal(np.asarray(a.win), np.asarray(b.win))


def test_lm_actor_constrained_vocab_decode():
    """constrain_vocab=True must make EVERY decoded guess a vocab word
    (trie-masked letters + forced separators) even from a random-init LM —
    the serving-side legal-guess composition the wordle ILQL gate relies
    on (a random LM unmasked is ~always invalid, test_lm_actor_end_to_end
    above)."""
    env = _env()
    config = tiny_test_config(max_position_embeddings=actor.EPISODE_LEN)
    core = LMCore(config)
    params = init_params(config, jax.random.PRNGKey(0))
    B = 4
    step_fn, carry0 = actor.make_lm_step_fn(core, B)
    out = actor.rollout_wordle(
        env, step_fn, params, carry0, jax.random.PRNGKey(3), jnp.zeros((B,)),
        1.0, False, constrain_vocab=True,
    )
    tok = ByteTokenizer()
    words = set(env.vocab.words)
    n_turns = np.asarray(out.n_turns)
    toks = np.asarray(out.tokens)
    for b in range(B):
        text = tok.decode([int(t) for t in toks[b]])
        lines = text.split("\n")
        assert lines[0] == "Wordle:"
        for t in range(int(n_turns[b])):
            guess = lines[1 + 2 * t].replace(" ", "")
            assert guess in words, (b, t, guess)
    # greedy variant too
    outg = actor.rollout_wordle(
        env, step_fn, params, carry0, jax.random.PRNGKey(4), jnp.zeros((B,)),
        1.0, True, constrain_vocab=True,
    )
    textg = tok.decode([int(t) for t in np.asarray(outg.tokens)[0]])
    assert textg.split("\n")[1].replace(" ", "") in words


def test_scripted_mixture_rollout_generates_behavior_data():
    """rollout_wordle_scripted: device-side behavior generator. At
    p_smart=1 every guess is consistent → the win rate matches the env's
    own random-consistent kernel (>0.5 over 64 envs); at p_smart=0 the
    guesses are valid but feedback-blind → far lower win rate. Token
    stream must decode to the standard rendering with in-vocab guesses."""
    env = _env()
    B = 64
    out = actor.rollout_wordle_scripted(
        env, jax.random.PRNGKey(0), jnp.zeros((B,)), 1.0
    )
    assert float(out.win.mean()) > 0.5
    out0 = actor.rollout_wordle_scripted(
        env, jax.random.PRNGKey(0), jnp.zeros((B,)), 0.0
    )
    assert float(out0.win.mean()) < float(out.win.mean())
    tok = ByteTokenizer()
    words = set(env.vocab.words)
    text = tok.decode([int(t) for t in np.asarray(out.tokens)[0]])
    lines = text.split("\n")
    assert lines[0] == "Wordle:"
    assert lines[1].replace(" ", "") in words
    # same fixed layout as the LM actor: action masks/rewards line up
    assert np.asarray(out.token_action_mask()).sum() == np.asarray(out.turn_live).sum() * 10
