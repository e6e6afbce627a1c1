"""Wordle: golden parity vs reference + vector-env cross-checks."""
import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmrl_gym_tpu.envs.wordle import vector as wv
from lmrl_gym_tpu.envs.wordle.game import (
    WordleGame,
    apply_guess,
    feedback_string,
    word_satisfies,
)
from lmrl_gym_tpu.envs.wordle.vector import (
    GREEN,
    GRAY,
    YELLOW,
    POSSIBLE,
    WordleVectorEnv,
    WordleVocab,
    consistent_mask,
    encode_word,
    initial_state,
    render_feedback,
    transition_knowledge,
)

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
VOCAB = WordleVocab.from_file()


def test_vocab_loaded():
    assert len(VOCAB) == 431  # wordle_official_400.txt: 431 five-letter words
    assert all(len(w) == 5 for w in VOCAB.words)


class TestGoldenParity:
    """Host-side game reproduces reference trajectories bit-exactly under
    fixed seeds (BASELINE.json exact-match gate)."""

    def test_reference_episodes(self):
        with open(os.path.join(GOLDENS, "wordle.json")) as f:
            episodes = json.load(f)
        assert len(episodes) == 20
        for ep in episodes:
            rng = random.Random(ep["seed"])
            game = WordleGame(VOCAB, rng=rng)
            for step in ep["steps"]:
                game, reward, done, feedback = game.next(step["action"])
                assert feedback == step["feedback"], (
                    f"seed {ep['seed']} action {step['action']}"
                )
                assert reward == step["reward"]
                assert done == step["done"]


class TestConsistency:
    def test_initial_all_consistent(self):
        know = jnp.full((26, 5), POSSIBLE, dtype=jnp.int8)
        mask = consistent_mask(
            know, jnp.asarray(VOCAB.chars), jnp.asarray(VOCAB.has_char)
        )
        assert bool(mask.all())

    @pytest.mark.parametrize("seed", range(8))
    def test_vector_matches_host_filter(self, seed):
        """After random guesses, the jnp consistency mask equals the
        host-side word_satisfies filter."""
        rng = random.Random(seed)
        know = np.full((26, 5), POSSIBLE, dtype=np.int8)
        for _ in range(rng.randint(1, 3)):
            guess = rng.choice(VOCAB.words)
            target = rng.choice(VOCAB.words)
            know = apply_guess(know, guess, target)
        host = np.asarray([word_satisfies(know, w) for w in VOCAB.words])
        vec = np.asarray(
            consistent_mask(
                jnp.asarray(know),
                jnp.asarray(VOCAB.chars),
                jnp.asarray(VOCAB.has_char),
            )
        )
        np.testing.assert_array_equal(host, vec)

    @pytest.mark.parametrize("seed", range(8))
    def test_transition_matches_host(self, seed):
        rng = random.Random(100 + seed)
        know = np.full((26, 5), POSSIBLE, dtype=np.int8)
        for _ in range(rng.randint(0, 2)):
            know = apply_guess(know, rng.choice(VOCAB.words), rng.choice(VOCAB.words))
        guess, target = rng.choice(VOCAB.words), rng.choice(VOCAB.words)
        host = apply_guess(know, guess, target)
        vec = np.asarray(
            transition_knowledge(
                jnp.asarray(know),
                jnp.asarray(encode_word(guess), dtype=jnp.int32),
                jnp.asarray(encode_word(target), dtype=jnp.int32),
            )
        )
        np.testing.assert_array_equal(host, vec)

    @pytest.mark.parametrize("seed", range(8))
    def test_feedback_render_matches_host(self, seed):
        rng = random.Random(200 + seed)
        guess, target = rng.choice(VOCAB.words), rng.choice(VOCAB.words)
        know = apply_guess(
            np.full((26, 5), POSSIBLE, dtype=np.int8), guess, target
        )
        host_str = feedback_string(know, guess)
        vec = np.asarray(
            render_feedback(
                jnp.asarray(know), jnp.asarray(encode_word(guess), dtype=jnp.int32)
            )
        )
        code_to_str = {GREEN: "<g>", YELLOW: "<y>", GRAY: "<b>"}
        # host may render fewer chars when a cell is POSSIBLE (can't happen
        # for the letters of the guess itself) — enforce equal length too
        assert host_str == "".join(code_to_str[int(c)] for c in vec)


class TestVectorEnv:
    def test_episode_semantics(self):
        env = WordleVectorEnv(VOCAB)
        B = 32
        state = env.reset(B)
        key = jax.random.PRNGKey(0)
        for t in range(6):
            key, gkey, skey = jax.random.split(key, 3)
            guess = env.random_consistent_guess(state, gkey)
            state, feedback = env.step(
                state, guess, jnp.ones((B,), bool), skey
            )
            assert feedback.shape == (B, 5)
        # after 6 guesses every env is done
        assert bool(state.done.all())
        # reward of done step ∈ {0 (win), -1}
        assert set(np.unique(np.asarray(state.reward))) <= {0.0, -1.0}

    def test_invalid_guess_consumes_try(self):
        env = WordleVectorEnv(VOCAB)
        state = env.reset(2)
        bad = jnp.zeros((2, 5), jnp.int8)  # "aaaaa" not in the 400-word vocab
        assert "aaaaa" not in VOCAB.words
        state, _ = env.step(state, bad, jnp.ones((2,), bool), jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(state.n_guesses), [1, 1])
        np.testing.assert_array_equal(np.asarray(state.reward), [-1.0, -1.0])
        np.testing.assert_array_equal(np.asarray(state.last_invalid), [True, True])
        # knowledge unchanged
        assert bool((state.knowledge == POSSIBLE).all())

    def test_win_reward_zero(self):
        """Force a near-solved state: guess the right word twice."""
        env = WordleVectorEnv(VOCAB)
        B = 1
        state = env.reset(B)
        word = VOCAB.words[7]
        guess = jnp.asarray(encode_word(word))[None, :]
        key = jax.random.PRNGKey(3)
        # guessing repeatedly narrows the state; eventually if the filtered
        # vocab becomes the singleton {word}, reward hits 0 and done
        for _ in range(6):
            key, sk = jax.random.split(key)
            state, _ = env.step(state, guess, jnp.ones((B,), bool), sk)
            if bool(state.done[0]):
                break
        assert bool(state.done[0])

    def test_auto_reset(self):
        env = WordleVectorEnv(VOCAB)
        state = env.reset(4)
        state = state.replace(done=jnp.asarray([True, False, True, False]))
        state = state.replace(n_guesses=jnp.asarray([3, 2, 6, 1], jnp.int32))
        fresh = env.auto_reset(state)
        np.testing.assert_array_equal(np.asarray(fresh.n_guesses), [0, 2, 0, 1])
        np.testing.assert_array_equal(
            np.asarray(fresh.done), [False, False, False, False]
        )

    def test_vector_vs_host_rollout(self):
        """Same guess sequence, same sampled targets → identical rewards.

        The vector env samples targets with jax PRNG, the host with python
        Random, so instead we check state-trajectory equivalence by feeding
        the vector env's own sampled targets into the host update rule."""
        env = WordleVectorEnv(VOCAB)
        rng = random.Random(42)
        for trial in range(5):
            know_host = np.full((26, 5), POSSIBLE, dtype=np.int8)
            state = env.reset(1)
            for t in range(6):
                guess_word = rng.choice(VOCAB.words)
                guess = jnp.asarray(encode_word(guess_word))[None, :]
                key = jax.random.PRNGKey(trial * 10 + t)
                state, fb = env.step(state, guess, jnp.ones((1,), bool), key)
                # recover which target the vector env sampled: rerun the
                # batched categorical with the same key
                pre_logits = jnp.where(
                    consistent_mask(
                        jnp.asarray(know_host)[None],
                        env.vocab_chars,
                        env.vocab_has,
                    ),
                    0.0,
                    -jnp.inf,
                )
                tgt_idx = int(jax.random.categorical(key, pre_logits, axis=-1)[0])
                target_word = VOCAB.words[tgt_idx]
                know_host = apply_guess(know_host, guess_word, target_word)
                np.testing.assert_array_equal(
                    know_host, np.asarray(state.knowledge[0])
                )
                if bool(state.done[0]):
                    break
