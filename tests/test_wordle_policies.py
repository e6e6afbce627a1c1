"""Wordle scripted policies + dataset generation."""
import random

import numpy as np
import pytest

from lmrl_gym_tpu.envs.base import text_env_eval
from lmrl_gym_tpu.envs.wordle.data import (
    generate_trajectories,
    trajectories_to_chains,
)
from lmrl_gym_tpu.envs.wordle.env import WordleEnv
from lmrl_gym_tpu.envs.wordle.game import apply_guess, word_satisfies
from lmrl_gym_tpu.envs.wordle.policies import (
    MixturePolicy,
    OptimalPolicy,
    RandomMixturePolicy,
    RepeatPolicy,
    StartWordPolicy,
    WrongPolicy,
    _filtered_mask,
    apply_feedback,
    state_from_history,
)
from lmrl_gym_tpu.envs.wordle.vector import POSSIBLE, WordleVocab
from lmrl_gym_tpu.text.frames import Text

VOCAB = WordleVocab.from_file()
SMALL = WordleVocab.from_words(
    [w for i, w in enumerate(VOCAB.words) if i % 8 == 0]
)  # 54 words — keeps OptimalPolicy fast in tests


class TestStateReconstruction:
    def test_apply_feedback_matches_apply_guess(self):
        rng = random.Random(0)
        for _ in range(10):
            guess, target = rng.choice(VOCAB.words), rng.choice(VOCAB.words)
            k0 = np.full((26, 5), POSSIBLE, dtype=np.int8)
            via_target = apply_guess(k0, guess, target)
            # derive pattern string from (guess, target)
            fb = ""
            tset = set(target)
            for i, c in enumerate(guess):
                if c == target[i]:
                    fb += "<g>"
                elif c in tset:
                    fb += "<y>"
                else:
                    fb += "<b>"
            via_fb = apply_feedback(k0, guess, fb)
            np.testing.assert_array_equal(via_target, via_fb)

    def test_state_from_history(self):
        env = WordleEnv(VOCAB)
        env.reset(seed=0)
        history = tuple()
        history = history + (Text("raise", True),)
        history, *_ = env.step(history)
        knowledge, actions = state_from_history(history, VOCAB)
        np.testing.assert_array_equal(knowledge, env.game.knowledge)
        assert actions == ["raise"]

    def test_filtered_mask_matches_word_satisfies(self):
        k = apply_guess(
            np.full((26, 5), POSSIBLE, dtype=np.int8), "raise", "tears"
        )
        mask = _filtered_mask(k, SMALL)
        expected = np.asarray([word_satisfies(k, w) for w in SMALL.words])
        np.testing.assert_array_equal(mask, expected)


class TestPolicies:
    def test_start_word_policy(self):
        policy = StartWordPolicy(rng=random.Random(0))
        out = policy.act(tuple())
        assert out[-1].is_action and len(out[-1].text) == 5

    def test_random_mixture_smart_guesses_consistent(self):
        policy = RandomMixturePolicy(1.0, SMALL, rng=random.Random(0))
        env = WordleEnv(SMALL)
        env.reset(seed=1)
        history = policy.act(tuple())
        history, *_ = env.step(history)
        # next smart guess must be consistent with current knowledge
        history2 = policy.act(history)
        guess = history2[-1].text
        assert word_satisfies(env.game.knowledge, guess)

    def test_wrong_policy_guesses_inconsistent(self):
        policy = WrongPolicy(SMALL, rng=random.Random(0))
        env = WordleEnv(SMALL)
        env.reset(seed=1)
        history = policy.act(tuple())
        history, *_ = env.step(history)
        guess = policy.act(history)[-1].text
        # after one guess there are inconsistent words; WrongPolicy picks one
        assert not word_satisfies(env.game.knowledge, guess)

    def test_repeat_policy(self):
        policy = RepeatPolicy(rng=random.Random(0))
        h = (Text("tears", True), Text("<b><b><b><b><b>", False))
        out = policy.act(h)
        assert out[-1].text == "tears"

    def test_mixture_policy(self):
        p1 = RepeatPolicy(rng=random.Random(0))
        p2 = RandomMixturePolicy(1.0, SMALL, rng=random.Random(0))
        m = MixturePolicy(1.0, p1, p2, rng=random.Random(0))
        h = (Text("tears", True), Text("<b><b><b><b><b>", False))
        assert m.act(h)[-1].text == "tears"


class TestOptimalPolicy:
    def test_beats_random(self):
        """Optimal policy average return ≥ random-consistent policy."""
        optimal = OptimalPolicy(SMALL, rng=random.Random(0))
        rand = RandomMixturePolicy(1.0, SMALL, rng=random.Random(0))

        env = WordleEnv(SMALL)
        _, opt_summary = text_env_eval(
            env, optimal, n_rollouts=6, seed_generator=iter(range(6))
        )
        _, rand_summary = text_env_eval(
            env, rand, n_rollouts=6, seed_generator=iter(range(6))
        )
        assert opt_summary["reward"]["mean"] >= rand_summary["reward"]["mean"]
        # optimal on a 54-word vocab should usually win within 6 tries
        assert opt_summary["reward"]["mean"] > -5.0

    def test_cache_hit(self):
        policy = OptimalPolicy(SMALL, rng=random.Random(0))
        h = tuple()
        out1 = policy.act(h)
        k0 = np.full((26, 5), POSSIBLE, dtype=np.int8)
        assert policy.cache.get(k0) is not None
        out2 = policy.act(h)
        assert out2[-1].text in policy.cache.get(k0)


class TestDataGeneration:
    def test_generate_trajectories(self):
        policy = RandomMixturePolicy(0.8, SMALL, rng=random.Random(0))
        trajs = generate_trajectories(3, policy, SMALL, seed=0)
        assert len(trajs) == 3
        for t in trajs:
            assert t.done
            assert t.text_history[0].text == "Wordle:\n"
            # rewards only on actions
            for r, txt in zip(t.reward, t.text_history):
                if not txt.is_action:
                    assert r == 0.0
            assert sum(t.reward) <= 0.0
        chains = trajectories_to_chains(trajs)
        assert all(c.next is None for c in chains)
