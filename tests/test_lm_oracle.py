"""LM-in-the-loop oracle tests (round-1 VERDICT item 1).

Reference behavior: 20Q/Guess-City envs driven by a finetuned T5 oracle on
the mesh (twenty_questions/env/oracle.py:20-147), Car-Dealer by a trained
GPT-2 buyer (car_dealer/env/buyer.py:12-83), with batched oracle stepping
(BatchedTwentyQuestionsPolicyEnvironment, env.py:66-141). Here the oracle
is BC-trained in-repo from the scripted teacher, then the env steps
through it on the mesh.
"""
import random

import numpy as np
import pytest

from lmrl_gym_tpu.envs.base import interact_environment
from lmrl_gym_tpu.envs.lm_oracle import (
    OracleTrainConfig,
    build_lm_car_dealer_env,
    build_lm_guess_city_env,
    build_lm_twenty_questions_env,
    collect_buyer_conversations,
    collect_twenty_questions_qa,
    load_oracle,
    train_and_save_oracle,
    train_oracle_lm,
)

TINY = OracleTrainConfig(
    n_episodes=6,
    epochs=1,
    train_bsize=8,
    max_length=192,
    hidden_size=64,
    num_layers=2,
    num_heads=2,
)


@pytest.fixture(scope="module")
def tiny_oracle():
    windows = collect_twenty_questions_qa(TINY.n_episodes, seed=0)
    core, tokenizer, params, config = train_oracle_lm(windows, TINY)
    return core, tokenizer, params


def test_collectors_produce_supervised_windows():
    windows = collect_twenty_questions_qa(3, seed=0)
    assert len(windows) >= 3
    for w in windows[:5]:
        assert not w.text_history[0].is_action  # prompt
        assert w.text_history[1].is_action  # answer
        assert w.text_history[1].text in ("Yes.\n", "No.\n")
        assert "Answer the question about the object truthfully." in w.text_history[0].text

    buyer = collect_buyer_conversations(2, seed=0)
    for w in buyer:
        # buyer view: buyer lines are the action tokens
        assert any(t.is_action for t in w.text_history)
        assert "Output: Decision=" in w.text_history[-1].text


def test_batched_oracle_matches_per_item_calls(tiny_oracle):
    """The batched oracle path must produce the same answers as per-item
    calls (round-1 VERDICT item 1 'done' gate)."""
    from lmrl_gym_tpu.envs.lm_oracle import _oracle_sampling
    from lmrl_gym_tpu.envs.twenty_questions.data import get_default_word_list
    from lmrl_gym_tpu.envs.twenty_questions.oracle import LMOracle
    from lmrl_gym_tpu.algos.value_policy import LMServer

    core, tokenizer, params = tiny_oracle
    server = LMServer(core, tokenizer)
    oracle = LMOracle(
        server, params, _oracle_sampling(tokenizer, 8), max_input_length=192
    )
    words = get_default_word_list()[:4]
    questions = [
        "Is it an animal?",
        "Is it a vehicle?",
        "Can it fly?",
        "Is it bigger than a house?",
    ]
    batched = oracle.generate_answers(list(words), questions)
    singles = [oracle.generate_answers(w, q) for w, q in zip(words, questions)]
    assert batched == singles
    for a in batched:
        assert a in ("Yes.", "No.")


def test_lm_env_stepping_end_to_end(tiny_oracle):
    """Env stepping re-enters the mesh for the oracle each turn."""
    from lmrl_gym_tpu.cli.tasks import HeuristicAskerPolicy

    core, tokenizer, params = tiny_oracle
    env = build_lm_twenty_questions_env(
        core, tokenizer, params, max_conversation_length=4, batched=True
    )
    policy = HeuristicAskerPolicy(rng=random.Random(0))
    transitions = interact_environment(
        env, policy, env_seed=[3, 7], bsize=2
    )
    assert len(transitions) == 2
    for rollout in transitions:
        assert rollout[-1].done
        for tr in rollout:
            answer = tr.post_transition_history[-1].text
            assert answer in ("Yes.\n", "No.\n")


def test_oracle_save_load_roundtrip(tmp_path, tiny_oracle):
    core, tokenizer, params = tiny_oracle
    save_dir = str(tmp_path / "oracle_ckpt")
    core2, tok2, params2 = train_and_save_oracle(
        "twenty_questions", save_dir, TINY
    )
    core3, tok3, params3 = load_oracle(save_dir)
    from lmrl_gym_tpu.envs.lm_oracle import _oracle_sampling
    from lmrl_gym_tpu.envs.twenty_questions.data import get_default_word_list
    from lmrl_gym_tpu.envs.twenty_questions.oracle import LMOracle
    from lmrl_gym_tpu.algos.value_policy import LMServer

    w = get_default_word_list()[0]
    q = "Is it an animal?"
    a2 = LMOracle(
        LMServer(core2, tok2), params2, _oracle_sampling(tok2, 8), 192
    ).generate_answers(w, q)
    a3 = LMOracle(
        LMServer(core3, tok3), params3, _oracle_sampling(tok3, 8), 192
    ).generate_answers(w, q)
    assert a2 == a3


def test_lm_guess_city_and_car_dealer_step(tiny_oracle):
    """The other two dialog envs step through an LM too (interface-level:
    reuse the 20Q-trained tiny LM; answers still normalize)."""
    core, tokenizer, params = tiny_oracle

    env = build_lm_guess_city_env(core, tokenizer, params, max_conversation_length=3)
    from lmrl_gym_tpu.cli.tasks import HeuristicCityAskerPolicy

    transitions = interact_environment(
        env, HeuristicCityAskerPolicy(rng=random.Random(0)), env_seed=5, bsize=1
    )[0]
    assert transitions[-1].done

    env = build_lm_car_dealer_env(core, tokenizer, params, max_conversation_length=3)
    from lmrl_gym_tpu.cli.tasks import ScriptedSellerPolicy

    transitions = interact_environment(
        env, ScriptedSellerPolicy(rng=random.Random(0)), env_seed=5, bsize=1
    )[0]
    assert transitions[-1].done


def test_t5_oracle_arch_end_to_end(tmp_path):
    """arch='t5': the seq2seq oracle (reference's actual flan-t5 role)
    trains, saves, loads, and steps the 20Q env through Seq2SeqServer."""
    from lmrl_gym_tpu.envs.lm_oracle import train_and_save_oracle
    from lmrl_gym_tpu.models.encdec import EncDecCore

    cfg = OracleTrainConfig(
        n_episodes=4, epochs=1, train_bsize=8, max_length=192,
        hidden_size=64, num_layers=2, num_heads=2,
    )
    save_dir = str(tmp_path / "t5_oracle")
    core, tok, params = train_and_save_oracle(
        "twenty_questions", save_dir, cfg, arch="t5"
    )
    assert isinstance(core, EncDecCore)
    core2, tok2, params2 = load_oracle(save_dir)
    assert isinstance(core2, EncDecCore)

    env = build_lm_twenty_questions_env(
        core2, tok2, params2, max_conversation_length=2, batched=True
    )
    from lmrl_gym_tpu.cli.tasks import HeuristicAskerPolicy

    transitions = interact_environment(
        env, HeuristicAskerPolicy(rng=random.Random(0)), env_seed=[1], bsize=1
    )
    for tr in transitions[0]:
        assert tr.post_transition_history[-1].text in ("Yes.\n", "No.\n")
