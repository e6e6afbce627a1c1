"""Twenty-Questions, Guess-My-City, Car-Dealer environments."""
import random

import numpy as np
import pytest

from lmrl_gym_tpu.envs.base import TextPolicy, text_env_eval
from lmrl_gym_tpu.envs.car_dealer.data import (
    Role,
    compute_reward,
    create_trajectory_from_conversation,
    extract_output_from_str,
    join_consecutive_actions,
)
from lmrl_gym_tpu.envs.car_dealer.env import CarDealerEnv, ScriptedBuyerPolicy
from lmrl_gym_tpu.envs.guess_city.data import (
    get_default_word_list as get_cities,
    is_done as city_is_done,
)
from lmrl_gym_tpu.envs.guess_city.env import (
    GuessCityEnv,
    ScriptedGuessCityOracle,
)
from lmrl_gym_tpu.envs.twenty_questions.data import (
    INITIAL_STR,
    INVALID_QUESTION,
    WordVariants,
    asker_postproc,
    create_trajectory_from_history,
    get_default_word_list,
    is_done,
)
from lmrl_gym_tpu.envs.twenty_questions.env import (
    BatchedTwentyQuestionsEnv,
    TwentyQuestionsEnv,
)
from lmrl_gym_tpu.envs.twenty_questions.oracle import ScriptedOracle
from lmrl_gym_tpu.text.frames import Text


class TestTwentyQuestionsData:
    def test_word_list(self):
        words = get_default_word_list()
        assert len(words) == 158
        assert any("Airplane" in w.words for w in words)

    def test_asker_postproc(self):
        assert asker_postproc("is it an animal") == "Is it an animal?\n"
        assert asker_postproc("") == INVALID_QUESTION
        assert asker_postproc("tell me what it is") == INVALID_QUESTION
        assert asker_postproc("Is " + "very " * 45 + "long?") == INVALID_QUESTION

    def test_is_done_positive(self):
        cat = WordVariants.from_str("Cat")
        assert is_done(cat, "Is it a cat?")
        assert is_done(cat, "Is the object a cat?")

    def test_is_done_negative(self):
        cat = WordVariants.from_str("Cat")
        assert not is_done(cat, "Is it a dog?")
        assert not is_done(cat, "Does the cat chase a mouse?")  # extra noun + not ending
        assert not is_done(cat, "Is it an animal?")

    def test_is_done_variants_and_counters(self):
        shoes = WordVariants.from_str("Shoes;Shoe;Pair of shoes")
        assert is_done(shoes, "Is it a pair of shoes?")
        assert is_done(shoes, "Is it a shoe?")

    def test_trajectory_rewards(self):
        cat = WordVariants.from_str("Cat")
        history = (
            Text(INITIAL_STR, False),
            Text("Is it an animal?\n", True),
            Text("Yes.\n", False),
            Text("Is it a cat?\n", True),
            Text("Yes.\n", False),
        )
        traj = create_trajectory_from_history(cat, history, 20)
        assert traj.done
        assert traj.reward == (0.0, -1.0, 0.0, 0.0, 0.0)  # winning q reward 0

    def test_trajectory_max_len(self):
        cat = WordVariants.from_str("Cat")
        history = [Text(INITIAL_STR, False)]
        for _ in range(20):
            history.append(Text("Is it a dog?\n", True))
            history.append(Text("No.\n", False))
        traj = create_trajectory_from_history(cat, tuple(history), 20)
        assert traj.done
        assert sum(traj.reward) == -20.0


class TestScriptedOracle:
    def setup_method(self):
        self.oracle = ScriptedOracle()
        self.cat = WordVariants.from_str("Cat")

    def test_direct_mention(self):
        assert self.oracle.generate_answers(self.cat, "Is it a cat?") == "Yes."

    def test_category(self):
        assert self.oracle.generate_answers(self.cat, "Is it an animal?") == "Yes."
        assert self.oracle.generate_answers(self.cat, "Is it a fruit?") == "No."

    def test_alive(self):
        assert self.oracle.generate_answers(self.cat, "Is it alive?") == "Yes."
        apple = WordVariants.from_str("Apple")
        assert self.oracle.generate_answers(apple, "Is it alive?") == "No."

    def test_invalid_question(self):
        assert self.oracle.generate_answers(self.cat, INVALID_QUESTION) == "No."

    def test_batched(self):
        answers = self.oracle.generate_answers(
            [self.cat, WordVariants.from_str("Apple")],
            ["Is it an animal?", "Is it a fruit?"],
        )
        assert answers == ["Yes.", "Yes."]


class TestTwentyQuestionsEnv:
    def test_full_episode_win(self):
        env = TwentyQuestionsEnv(ScriptedOracle(), get_default_word_list())
        env.reset(seed=3)
        target = env.curr_word

        history = (Text(INITIAL_STR, False),)
        history = history + (Text(f"Is it a {target[0].lower()}?\n", True),)
        history, reward, done = env.step(history)
        assert done
        assert reward == 0.0  # winning question costs nothing

    def test_episode_runs_out(self):
        env = TwentyQuestionsEnv(ScriptedOracle(), get_default_word_list())
        history = env.reset(seed=5)
        total = 0.0
        done = False
        count = 0
        while not done:
            history = history + (Text("Is it a xylophone?\n", True),)
            history, reward, done = env.step(history)
            total += reward
            count += 1
            assert count <= 20
        assert count == 20
        assert total == -20.0

    def test_deterministic_mode(self):
        env = TwentyQuestionsEnv(ScriptedOracle(), get_default_word_list())
        env.reset(seed=7, options={"deterministic": True})
        w1 = env.curr_word
        env.reset(seed=7, options={"deterministic": True})
        assert env.curr_word is w1

    def test_batched_env(self):
        env = BatchedTwentyQuestionsEnv(
            ScriptedOracle(), get_default_word_list(), bsize=3
        )
        obs = env.reset(seed=[0, 1, 2])
        assert len(obs) == 3
        histories = [
            o + (Text(f"Is it a {w[0].lower()}?\n", True),)
            for o, w in zip(obs, env.curr_words)
        ]
        results = env.step(histories)
        assert all(r[2] for r in results)  # all guessed correctly
        # None slots pass through
        results = env.step([histories[0], None, histories[2]])
        assert results[1] is None


class TestGuessCity:
    def test_city_is_done(self):
        assert city_is_done("Paris,France", "Is it Paris?")
        assert not city_is_done("Paris,France", "Is it London?")
        assert city_is_done("New York,United States", "Is the city New York?")

    def test_scripted_oracle(self):
        oracle = ScriptedGuessCityOracle()
        assert oracle.generate_answer("Paris,France", "Is it in Europe?") == "Yes."
        assert oracle.generate_answer("Tokyo,Japan", "Is it in Europe?") == "No."
        assert oracle.generate_answer("Paris,France", "Is it the capital?") == "Yes."
        assert oracle.generate_answer("Paris,France", "Is it Paris?") == "Yes."

    def test_episode(self):
        env = GuessCityEnv(ScriptedGuessCityOracle(), get_cities())
        env.reset(seed=1)
        target = env.curr_word
        history = (Text("Questions:\n", False),)
        history = history + (
            Text(f"Is it {target.split(',')[0]}?\n", True),
        )
        history, reward, done = env.step(history)
        assert done and reward == 0.0


class TestCarDealerData:
    def test_extract_output(self):
        out, rest = extract_output_from_str(
            "Deal! Output: Decision=Accept MSRP=$30,000 Buy Price=$28,000 bye"
        )
        assert out == {"car_bought": True, "msrp": 30000, "buy_price": 28000}
        assert "Output:" not in rest

        out, _ = extract_output_from_str("Output: Decision=Reject MSRP=$50,000")
        assert out == {"car_bought": False, "msrp": 50000, "buy_price": None}

        out, line = extract_output_from_str("no decision here")
        assert out is None and line == "no decision here"

    def test_compute_reward_fancy(self):
        info = {"budget": 30000}
        sale = {"car_bought": True, "msrp": 20000, "buy_price": 25000}
        assert compute_reward(info, sale, "fancy") == 25000 / ((30000 + 20000) / 2)
        no_sale = {"car_bought": False, "msrp": 20000, "buy_price": None}
        assert compute_reward(info, no_sale, "fancy") == -(30000 - 20000) / 20000

    def test_compute_reward_revenue(self):
        info = {"budget": 30000}
        sale = {"car_bought": True, "msrp": 20000, "buy_price": 25000}
        assert compute_reward(info, sale, "revenue") == 25.0

    def test_join_consecutive_actions(self):
        h = (
            Text("a\n", True),
            Text("b\n", True),
            Text("s\n", False),
            Text("c\n", True),
        )
        joined = join_consecutive_actions(h)
        assert len(joined) == 3
        assert joined[0].text == "a b\n"
        assert joined[0].is_action

    def test_trajectory_seller_reward_on_last_action(self):
        conversation = {
            "buyer_info": {
                "personality": "polite",
                "preferred_brands": "a Honda",
                "preferred_type": "sedan",
                "preferred_features": ["sunroof"],
                "budget": 30000,
            },
            "lines": [
                {"role": "Seller", "text": "Hi"},
                {"role": "Buyer", "text": "Hello"},
                {"role": "Seller", "text": "Offer $25,000"},
            ],
            "output": {"car_bought": True, "msrp": 25000, "buy_price": 25000},
        }
        traj = create_trajectory_from_conversation(conversation, Role.SELLER)
        assert traj.done
        action_rewards = [r for r, t in zip(traj.reward, traj.text_history) if t.is_action]
        assert action_rewards[-1] > 0
        assert all(r == 0 for r in action_rewards[:-1])

        buyer_traj = create_trajectory_from_conversation(conversation, Role.BUYER)
        assert "Output: Decision=Accept" in buyer_traj.text_history[-1].text
        assert buyer_traj.text_history[-1].is_action


class TestCarDealerEnv:
    def test_episode_with_scripted_buyer(self):
        env = CarDealerEnv(
            buyer_factory=lambda info: ScriptedBuyerPolicy(info, patience=3),
            max_conversation_length=50,
        )

        class SellerPolicy(TextPolicy):
            def act(self, history):
                budget_offer = "This one is great. I can offer it for $25,000.\n"
                return history + (Text(budget_offer, True),)

        interactions, summary = text_env_eval(
            env, SellerPolicy(), n_rollouts=4, seed_generator=iter(range(4))
        )
        assert summary["done"]["mean"] == 1.0
        # with $25k offers, buyers with budget >= 25k accept → positive reward
        assert np.isfinite(summary["reward"]["mean"])

    def test_forced_verdict_at_max_length(self):
        env = CarDealerEnv(
            buyer_factory=lambda info: ScriptedBuyerPolicy(info, patience=999),
            max_conversation_length=6,
        )

        class StallingSeller(TextPolicy):
            def act(self, history):
                return history + (Text("Let me tell you about our showroom.\n", True),)

        interactions, summary = text_env_eval(
            env, StallingSeller(), n_rollouts=2, seed_generator=iter(range(2))
        )
        assert summary["done"]["mean"] == 1.0
