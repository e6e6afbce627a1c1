"""Golden-parity tests for chess text protocol and the three dialog
tasks (round-1 VERDICT item 5). Fixtures in tests/goldens/*.json were
produced by executing the REFERENCE's own code (tests/make_goldens.py);
these tests assert our implementations reproduce them exactly.

Coverage now spans 6 of 8 tasks (wordle + maze in their own test files).
Text-Nav has no golden: the reference env wraps TextWorld, whose package
is not installable here — the divergence is documented in
lmrl_gym_tpu/envs/text_nav/engine.py and locked by self-goldens in
tests/test_text_nav.py.
"""
import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def load(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


class TestChessTextProtocol:
    """vs reference chess/env/env.py:13-26."""

    G = load("chess_text.json")

    def test_preprocess_move(self):
        from lmrl_gym_tpu.envs.chess.env import preprocess_move

        for move, expected in self.G["preprocess_move"].items():
            assert preprocess_move(move) == expected

    def test_postprocess_move_roundtrip(self):
        from lmrl_gym_tpu.envs.chess.env import postprocess_move

        for spelled, expected in self.G["postprocess_move"].items():
            assert postprocess_move(spelled) == expected

    def test_preprocess_state(self):
        from lmrl_gym_tpu.envs.chess.env import (
            preprocess_state,
            preprocess_state_og,
        )

        for fen, expected in self.G["preprocess_state"].items():
            assert preprocess_state(fen) == expected
        for fen, expected in self.G["preprocess_state_og"].items():
            assert preprocess_state_og(fen) == expected

    def test_postprocess_state(self):
        from lmrl_gym_tpu.envs.chess.env import postprocess_state

        for spelled, expected in self.G["postprocess_state"].items():
            assert postprocess_state(spelled) == expected


class TestTwentyQuestionsGoldens:
    """vs reference twenty_questions/env/data.py (builder paths that do
    not reach the nltk-dependent is_done; see make_goldens.py)."""

    G = load("twenty_questions.json")

    def test_constants(self):
        from lmrl_gym_tpu.envs.twenty_questions.data import (
            INITIAL_STR,
            INVALID_QUESTION,
        )

        assert INITIAL_STR == self.G["initial_str"]
        assert INVALID_QUESTION == self.G["invalid_question"]

    def test_trajectory_builder(self):
        from lmrl_gym_tpu.envs.twenty_questions.data import (
            create_trajectory_from_history,
            get_default_word_list,
        )
        from lmrl_gym_tpu.text.frames import Text

        by_name = {w.words[0].lower(): w for w in get_default_word_list()}
        for case in self.G["trajectories"]:
            history = tuple(Text(t, a) for t, a in case["history"])
            tt = create_trajectory_from_history(by_name[case["word"]], history)
            assert [list(x) for x in zip(*[(t.text, t.is_action) for t in tt.text_history])] == [
                [h[0] for h in case["history"]],
                [h[1] for h in case["history"]],
            ]
            assert list(tt.reward) == case["reward"]
            assert bool(tt.done) == case["done"]

    def test_asker_postproc(self):
        from lmrl_gym_tpu.envs.twenty_questions.data import asker_postproc

        for q, expected in self.G["asker_postproc"].items():
            assert asker_postproc(q) == expected, repr(q)

    def test_rtg_tokens(self):
        from lmrl_gym_tpu.envs.twenty_questions.data import rtg_to_token_str

        for r, expected in self.G["rtg_tokens"].items():
            assert rtg_to_token_str(float(r)) == expected


class TestGuessCityGoldens:
    G = load("guess_city.json")

    def test_constants(self):
        from lmrl_gym_tpu.envs.guess_city.data import INITIAL_STR

        assert INITIAL_STR == self.G["initial_str"]

    def test_trajectory_builder(self):
        from lmrl_gym_tpu.envs.guess_city.data import create_trajectory_from_history
        from lmrl_gym_tpu.text.frames import Text

        for case in self.G["trajectories"]:
            history = tuple(Text(t, a) for t, a in case["history"])
            tt = create_trajectory_from_history(case["word"], history)
            assert list(tt.reward) == case["reward"]
            assert bool(tt.done) == case["done"]

    def test_asker_postproc(self):
        from lmrl_gym_tpu.envs.guess_city.data import asker_postproc

        for q, expected in self.G["asker_postproc"].items():
            assert asker_postproc(q) == expected, repr(q)


class TestCarDealerGoldens:
    """vs reference car_dealer/env/data.py:130-263."""

    G = load("car_dealer.json")

    def test_buyer_info_str(self):
        from lmrl_gym_tpu.envs.car_dealer.data import create_buyer_info_str

        assert (
            create_buyer_info_str(self.G["buyer_info"]) == self.G["buyer_info_str"]
        )

    def test_reward_rules(self):
        from lmrl_gym_tpu.envs.car_dealer.data import compute_reward

        for case in self.G["rewards"]:
            assert compute_reward(
                self.G["buyer_info"], case["output"], "fancy"
            ) == pytest.approx(case["fancy"])
            assert compute_reward(
                self.G["buyer_info"], case["output"], "revenue"
            ) == pytest.approx(case["revenue"])

    def test_output_extraction(self):
        from lmrl_gym_tpu.envs.car_dealer.data import extract_output_from_str

        for case in self.G["extraction"]:
            out, extracted = extract_output_from_str(case["line"])
            assert out == case["output"], case["line"]
            assert extracted == case["extracted"], case["line"]

    def test_role_view_trajectories(self):
        from lmrl_gym_tpu.envs.car_dealer.data import (
            Role,
            create_trajectory_from_conversation,
        )

        conversation = {
            "buyer_info": self.G["buyer_info"],
            "lines": [
                {"role": "seller", "text": "Welcome! Looking for anything special?"},
                {"role": "buyer", "text": "A Toyota SUV with a sunroof."},
                {"role": "seller", "text": "I have one at $38,000."},
                {"role": "buyer", "text": "Deal."},
            ],
            "output": {"car_bought": True, "msrp": 45000, "buy_price": 38000},
        }
        for role in (Role.SELLER, Role.BUYER):
            expected = self.G["trajectories"][str(role)]
            tt = create_trajectory_from_conversation(conversation, role)
            assert [[t.text, t.is_action] for t in tt.text_history] == expected["history"]
            assert list(tt.reward) == pytest.approx(expected["reward"])
            assert bool(tt.done) == expected["done"]
