"""Text data model + tokenization alignment (environment.py:294-419 parity)."""
import numpy as np
import pytest

from lmrl_gym_tpu.text.frames import (
    Text,
    TextTrajectory,
    TextTrajectoryChain,
    TokenHistory,
    TokenTrajectory,
    TokenTrajectoryChain,
    text_history_to_str,
)
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

TOK = ByteTokenizer()


def test_text_history_to_str():
    h = (Text("a", False), Text("b", True))
    assert text_history_to_str(h) == "ab"


def test_trajectory_invariant():
    with pytest.raises(AssertionError):
        TextTrajectory((Text("s", False),), (1.0,), False)  # reward on non-action


def test_token_history_alignment():
    h = (Text("ab", False), Text("cd", True), Text("e", False))
    th = TokenHistory.from_text_history(h, TOK)
    assert th.tokens.tolist() == list(b"abcde")
    assert th.is_action.tolist() == [False, False, True, True, False]


def test_token_trajectory_reward_on_last_token():
    traj = TextTrajectory(
        (Text("sss", False), Text("aa", True)),
        (0.0, -1.0),
        True,
    )
    tt = TokenTrajectory.from_text_trajectory(traj, TOK)
    # reward lands on the LAST token of each segment (environment.py:370)
    assert tt.reward.tolist() == [0.0, 0.0, 0.0, 0.0, -1.0]
    assert tt.is_action.tolist() == [False, False, False, True, True]
    assert bool(tt.done) is True


def test_token_trajectory_rejects_nonaction_reward():
    with pytest.raises(AssertionError):
        TokenTrajectory(
            np.asarray([1], dtype=np.int32),
            np.asarray([False]),
            np.asarray([1.0], dtype=np.float32),
            np.asarray(False),
        )


def test_chain_done_only_at_end():
    t_done = TextTrajectory((Text("a", True),), (0.0,), True)
    t_live = TextTrajectory((Text("b", True),), (0.0,), False)
    chain = TextTrajectoryChain(t_live, TextTrajectoryChain(t_done, None))
    tok_chain = TokenTrajectoryChain.from_text_trajectory_chain(chain, TOK)
    assert len(tok_chain.to_list()) == 2

    with pytest.raises(AssertionError):
        TokenTrajectoryChain(
            TokenTrajectory.from_text_trajectory(t_done, TOK),
            TokenTrajectoryChain(
                TokenTrajectory.from_text_trajectory(t_live, TOK),
                TokenTrajectoryChain(
                    TokenTrajectory.from_text_trajectory(t_live, TOK), None
                ),
            ),
        )


def test_byte_tokenizer_roundtrip():
    s = "The goal is at position 8, 6. move up\n"
    assert TOK.decode(TOK.encode(s)) == s
    assert TOK.vocab_size == 259
    assert TOK.pad_token_id == 256
