"""Online (round-based) training: rollout→chain conversion, overflow
folding, and the CLI online paths end-to-end on tiny models."""
import numpy as np
import pytest

from lmrl_gym_tpu.algos.ppo import fold_trajectory_to_length
from lmrl_gym_tpu.cli.tasks import TASKS, transitions_to_chain
from lmrl_gym_tpu.cli.train import main
from lmrl_gym_tpu.envs.base import InteractionTransition
from lmrl_gym_tpu.text.frames import Text, TextTrajectory
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer


def _transition(pre, action, post, reward, done):
    post_action = pre + (Text(action, True),)
    return InteractionTransition(
        pre_action_history=pre,
        post_action_history=post_action,
        post_transition_history=post,
        reward=reward,
        done=done,
    )


class TestTransitionsToChain:
    def test_full_history_env_single_window(self):
        """Env that keeps the whole conversation → one window."""
        s0 = (Text("obs0", False),)
        t1 = _transition(s0, "a1", s0 + (Text("a1", True), Text("obs1", False)), -1.0, False)
        t2 = _transition(
            t1.post_transition_history, "a2",
            t1.post_transition_history + (Text("a2", True), Text("end", False)),
            0.0, True,
        )
        chain = transitions_to_chain([t1, t2])
        assert chain.next is None
        tt = chain.text_trajectory
        assert tt.done
        # rewards on the action segments, in order
        action_rewards = [r for r, t in zip(tt.reward, tt.text_history) if t.is_action]
        assert action_rewards == [-1.0, 0.0]

    def test_windowed_env_chain_of_windows(self):
        """Env that drops history (maze last_k) → per-step chain links."""
        s0 = (Text("obs0", False),)
        t1 = _transition(s0, "a1", (Text("obs1", False),), -1.0, False)
        t2 = _transition((Text("obs1", False),), "a2", (Text("done", False),), 0.0, True)
        chain = transitions_to_chain([t1, t2])
        links = chain.to_list()
        assert len(links) == 2
        assert not links[0].done and links[1].done
        assert links[0].reward[-1] == -1.0 and links[1].reward[-1] == 0.0
        assert links[0].text_history[-1].is_action


class TestFoldTrajectory:
    TOK = ByteTokenizer()

    def _traj(self):
        h = (
            Text("ssss", False), Text("aaaa", True),
            Text("ssss", False), Text("bbbb", True),
            Text("ssss", False), Text("cccc", True),
        )
        return TextTrajectory(h, (0.0, -1.0, 0.0, -1.0, 0.0, 5.0), True)

    def test_no_fold_when_it_fits(self):
        tt = self._traj()
        out = fold_trajectory_to_length(tt, self.TOK, 1000, gamma=0.9)
        assert out == tt

    def test_folds_last_pair_with_discount(self):
        tt = self._traj()  # 24 tokens total; cap at 16 → drop one pair
        out = fold_trajectory_to_length(tt, self.TOK, 16, gamma=0.5)
        assert len(out.text_history) == 4
        assert out.text_history[-1].is_action
        # -1 + 0.5 * 5.0 folded into the new last action
        assert out.reward[-1] == pytest.approx(-1.0 + 0.5 * 5.0)
        assert sum(len(self.TOK.encode(t.text)) for t in out.text_history) <= 16

    def test_keeps_at_least_one_action(self):
        tt = self._traj()
        out = fold_trajectory_to_length(tt, self.TOK, 2, gamma=1.0)
        assert sum(t.is_action for t in out.text_history) == 1
        # all rewards folded into the surviving action
        assert out.reward[1] == pytest.approx(-1.0 + (-1.0 + 5.0))


BASE_ARGS = [
    "--model-size", "tiny", "--train-bsize", "4", "--epochs", "1",
    "--n-data", "2", "--no-eval", "--rollouts-per-round", "2",
    "--rollout-bsize", "2", "--log-every", "4",
]


class TestOnlineCLI:
    def test_online_filtered_bc_wordle(self):
        main(["--task", "wordle", "--algo", "filtered_bc",
              "--online-rounds", "1", "--eval-max-new-tokens", "16"] + BASE_ARGS)

    def test_online_ppo_wordle(self):
        main(["--task", "wordle", "--algo", "ppo",
              "--online-rounds", "1", "--eval-max-new-tokens", "16"] + BASE_ARGS)

    @pytest.mark.slow
    def test_online_ilql_wordle(self):
        main(["--task", "wordle", "--algo", "ilql",
              "--online-rounds", "1", "--eval-max-new-tokens", "16"] + BASE_ARGS)
