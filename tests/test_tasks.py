"""Task registry: data generators produce valid chains for every task."""
import numpy as np
import pytest

from lmrl_gym_tpu.cli.tasks import TASKS
from lmrl_gym_tpu.text.frames import TokenTrajectoryChain
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

TOK = ByteTokenizer()


@pytest.mark.parametrize("task_name", sorted(TASKS))
def test_generate_chains(task_name):
    task = TASKS[task_name]
    # full-game chess selfplay runs a deep search per move — one game
    # validates the pipeline at a fraction of the wall time
    if task_name in ("chess", "chess_endgames"):
        n = 1
    elif task_name in ("twenty_questions", "guess_city", "car_dealer"):
        n = 2
    else:
        n = 3
    chains = task.generate_chains(n, seed=0)
    assert len(chains) == n
    for chain in chains:
        links = chain.to_list()
        assert links[-1].done, f"{task_name}: chain must end done"
        assert not any(tt.done for tt in links[:-1])
        # tokenizes cleanly
        token_chain = TokenTrajectoryChain.from_text_trajectory_chain(chain, TOK)
        for tt in token_chain.to_list():
            assert tt.tokens.shape[0] > 0
            assert not np.any((~tt.is_action) & (tt.reward != 0.0))


@pytest.mark.parametrize("task_name", sorted(TASKS))
def test_build_env(task_name):
    env = TASKS[task_name].build_env()
    obs = env.reset(seed=0)
    assert isinstance(obs, tuple)
    assert all(not t.is_action for t in obs)


def test_maze_chains_rewards(self=None):
    chains = TASKS["maze"].generate_chains(5, seed=1)
    # optimal-heavy behavior reaches the goal: last reward is 0 (success)
    # or -1/-4; total return bounded by step penalties
    for chain in chains:
        total = sum(sum(tt.reward) for tt in chain.to_list())
        assert total <= 0


def test_wordle_chains_single_window():
    chains = TASKS["wordle"].generate_chains(3, seed=2)
    for c in chains:
        assert c.next is None
        assert c.text_trajectory.text_history[0].text == "Wordle:\n"
