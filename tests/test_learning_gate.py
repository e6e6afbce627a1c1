"""Learning-quality gate (round-1 VERDICT weak #7 / next-round item 7).

BASELINE.md row 3 requires training to actually learn. This test BC-trains
a tiny model on BFS-optimal maze demonstrations and asserts the
reference's headline maze metric — per-cell optimal-move accuracy vs the
BFS table (maze/env/maze_utils.py:63-89) — strictly improves from init
and clears a threshold. If the training path stops learning, this fails.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.training.train_state import TrainState

from lmrl_gym_tpu.algos import data as algo_data
from lmrl_gym_tpu.algos.bc import BCBatch, BCConfig, BCTrainState, make_bc_train_step
from lmrl_gym_tpu.algos.value_policy import LMServer
from lmrl_gym_tpu.cli.tasks import generate_maze_chains
from lmrl_gym_tpu.core.blocking import BlockingStrategy, Padding, Truncation
from lmrl_gym_tpu.core.optimizer import OptimizerConfig, make_optimizer
from lmrl_gym_tpu.envs.maze.eval import per_cell_optimal_move_accuracy
from lmrl_gym_tpu.envs.maze.grids import double_t_maze
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.generation import SamplingConfig
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.text.frames import Text, TokenTrajectoryChain
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

MAX_LEN = 160
GOAL = (8, 6)


def _policy_act(server, params, tokenizer, sampling):
    def act(histories):
        prompts = ["".join(t.text for t in h) for h in histories]
        outs = server.generate_from_strs(
            params, prompts, MAX_LEN, sampling, jax.random.PRNGKey(0)
        )
        return [h + (Text(o, True),) for h, o in zip(histories, outs)]

    return act


@pytest.mark.slow
def test_bc_training_learns_maze():
    tokenizer = ByteTokenizer()
    config = tiny_test_config(
        hidden_size=128, num_layers=2, num_heads=4, max_position_embeddings=256
    )
    core = LMCore(config)

    # expert data: BFS-optimal moves from every start cell
    chains = generate_maze_chains(120, seed=3, p_optimal=1.0)
    token_chains = [
        TokenTrajectoryChain.from_text_trajectory_chain(c, tokenizer) for c in chains
    ]
    windows = []
    for c in token_chains:
        windows.extend(c.to_list())
    examples = [
        algo_data.BCExample.from_segments(tt.tokens, tt.is_action) for tt in windows
    ]
    strategy = BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, MAX_LEN)
    dataset = algo_data.ArrayDataset(
        algo_data.block_bc_examples(examples, strategy, tokenizer.pad_token_id)
    )

    params = init_params(config, jax.random.PRNGKey(0))
    state = BCTrainState(
        model=TrainState.create(
            apply_fn=None,
            params=params,
            tx=make_optimizer(OptimizerConfig(lr=1e-3), params),
        )
    )
    step = make_bc_train_step(core, BCConfig(), tokenizer.pad_token_id, None)

    server = LMServer(core, tokenizer)
    sampling = SamplingConfig(
        max_new_tokens=12,
        greedy=True,
        eos_token_id=10,
        pad_token_id=tokenizer.pad_token_id,
    )
    maze = double_t_maze()

    acc_init, _ = per_cell_optimal_move_accuracy(
        _policy_act(server, state.model.params, tokenizer, sampling), maze, GOAL
    )

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    losses = []
    for _epoch in range(3):
        for b in dataset.batches(32, rng=rng, drop_last=False):
            key, sk = jax.random.split(key)
            state, loss, _ = step(
                state,
                BCBatch(jnp.asarray(b["input_ids"]), jnp.asarray(b["training_mask"])),
                sk,
            )
            losses.append(float(loss))

    acc_trained, per_cell = per_cell_optimal_move_accuracy(
        _policy_act(server, state.model.params, tokenizer, sampling), maze, GOAL
    )

    assert losses[-1] < losses[0], "BC loss did not decrease"
    assert acc_trained > acc_init + 0.2, (
        f"no learning: init={acc_init:.3f} trained={acc_trained:.3f}"
    )
    assert acc_trained >= 0.5, (
        f"per-cell optimal-move accuracy too low: {acc_trained:.3f}\n"
        + "\n".join(f"{c}: {v}" for c, v in sorted(per_cell.items()))
    )
