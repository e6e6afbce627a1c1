"""End-to-end slices: offline BC on maze (train → eval rollout),
checkpoint save/load/resume, online round loop."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training.train_state import TrainState

from lmrl_gym_tpu.algos.bc import BCBatch, BCConfig, BCTrainState, make_bc_train_step
from lmrl_gym_tpu.algos.data import ArrayDataset, BCExample, block_bc_examples
from lmrl_gym_tpu.algos.value_policy import GenerationPolicy, LMServer
from lmrl_gym_tpu.core.blocking import BlockingStrategy, Padding, Truncation
from lmrl_gym_tpu.envs.base import text_env_eval
from lmrl_gym_tpu.envs.maze.env import MazeEnv
from lmrl_gym_tpu.envs.maze.grids import double_t_maze, maze_solver
from lmrl_gym_tpu.loops.checkpoints import (
    CheckpointManager,
    LoopState,
    dump_modules,
    load_module_params,
)
from lmrl_gym_tpu.loops.offline import OfflineLoopConfig, offline_train_loop
from lmrl_gym_tpu.loops.online import OnlineLoopConfig, online_train_loop
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.generation import SamplingConfig
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.text.frames import Text, TokenHistory
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

TOK = ByteTokenizer()
GOAL = (8, 6)
KEY = jax.random.PRNGKey(0)


def _maze_bc_dataset(max_len=144):
    """(obs, optimal action) conversations over all double-T cells."""
    maze = double_t_maze()
    solver = maze_solver(maze, GOAL)
    env = MazeEnv(maze=maze, valid_goals=np.asarray([GOAL]), max_steps=10)
    examples = []
    for cell, action in solver.items():
        env.reset(seed=0, options={"goal": GOAL, "init_position": cell})
        obs = env.describe_function(maze, cell, GOAL, None)
        history = (Text(obs, False), Text(action, True))
        th = TokenHistory.from_text_history(history, TOK)
        examples.append(BCExample.from_segments(th.tokens, th.is_action))
    blocked = block_bc_examples(
        examples,
        BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, max_len),
        TOK.pad_token_id,
    )
    return ArrayDataset(blocked), solver


# small config tuned so the test trains in ~a minute on CPU
CFG = tiny_test_config(hidden_size=96, num_layers=2, num_heads=4, max_position_embeddings=256)


@pytest.fixture(scope="module")
def trained_bc():
    dataset, solver = _maze_bc_dataset()
    core = LMCore(CFG)
    params = init_params(CFG, KEY)
    state = BCTrainState(
        model=TrainState.create(apply_fn=None, params=params, tx=optax.adam(1e-3))
    )
    step = make_bc_train_step(core, BCConfig(), TOK.pad_token_id)

    def batch_prep(b):
        return BCBatch(
            input_ids=jnp.asarray(b["input_ids"]),
            training_mask=jnp.asarray(b["training_mask"]),
        )

    first_loss = {}

    def wrapped_step(s, b, r):
        s, loss, logs = step(s, b, r)
        first_loss.setdefault("v", float(loss))
        first_loss["last"] = float(loss)
        return s, loss, logs

    state, loop_state = offline_train_loop(
        state,
        wrapped_step,
        dataset,
        OfflineLoopConfig(epochs=60, train_bsize=8, log_every=None, eval_every_epochs=None, save_at_end=False),
        batch_prep=batch_prep,
    )
    return core, state, solver, first_loss, loop_state


@pytest.mark.slow
class TestOfflineBCMaze:
    def test_loss_decreases_strongly(self, trained_bc):
        _, _, _, first_loss, _ = trained_bc
        assert first_loss["last"] < first_loss["v"] * 0.2

    def test_step_count(self, trained_bc):
        _, _, _, _, loop_state = trained_bc
        assert loop_state.step == 60 * (25 // 8)

    def test_policy_rollout_reaches_goal(self, trained_bc):
        """Greedy decode from the trained BC model solves the maze from
        several start cells — the full serve path through text_env_eval."""
        core, state, solver, _, _ = trained_bc
        server = LMServer(core, TOK)
        sampling = SamplingConfig(
            max_new_tokens=16, greedy=True, eos_token_id=ord("\n"), pad_token_id=TOK.pad_token_id
        )

        def generate_batch(prompts, key):
            outs = server.generate_from_strs(
                state.model.params, prompts, max_input_length=144, sampling=sampling, key=key
            )
            # eos ('\n') is part of the emitted output (emit_mask=1 on
            # the eos step), so actions already end with the newline
            return [p + o for p, o in zip(prompts, outs)]

        policy = GenerationPolicy(generate_batch=generate_batch, key=KEY)
        env = MazeEnv(
            maze=double_t_maze(), valid_goals=np.asarray([GOAL]), max_steps=30,
            last_k=1,  # pure Markov window: current obs only (matches training)
        )
        interactions, summary = text_env_eval(
            env, policy, n_rollouts=8, seed_generator=iter(range(8)), bsize=4
        )
        # a memorizing model should solve most rollouts well within 30 steps
        assert summary["done"]["mean"] == 1.0
        assert summary["reward"]["mean"] > -30.0
        # and at least half the rollouts end in Success (reward 0 at goal)
        successes = sum(
            1 for rollout in interactions
            if rollout[-1].post_transition_history[-1].text == "Success\n"
        )
        assert successes >= 4, f"only {successes}/8 reached the goal"


class TestCheckpointing:
    def test_dump_and_load_modules(self):
        params = init_params(tiny_test_config(), KEY)
        state = TrainState.create(apply_fn=None, params=params, tx=optax.adam(1e-3))
        with tempfile.TemporaryDirectory() as d:
            dump_modules(d, {"base": state}, {"base": {"kind": "test"}})
            assert os.path.exists(os.path.join(d, "base", "params.msgpack"))
            loaded = load_module_params(d, "base", target=params)
            np.testing.assert_allclose(
                np.asarray(jax.tree.leaves(loaded)[0]),
                np.asarray(jax.tree.leaves(params)[0]),
            )

    def test_loop_state_roundtrip(self):
        ls = LoopState(step=10, epoch=2, best_perf=0.5)
        ls.saved_checkpoints.append("/tmp/x")
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "loop_state.pkl")
            ls.save(path)
            ls2 = LoopState.load(path)
            assert ls2.step == 10 and ls2.epoch == 2 and ls2.best_perf == 0.5
            assert list(ls2.saved_checkpoints) == ["/tmp/x"]

    def test_rolling_queue(self):
        params = {"w": np.ones(3)}
        with tempfile.TemporaryDirectory() as d:
            manager = CheckpointManager(d, max_checkpoints=2)
            ls = LoopState()
            for i in range(4):
                manager.save(f"step_{i}", ls, {"m": params})
            remaining = sorted(os.listdir(d))
            assert remaining == ["step_2", "step_3"]

    def test_resume_fast_forward(self):
        """offline loop resumes from loop_state.epoch."""
        dataset = ArrayDataset({"x": np.arange(8)})
        calls = []

        def step_fn(state, batch, rng):
            calls.append(batch["x"].tolist())
            return state, jnp.asarray(0.0), {}

        ls = LoopState(epoch=2)
        _, ls_out = offline_train_loop(
            object(),
            step_fn,
            dataset,
            OfflineLoopConfig(epochs=4, train_bsize=4, log_every=None, eval_every_epochs=None, save_at_end=False),
            loop_state=ls,
        )
        assert len(calls) == 2 * 2  # only epochs 2,3 ran
        assert ls_out.epoch == 4


class TestOnlineLoop:
    def test_rounds_and_skip(self):
        loads, steps = [], []

        def load_dataset(state, round_idx):
            loads.append(round_idx)
            if round_idx == 1:
                return None  # empty filter → skip round
            return ArrayDataset({"x": np.arange(4)})

        def step_fn(state, batch, rng):
            steps.append(1)
            return state, jnp.asarray(0.0), {}

        _, ls = online_train_loop(
            object(),
            step_fn,
            load_dataset,
            OnlineLoopConfig(
                n_rounds=3, epochs_per_round=2, train_bsize=2, log_every=None,
                eval_every_rounds=None, save_at_end=False,
            ),
        )
        assert loads == [0, 1, 2]
        assert len(steps) == 2 * 2 * 2  # rounds 0,2 × 2 epochs × 2 batches
        assert ls.round == 3

    def test_evaluator_and_best(self):
        perfs = iter([0.1, 0.5, 0.3])

        def load_dataset(state, r):
            return ArrayDataset({"x": np.arange(2)})

        def step_fn(state, batch, rng):
            return state, jnp.asarray(0.0), {}

        def evaluator(state):
            return next(perfs), {"perf": 1.0}

        with tempfile.TemporaryDirectory() as d:
            _, ls = online_train_loop(
                {"w": np.ones(2)},
                step_fn,
                load_dataset,
                OnlineLoopConfig(
                    n_rounds=3, epochs_per_round=1, train_bsize=2, log_every=None,
                    eval_every_rounds=1, save_at_end=False, save_dir=d,
                ),
                evaluator=evaluator,
                module_getter=lambda s: {"m": s},
            )
            assert ls.best_perf == 0.5
            assert os.path.exists(os.path.join(d, "best"))
