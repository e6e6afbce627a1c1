"""Algorithm train steps: ILQL, BC, MC on a tiny model (CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lmrl_gym_tpu.algos.bc import BCBatch, BCConfig, BCTrainState, make_bc_train_step
from lmrl_gym_tpu.algos.data import (
    ArrayDataset,
    BCExample,
    ILQLExample,
    MCExample,
    block_bc_examples,
    block_ilql_examples,
    filter_items,
    reward_to_go_np,
)
from lmrl_gym_tpu.algos.ilql import (
    ILQLBatch,
    ILQLConfig,
    init_ilql_state,
    make_ilql_train_step,
)
from lmrl_gym_tpu.algos.mc import MCBatch, MCConfig, MCTrainState, make_mc_train_step
from lmrl_gym_tpu.core.blocking import BlockingStrategy, Padding, Truncation
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.heads import (
    MLPHead,
    MLPHeadConfig,
    init_head_params,
)
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.text.frames import Text, TextTrajectory, TextTrajectoryChain, TokenTrajectoryChain
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer
from flax.training.train_state import TrainState

TOK = ByteTokenizer()
CFG = tiny_test_config()
KEY = jax.random.PRNGKey(0)


def _mk_chain(done=True, with_next=False):
    t1 = TextTrajectory(
        (Text("s1", False), Text("aa", True), Text("s2", False), Text("bb", True)),
        (0.0, -1.0, 0.0, -1.0),
        done and not with_next,
    )
    if not with_next:
        return TextTrajectoryChain(t1, None)
    t2 = TextTrajectory(
        (Text("s3", False), Text("cc", True)),
        (0.0, 0.0),
        True,
    )
    return TextTrajectoryChain(
        TextTrajectory(t1.text_history, t1.reward, False),
        TextTrajectoryChain(t2, None),
    )


class TestILQLData:
    def test_example_no_next(self):
        chain = TokenTrajectoryChain.from_text_trajectory_chain(_mk_chain(), TOK)
        ex = ILQLExample.from_chain(chain)
        assert ex.next_token_ids is None
        assert ex.input_ids.shape[0] == 8  # s1 aa s2 bb = 8 bytes
        assert ex.should_take_action.shape[0] == 7
        # rewards land on last token of each action segment (shifted)
        np.testing.assert_allclose(ex.rewards.sum(), -2.0)

    def test_example_with_next(self):
        chain = TokenTrajectoryChain.from_text_trajectory_chain(
            _mk_chain(with_next=True), TOK
        )
        ex = ILQLExample.from_chain(chain)
        # next window "s3cc": tokens up to first action = "s3" (2 tokens)
        assert ex.next_token_ids.shape[0] == 2
        assert bool(ex.next_done) is False

    def test_block(self):
        chain = TokenTrajectoryChain.from_text_trajectory_chain(
            _mk_chain(with_next=True), TOK
        )
        exs = [ILQLExample.from_chain(chain)] * 3
        blocked = block_ilql_examples(
            exs,
            BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, 12),
            TOK.pad_token_id,
        )
        assert blocked["input_ids"].shape == (3, 12)
        assert blocked["should_take_action"].shape == (3, 11)
        assert blocked["next_token_ids"].shape == (3, 12)


class TestRTG:
    def test_reward_to_go(self):
        r = np.asarray([1.0, 0.0, 2.0], np.float32)
        np.testing.assert_allclose(
            reward_to_go_np(r, 0.5), [1 + 0.25 * 2, 0.5 * 2, 2.0]
        )

    def test_mc_example_scatter(self):
        chain = TokenTrajectoryChain.from_text_trajectory_chain(
            _mk_chain(with_next=True), TOK
        )
        ex = MCExample.from_chain(chain, gamma=1.0)
        # chain rewards: [-1 (aa), -1 (bb)] in win 1 + [0 (cc)] in win 2
        # action tokens per segment: 2 each → rtg over 6 action tokens
        sta = ex.should_take_action
        assert ex.returns[~sta].sum() == 0.0
        assert (ex.returns[sta] <= 0).all()


class TestFilter:
    def test_top_fraction(self):
        items = [1, 5, 3, 2, 4]
        top = filter_items(lambda x: x, items, 0.4)
        assert sorted(top) == [4, 5]


def _ilql_setup(grad_accum=1):
    base_params = init_params(CFG, KEY)
    head_cfg = MLPHeadConfig(
        input_dim=CFG.hidden_size,
        hidden_dim=2 * CFG.hidden_size,
        output_dim=CFG.padded_vocab_size,
        layer2_initializer_range=0.0,
        layer2_bias_init=0.0,
    )
    v_cfg = MLPHeadConfig(
        input_dim=CFG.hidden_size,
        hidden_dim=2 * CFG.hidden_size,
        output_dim=1,
        layer2_initializer_range=0.0,
        layer2_bias_init=0.0,
    )
    q_head, v_head = MLPHead(head_cfg), MLPHead(v_cfg)
    ks = jax.random.split(KEY, 4)
    tx = optax.adam(1e-3)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    config = ILQLConfig(polyak_alpha=0.1)
    state = init_ilql_state(
        base_params,
        init_head_params(q_head, CFG.hidden_size, ks[0]),
        init_head_params(q_head, CFG.hidden_size, ks[1]),
        init_head_params(v_head, CFG.hidden_size, ks[2]),
        optax.adam(1e-4),
        tx,
        config,
    )
    core = LMCore(CFG)
    step = make_ilql_train_step(core, q_head, v_head, config, TOK.pad_token_id)
    return state, step, core, q_head, v_head, config


def _ilql_batch(b=4, t=12):
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
    sta = jax.random.bernoulli(ks[1], 0.4, (b, t - 1))
    sta = sta.at[:, 0].set(True)
    return ILQLBatch(
        input_ids=jax.random.randint(ks[0], (b, t), 1, CFG.vocab_size),
        should_take_action=sta,
        rewards=-1.0 * sta.astype(jnp.float32),
        dones=jnp.asarray([True, False, True, False]),
        next_token_ids=jax.random.randint(ks[2], (b, 6), 1, CFG.vocab_size),
        next_dones=jnp.asarray([True, False, False, True]),
    )


class TestILQLStep:
    def test_freeze_base_trains_heads_only(self):
        """freeze_base: heads learn, trunk params bit-identical after
        steps (the r4 stabilizer for high-capacity trunks)."""
        base_params = init_params(CFG, KEY)
        head_cfg = MLPHeadConfig(
            input_dim=CFG.hidden_size, hidden_dim=2 * CFG.hidden_size,
            output_dim=CFG.padded_vocab_size, layer2_initializer_range=0.0,
        )
        v_cfg = MLPHeadConfig(
            input_dim=CFG.hidden_size, hidden_dim=2 * CFG.hidden_size,
            output_dim=1, layer2_initializer_range=0.0,
        )
        q_head, v_head = MLPHead(head_cfg), MLPHead(v_cfg)
        ks = jax.random.split(KEY, 4)
        config = ILQLConfig(
            polyak_alpha=0.1, freeze_base=True, use_separate_target_base=False
        )
        state = init_ilql_state(
            base_params,
            init_head_params(q_head, CFG.hidden_size, ks[0]),
            init_head_params(q_head, CFG.hidden_size, ks[1]),
            init_head_params(v_head, CFG.hidden_size, ks[2]),
            optax.set_to_zero(),
            optax.adam(1e-3),
            config,
        )
        core = LMCore(CFG)
        step = make_ilql_train_step(core, q_head, v_head, config, TOK.pad_token_id)
        base_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.base.params)
        q1_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.q1_head.params)
        batch = _ilql_batch()
        for i in range(3):
            state, loss, _ = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))
        for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(state.base.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(q1_before), jax.tree.leaves(state.q1_head.params))
        )

    def test_loss_decreases(self):
        state, step, *_ = _ilql_setup()
        batch = _ilql_batch()
        losses = []
        for i in range(8):
            state, loss, logs = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_polyak_moves_targets(self):
        state, step, *_ = _ilql_setup()
        q1_target_before = jax.tree.leaves(state.q1_target_params)[0].copy()
        batch = _ilql_batch()
        state, _, _ = step(state, batch, KEY)
        q1_after = jax.tree.leaves(state.q1_target_params)[0]
        # zero-init last layer means leaf 0 (dense1 bias or kernel) changed
        # via polyak mixing toward updated online params
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state.q1_target_params),
                jax.tree.leaves(
                    jax.tree.map(lambda x: x * 0, state.q1_target_params)
                ),
            )
        ) or not np.allclose(np.asarray(q1_target_before), np.asarray(q1_after))
        assert moved

    def test_grad_accum_gates_target_update(self):
        state, step, *_ = _ilql_setup(grad_accum=2)
        batch = _ilql_batch()
        targets0 = jax.tree.map(np.asarray, state.q1_target_params)
        # microstep 1 of 2: targets must NOT move
        state, _, _ = step(state, batch, KEY)
        targets1 = jax.tree.map(np.asarray, state.q1_target_params)
        for a, b in zip(jax.tree.leaves(targets0), jax.tree.leaves(targets1)):
            np.testing.assert_array_equal(a, b)
        # microstep 2 completes the real update: targets move now
        state, _, _ = step(state, batch, KEY)
        targets2 = jax.tree.map(np.asarray, state.q1_target_params)
        moved = any(
            not np.array_equal(a, b)
            for a, b in zip(jax.tree.leaves(targets1), jax.tree.leaves(targets2))
        )
        assert moved

    def test_no_next_tokens_path(self):
        state, step_fn, core, q_head, v_head, config = _ilql_setup()
        step = make_ilql_train_step(core, q_head, v_head, config, TOK.pad_token_id)
        b = _ilql_batch()
        batch = ILQLBatch(b.input_ids, b.should_take_action, b.rewards, b.dones, None, None)
        state, loss, _ = step(state, batch, KEY)
        assert np.isfinite(float(loss))


class TestBCStep:
    def test_loss_decreases_and_memorizes(self):
        core = LMCore(CFG)
        params = init_params(CFG, KEY)
        state = BCTrainState(
            model=TrainState.create(apply_fn=None, params=params, tx=optax.adam(3e-3))
        )
        step = make_bc_train_step(core, BCConfig(), TOK.pad_token_id)
        text = "move up\nmove down\n"
        ids = jnp.asarray([TOK.encode(text)] * 4, jnp.int32)
        batch = BCBatch(input_ids=ids, training_mask=jnp.ones_like(ids, jnp.float32))
        losses = []
        for i in range(30):
            state, loss, _ = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5

    def test_bc_example_block(self):
        exs = [
            BCExample.from_segments(
                np.asarray([1, 2, 3], np.int32), np.asarray([0, 1, 1], bool)
            )
        ]
        blocked = block_bc_examples(
            exs, BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, 5), 0
        )
        np.testing.assert_array_equal(blocked["input_ids"][0], [1, 2, 3, 0, 0])
        np.testing.assert_array_equal(blocked["training_mask"][0], [0, 1, 1, 0, 0])


class TestMCStep:
    def test_loss_decreases(self):
        core = LMCore(CFG)
        base_params = init_params(CFG, KEY)
        q_cfg = MLPHeadConfig(
            input_dim=CFG.hidden_size,
            hidden_dim=128,
            output_dim=CFG.padded_vocab_size,
            layer2_initializer_range=0.0,
        )
        q_head = MLPHead(q_cfg)
        state = MCTrainState(
            base=TrainState.create(apply_fn=None, params=base_params, tx=optax.adam(1e-4)),
            q_head=TrainState.create(
                apply_fn=None,
                params=init_head_params(q_head, CFG.hidden_size, KEY),
                tx=optax.adam(1e-3),
            ),
        )
        step = make_mc_train_step(core, q_head, MCConfig(cql_weight=0.0), TOK.pad_token_id)
        b, t = 4, 10
        sta = jax.random.bernoulli(jax.random.PRNGKey(5), 0.5, (b, t - 1))
        sta = sta.at[:, 0].set(True)
        batch = MCBatch(
            input_ids=jax.random.randint(KEY, (b, t), 1, CFG.vocab_size),
            should_take_action=sta,
            returns=-2.0 * sta.astype(jnp.float32),
        )
        losses = []
        for i in range(10):
            state, loss, _ = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestArrayDataset:
    def test_batches(self):
        ds = ArrayDataset({"x": np.arange(10), "y": None})
        batches = list(ds.batches(3, rng=np.random.default_rng(0)))
        assert len(batches) == 3
        assert all(b["x"].shape == (3,) for b in batches)
        seen = np.concatenate([b["x"] for b in batches])
        assert len(np.unique(seen)) == 9


class TestCQLStep:
    def test_loss_decreases(self):
        import optax
        from lmrl_gym_tpu.algos.cql import (
            CQLConfig,
            init_cql_state,
            make_cql_train_step,
        )

        core = LMCore(CFG)
        base_params = init_params(CFG, KEY)
        q_cfg = MLPHeadConfig(
            input_dim=CFG.hidden_size,
            hidden_dim=128,
            output_dim=CFG.padded_vocab_size,
            layer2_initializer_range=0.0,
        )
        q_head = MLPHead(q_cfg)
        ks = jax.random.split(KEY, 2)
        config = CQLConfig(polyak_alpha=0.05)
        state = init_cql_state(
            base_params,
            init_head_params(q_head, CFG.hidden_size, ks[0]),
            init_head_params(q_head, CFG.hidden_size, ks[1]),
            optax.adam(1e-4),
            optax.adam(1e-3),
            config,
        )
        step = make_cql_train_step(core, q_head, config, TOK.pad_token_id)
        batch = _ilql_batch()
        losses = []
        for i in range(8):
            state, loss, logs = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_no_next_tokens_path(self):
        import optax
        from lmrl_gym_tpu.algos.cql import (
            CQLConfig,
            init_cql_state,
            make_cql_train_step,
        )

        core = LMCore(CFG)
        q_cfg = MLPHeadConfig(
            input_dim=CFG.hidden_size,
            hidden_dim=128,
            output_dim=CFG.padded_vocab_size,
            layer2_initializer_range=0.0,
        )
        q_head = MLPHead(q_cfg)
        config = CQLConfig(use_separate_target_base=False)
        state = init_cql_state(
            init_params(CFG, KEY),
            init_head_params(q_head, CFG.hidden_size, KEY),
            init_head_params(q_head, CFG.hidden_size, jax.random.PRNGKey(2)),
            optax.adam(1e-4),
            optax.adam(1e-3),
            config,
        )
        step = make_cql_train_step(core, q_head, config, TOK.pad_token_id)
        b = _ilql_batch()
        batch = ILQLBatch(b.input_ids, b.should_take_action, b.rewards, b.dones, None, None)
        state, loss, _ = step(state, batch, KEY)
        assert np.isfinite(float(loss))
