"""PPO: data pipeline (chain combine, GAE, scatter) + train step."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from lmrl_gym_tpu.algos.ppo import (
    AdaptiveKLController,
    CombinedChain,
    FixedKLController,
    PPOBatch,
    PPOConfig,
    PPOTrainState,
    action_state_next_state_idxs,
    block_ppo_data,
    get_ppo_data_from_chains,
    make_ppo_forward_fn,
    make_ppo_train_step,
    token_logprobs_from_logits,
)
from lmrl_gym_tpu.core.blocking import BlockingStrategy, Padding, Truncation
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.heads import LinearHead, LinearHeadConfig, init_head_params
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.text.frames import (
    Text,
    TextTrajectory,
    TextTrajectoryChain,
    TokenTrajectoryChain,
)
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

TOK = ByteTokenizer()
CFG = tiny_test_config()
KEY = jax.random.PRNGKey(0)


def _chain(two_windows=False):
    t1 = TextTrajectory(
        (Text("ss", False), Text("ab", True)),
        (0.0, -1.0),
        not two_windows,
    )
    if not two_windows:
        return TokenTrajectoryChain.from_text_trajectory_chain(
            TextTrajectoryChain(t1, None), TOK
        )
    t2 = TextTrajectory(
        (Text("tt", False), Text("cd", True)),
        (0.0, 2.0),
        True,
    )
    return TokenTrajectoryChain.from_text_trajectory_chain(
        TextTrajectoryChain(
            TextTrajectory(t1.text_history, t1.reward, False),
            TextTrajectoryChain(t2, None),
        ),
        TOK,
    )


class TestCombinedChain:
    def test_single_window(self):
        cc = CombinedChain.from_chain(_chain())
        assert cc.chunk_lens == [3]  # 4 tokens → 3 transitions
        np.testing.assert_array_equal(cc.should_take_action, [False, True, True])
        np.testing.assert_allclose(cc.rewards, [0.0, 0.0, -1.0])
        assert bool(cc.done)

    def test_two_windows(self):
        cc = CombinedChain.from_chain(_chain(two_windows=True))
        assert cc.chunk_lens == [3, 3]
        assert cc.input_tokens.shape == (6,)
        np.testing.assert_allclose(cc.rewards, [0, 0, -1, 0, 0, 2])

    def test_unroll(self):
        cc = CombinedChain.from_chain(_chain(two_windows=True))
        parts = cc.unroll(np.arange(6))
        assert [p.tolist() for p in parts] == [[0, 1, 2], [3, 4, 5]]


class TestIdxs:
    def test_basic(self):
        sta = np.asarray([False, True, False, True])
        a, s, ns = action_state_next_state_idxs(sta)
        np.testing.assert_array_equal(a, [1, 3])
        np.testing.assert_array_equal(ns, [3, 4])  # first action cleared + endpoint

    def test_no_actions(self):
        a, s, ns = action_state_next_state_idxs(np.asarray([False, False]))
        assert len(a) == 0 and len(ns) == 0


class TestPipeline:
    def test_single_chain_gae_hand_computed(self):
        """Controlled forward → exact GAE check for one window.

        tokens 'ssab' (4), transitions 3: positions [s, a, b] with actions
        at idx 1,2 and rewards [0, -1]. values constant c; logprob ratio 0
        (same params) → no KL. γ=1, λ=1 ⇒
          next_state idxs = [2, 3(bootstrap)]; done=True ⇒ v_bootstrap=0
          adv_2 = r_2 + v_boot − v_c = −1 − c
          adv_1 = (r_1 + v_c − v_c) + adv_2 = −1 − c
        """
        chain = _chain()
        C = 0.5

        def forward_fn(tokens):
            b, t = tokens.shape
            lp = np.full((b, t - 1), -1.0, np.float32)
            return lp, lp.copy(), np.full((b, t), C, np.float32)

        datas, kls = get_ppo_data_from_chains(
            forward_fn, TOK, [chain], bsize=4, max_length=8,
            gamma=1.0, lam=1.0, kl_weight=0.1, use_advantage_whitening=False,
        )
        assert len(datas) == 1
        d = datas[0]
        np.testing.assert_allclose(kls, 0.0, atol=1e-6)
        expected_adv = -1.0 - C
        np.testing.assert_allclose(
            d.old_advantages, [0.0, expected_adv, expected_adv], atol=1e-5
        )
        np.testing.assert_allclose(
            d.old_returns, [0.0, expected_adv + C, expected_adv + C], atol=1e-5
        )
        np.testing.assert_allclose(d.old_values, C)
        np.testing.assert_array_equal(d.should_take_action, [False, True, True])

    def test_kl_penalty_shifts_rewards(self):
        chain = _chain()

        def forward_fn(tokens):
            b, t = tokens.shape
            init_lp = np.full((b, t - 1), -1.0, np.float32)
            lp = np.full((b, t - 1), -0.5, np.float32)  # ratio 0.5 per token
            return init_lp, lp, np.zeros((b, t), np.float32)

        datas_nokl, _ = get_ppo_data_from_chains(
            forward_fn, TOK, [chain], bsize=4, max_length=8,
            gamma=1.0, lam=1.0, kl_weight=0.0, use_advantage_whitening=False,
        )
        datas_kl, kls = get_ppo_data_from_chains(
            forward_fn, TOK, [chain], bsize=4, max_length=8,
            gamma=1.0, lam=1.0, kl_weight=1.0, use_advantage_whitening=False,
        )
        assert (kls > 0).all()
        # KL penalty lowers returns at action positions
        assert datas_kl[0].old_returns[1] < datas_nokl[0].old_returns[1]

    def test_multi_chain_whitening(self):
        chains = [_chain(), _chain(two_windows=True)]

        def forward_fn(tokens):
            b, t = tokens.shape
            rng = np.random.RandomState(0)
            lp = rng.randn(b, t - 1).astype(np.float32)
            return lp, lp.copy(), rng.randn(b, t).astype(np.float32)

        datas, _ = get_ppo_data_from_chains(
            forward_fn, TOK, chains, bsize=2, max_length=8,
            gamma=0.99, lam=0.95, kl_weight=0.0, use_advantage_whitening=True,
        )
        assert len(datas) == 3  # 1 + 2 windows
        all_adv = np.concatenate(
            [d.old_advantages[d.should_take_action] for d in datas]
        )
        assert abs(all_adv.mean()) < 1e-4  # whitened across the batch

    def test_real_model_forward_fn(self):
        core = LMCore(CFG)
        params = init_params(CFG, KEY)
        vh_cfg = LinearHeadConfig(input_dim=CFG.hidden_size, output_dim=1, bias_init=-1.0)
        value_head = LinearHead(vh_cfg)
        vh_params = init_head_params(value_head, CFG.hidden_size, KEY)
        forward_fn = make_ppo_forward_fn(
            core, value_head, params, params, vh_params, TOK.pad_token_id
        )
        datas, kls = get_ppo_data_from_chains(
            forward_fn, TOK, [_chain(two_windows=True)], bsize=2, max_length=10,
            gamma=0.99, lam=0.95, kl_weight=0.05,
        )
        assert len(datas) == 2
        np.testing.assert_allclose(kls, 0.0, atol=1e-5)  # π == π₀
        for d in datas:
            assert np.isfinite(d.old_advantages).all()

    def test_block_ppo_data(self):
        chain = _chain()

        def forward_fn(tokens):
            b, t = tokens.shape
            z = np.zeros((b, t - 1), np.float32)
            return z, z.copy(), np.zeros((b, t), np.float32)

        datas, _ = get_ppo_data_from_chains(
            forward_fn, TOK, [chain], bsize=1, max_length=8,
            gamma=1.0, lam=1.0, kl_weight=0.0,
        )
        blocked = block_ppo_data(
            datas * 2, BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, 8), TOK.pad_token_id
        )
        assert blocked["input_ids"].shape == (2, 8)
        assert blocked["old_advantages"].shape == (2, 7)


class TestTrainStep:
    def test_loss_decreases(self):
        core = LMCore(CFG)
        params = init_params(CFG, KEY)
        vh = LinearHead(LinearHeadConfig(input_dim=CFG.hidden_size, output_dim=1))
        state = PPOTrainState(
            policy=TrainState.create(apply_fn=None, params=params, tx=optax.adam(1e-4)),
            value_head=TrainState.create(
                apply_fn=None,
                params=init_head_params(vh, CFG.hidden_size, KEY),
                tx=optax.adam(1e-3),
            ),
        )
        step = make_ppo_train_step(core, vh, PPOConfig(), TOK.pad_token_id)
        b, t = 4, 10
        sta = jnp.zeros((b, t - 1), bool).at[:, 3:].set(True)
        batch = PPOBatch(
            input_ids=jax.random.randint(KEY, (b, t), 1, CFG.vocab_size),
            should_take_action=sta,
            old_logprobs=jnp.full((b, t - 1), -2.0),
            old_values=jnp.zeros((b, t - 1)),
            old_advantages=jnp.ones((b, t - 1)) * sta,
            old_returns=jnp.ones((b, t - 1)) * sta,
        )
        losses = []
        for i in range(6):
            state, loss, logs = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_bc_mixing(self):
        core = LMCore(CFG)
        params = init_params(CFG, KEY)
        vh = LinearHead(LinearHeadConfig(input_dim=CFG.hidden_size, output_dim=1))
        state = PPOTrainState(
            policy=TrainState.create(apply_fn=None, params=params, tx=optax.adam(1e-4)),
            value_head=TrainState.create(
                apply_fn=None,
                params=init_head_params(vh, CFG.hidden_size, KEY),
                tx=optax.adam(1e-3),
            ),
        )
        step = make_ppo_train_step(
            core, vh, PPOConfig(bc_loss_weight=1.0), TOK.pad_token_id
        )
        b, t = 2, 8
        sta = jnp.ones((b, t - 1), bool)
        batch = PPOBatch(
            input_ids=jax.random.randint(KEY, (b, t), 1, CFG.vocab_size),
            should_take_action=sta,
            old_logprobs=jnp.full((b, t - 1), -2.0),
            old_values=jnp.zeros((b, t - 1)),
            old_advantages=jnp.ones((b, t - 1)),
            old_returns=jnp.ones((b, t - 1)),
            bc_input_ids=jax.random.randint(KEY, (b, t), 1, CFG.vocab_size),
            bc_training_mask=jnp.ones((b, t)),
        )
        state, loss, logs = step(state, batch, KEY)
        assert "bc_loss" in logs
        assert np.isfinite(float(loss))


class TestKLControllers:
    def test_fixed(self):
        c = FixedKLController(0.1)
        c.update(5.0, 100)
        assert c.value == 0.1

    def test_adaptive(self):
        c = AdaptiveKLController(0.1, target=1.0, horizon=100)
        v0 = c.value
        c.update(2.0, 10)  # kl above target → coef rises
        assert c.value > v0
        c2 = AdaptiveKLController(0.1, target=1.0, horizon=100)
        c2.update(0.1, 10)  # below target → coef falls
        assert c2.value < 0.1


def test_token_logprobs():
    logits = jnp.zeros((1, 3, 5))
    ids = jnp.asarray([[0, 1, 2]])
    lp = token_logprobs_from_logits(logits, ids)
    np.testing.assert_allclose(np.asarray(lp), np.log(1 / 5), rtol=1e-5)
