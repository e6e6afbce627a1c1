"""Serving layer: value-guided decode, text policies, rerankers."""
import jax
import jax.numpy as jnp
import numpy as np

from lmrl_gym_tpu.algos.value_policy import (
    GenerationPolicy,
    LMServer,
    ReRankerPolicy,
    ValueGuidedServer,
    ValueRLParams,
    make_ilql_score_fn,
    make_logprob_score_fn,
    make_mc_score_fn,
    tokenize_histories_for_scoring,
)
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.generation import SamplingConfig
from lmrl_gym_tpu.models.heads import (
    LinearHead,
    LinearHeadConfig,
    MLPHead,
    MLPHeadConfig,
    init_head_params,
)
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.text.frames import Text
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

TOK = ByteTokenizer()
CFG = tiny_test_config()
KEY = jax.random.PRNGKey(0)


def _mk_value_setup(zero_q=True, with_pi=True):
    core = LMCore(CFG)
    base = init_params(CFG, KEY)
    pi = init_params(CFG, jax.random.PRNGKey(1)) if with_pi else None
    q_cfg = MLPHeadConfig(
        input_dim=CFG.hidden_size,
        hidden_dim=64,
        output_dim=CFG.padded_vocab_size,
        layer2_initializer_range=0.0 if zero_q else 0.02,
    )
    v_cfg = MLPHeadConfig(
        input_dim=CFG.hidden_size, hidden_dim=64, output_dim=1,
        layer2_initializer_range=0.0 if zero_q else 0.02,
    )
    q_head, v_head = MLPHead(q_cfg), MLPHead(v_cfg)
    ks = jax.random.split(KEY, 4)
    params = ValueRLParams(
        pi_beta=pi,
        base=base,
        q1_head=init_head_params(q_head, CFG.hidden_size, ks[0]),
        q2_head=init_head_params(q_head, CFG.hidden_size, ks[1]),
        v_head=init_head_params(v_head, CFG.hidden_size, ks[2]),
    )
    return core, q_head, v_head, params


class TestValueGuidedDecode:
    def test_zero_q_equals_pi_beta_greedy(self):
        """Zero-init Q heads → guided greedy decode == plain π_β greedy."""
        core, q_head, v_head, params = _mk_value_setup(zero_q=True)
        server = ValueGuidedServer(core, q_head, v_head, TOK, beta=8.0)
        lm = LMServer(core, TOK)
        prompt = jax.random.randint(KEY, (2, 6), 0, CFG.vocab_size)
        mask = jnp.ones((2, 6), jnp.int32)
        cfg = SamplingConfig(max_new_tokens=6, greedy=True)
        guided, _ = server.generate(params, prompt, mask, cfg, KEY)
        plain, _ = lm.generate(params.pi_beta, prompt, mask, cfg, KEY)
        np.testing.assert_array_equal(np.asarray(guided), np.asarray(plain))

    def test_beta_changes_output(self):
        """Non-zero Q heads with large beta shift the argmax for some step."""
        core, q_head, v_head, params = _mk_value_setup(zero_q=False)
        prompt = jax.random.randint(KEY, (2, 6), 0, CFG.vocab_size)
        mask = jnp.ones((2, 6), jnp.int32)
        cfg = SamplingConfig(max_new_tokens=8, greedy=True)
        s_small = ValueGuidedServer(core, q_head, v_head, TOK, beta=0.0)
        s_large = ValueGuidedServer(core, q_head, v_head, TOK, beta=1000.0)
        out_small, _ = s_small.generate(params, prompt, mask, cfg, KEY)
        out_large, _ = s_large.generate(params, prompt, mask, cfg, KEY)
        assert not np.array_equal(np.asarray(out_small), np.asarray(out_large))

    def test_share_trunk_mode(self):
        core, q_head, v_head, params = _mk_value_setup(zero_q=True, with_pi=False)
        server = ValueGuidedServer(core, q_head, v_head, TOK, beta=4.0, share_trunk=True)
        prompt = jax.random.randint(KEY, (1, 4), 0, CFG.vocab_size)
        out, m = server.generate(
            params, prompt, jnp.ones((1, 4), jnp.int32),
            SamplingConfig(max_new_tokens=4, greedy=True), KEY,
        )
        assert out.shape == (1, 4)

    def test_generate_from_strs(self):
        core, q_head, v_head, params = _mk_value_setup()
        server = ValueGuidedServer(core, q_head, v_head, TOK, beta=1.0)
        outs = server.generate_from_strs(
            params,
            ["hello", "a longer prompt here"],
            max_input_length=16,
            sampling=SamplingConfig(max_new_tokens=5, greedy=True),
            key=KEY,
        )
        assert len(outs) == 2
        assert all(isinstance(o, str) for o in outs)


class TestGenerationPolicy:
    def test_act_with_done_slots(self):
        calls = []

        def fake_generate(prompts, key):
            calls.append(list(prompts))
            return [p + "ACT" for p in prompts]

        policy = GenerationPolicy(generate_batch=fake_generate, key=KEY)
        h1 = (Text("s1", False),)
        h2 = (Text("s2", False),)
        out = policy.act([h1, h2, h1], done=[False, True, False])
        assert out[1] is None
        assert out[0][-1] == Text("ACT", True)
        assert out[0][-1].is_action
        # only live prompts hit the model
        assert calls == [["s1", "s1"]]

    def test_all_done(self):
        policy = GenerationPolicy(generate_batch=lambda p, k: [], key=KEY)
        out = policy.act([(Text("x", False),)], done=[True])
        assert out == [None]


class TestScoreFns:
    def test_logprob_score_prefers_likely(self):
        core = LMCore(CFG)
        params = init_params(CFG, KEY)
        score = make_logprob_score_fn(core, params, TOK.pad_token_id)
        h = (Text("state", False),)
        proposals = [h + (Text("aa", True),), h + (Text("bb", True),)]
        ids, am = tokenize_histories_for_scoring(proposals, TOK, 16)
        scores = np.asarray(score(ids, am))
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()

    def test_ilql_score_zero_heads(self):
        core, q_head, v_head, params = _mk_value_setup(zero_q=True)
        score = make_ilql_score_fn(
            core, q_head, v_head, params, TOK.pad_token_id, value_weight=1.0
        )
        h = (Text("state", False),)
        ids, am = tokenize_histories_for_scoring(
            [h + (Text("go", True),)], TOK, 12
        )
        s = np.asarray(score(ids, am))
        np.testing.assert_allclose(s, 0.0, atol=1e-5)  # Q=V=0

    def test_mc_score(self):
        core, q_head, v_head, params = _mk_value_setup(zero_q=False)
        score = make_mc_score_fn(core, q_head, params, TOK.pad_token_id)
        h = (Text("state", False),)
        ids, am = tokenize_histories_for_scoring(
            [h + (Text("go", True),), h + (Text("stop!", True),)], TOK, 12
        )
        s = np.asarray(score(ids, am))
        assert s.shape == (2,) and np.isfinite(s).all()


class TestReRanker:
    def test_argmax_choice(self):
        h = (Text("obs", False),)
        actions = ["a", "b", "c"]

        def proposal_fn(history):
            return [history + (Text(a, True),) for a in actions]

        def score_batch(histories):
            # prefer 'b'
            return np.asarray(
                [1.0 if hist[-1].text == "b" else 0.0 for hist in histories]
            )

        policy = ReRankerPolicy(proposal_fn=proposal_fn, score_batch=score_batch)
        out = policy.act([h, h], done=[False, True])
        assert out[0][-1].text == "b"
        assert out[1] is None

    def test_sample_choice_distribution(self):
        h = (Text("o", False),)

        def proposal_fn(history):
            return [history + (Text(a, True),) for a in "ab"]

        def score_batch(histories):
            return np.asarray([10.0 if hist[-1].text == "a" else -10.0 for hist in histories])

        policy = ReRankerPolicy(
            proposal_fn=proposal_fn,
            score_batch=score_batch,
            sample=True,
            rng=np.random.default_rng(0),
        )
        outs = [policy.act([h])[0][-1].text for _ in range(20)]
        assert outs.count("a") >= 19  # overwhelming preference


def test_human_policy_scripted_input():
    from lmrl_gym_tpu.envs.human import HumanPolicy
    from lmrl_gym_tpu.text.frames import Text

    fed, shown = iter(["move up"]), []
    policy = HumanPolicy(input_fn=lambda _: next(fed), print_fn=shown.append)
    history = (Text("obs1\n", False),)
    out = policy.act(history)
    assert shown == ["obs1\n"]
    assert out[-1] == Text("move up\n", True)
