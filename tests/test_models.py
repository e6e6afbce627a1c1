"""Transformer, KV-cache decode, generation, heads, sharding."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as PS

from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.generation import SamplingConfig, generate, sample_token
from lmrl_gym_tpu.models.heads import (
    LinearHead,
    LinearHeadConfig,
    MLPHead,
    MLPHeadConfig,
    init_head_params,
)
from lmrl_gym_tpu.models.interface import LMCore, initialize_attn_mask_pos_ids
from lmrl_gym_tpu.models.transformer import KVCache, init_params, mask_pad_logits
from lmrl_gym_tpu.parallel.mesh import load_mesh, match_partition_rules, shard_pytree

CFG = tiny_test_config()
KEY = jax.random.PRNGKey(0)
PARAMS = init_params(CFG, KEY)


class TestForward:
    def test_shapes(self):
        core = LMCore(CFG)
        ids = jax.random.randint(KEY, (2, 10), 0, CFG.vocab_size)
        logits, hidden = core.forward(PARAMS, ids)
        assert logits.shape == (2, 10, CFG.padded_vocab_size)
        assert hidden.shape == (2, 10, CFG.hidden_size)

    def test_causality(self):
        """Changing token t must not affect logits before t."""
        core = LMCore(CFG)
        ids = jax.random.randint(KEY, (1, 12), 0, CFG.vocab_size)
        logits_a, _ = core.forward(PARAMS, ids)
        ids_b = ids.at[0, 8].set((ids[0, 8] + 1) % CFG.vocab_size)
        logits_b, _ = core.forward(PARAMS, ids_b)
        np.testing.assert_allclose(
            np.asarray(logits_a[0, :8]), np.asarray(logits_b[0, :8]), atol=1e-5
        )
        assert not np.allclose(np.asarray(logits_a[0, 8:]), np.asarray(logits_b[0, 8:]))

    def test_padding_invariance(self):
        """Left padding (masked) must not change the real tokens' logits."""
        core = LMCore(CFG)
        ids = jax.random.randint(KEY, (1, 6), 0, CFG.vocab_size)
        logits_plain, _ = core.forward(PARAMS, ids)
        padded = jnp.concatenate([jnp.full((1, 3), 7, jnp.int32), ids], axis=1)
        mask = jnp.concatenate(
            [jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 6), jnp.int32)], axis=1
        )
        logits_padded, _ = core.forward(PARAMS, padded, attention_mask=mask)
        np.testing.assert_allclose(
            np.asarray(logits_plain[0]), np.asarray(logits_padded[0, 3:]), atol=1e-4
        )

    def test_rotary_parallel_ffn_variant(self):
        cfg = tiny_test_config(
            position_embedding="rotary",
            rotary_dim=8,
            parallel_ffn=True,
            tie_word_embeddings=False,
        )
        params = init_params(cfg, KEY)
        core = LMCore(cfg)
        ids = jax.random.randint(KEY, (2, 7), 0, cfg.vocab_size)
        logits, _ = core.forward(params, ids)
        assert logits.shape == (2, 7, cfg.padded_vocab_size)
        assert np.isfinite(np.asarray(logits)).all()


class TestKVCache:
    def test_incremental_matches_full(self):
        """Decode one token at a time with the cache == full forward."""
        core = LMCore(CFG)
        T = 9
        ids = jax.random.randint(KEY, (2, T), 0, CFG.vocab_size)
        full_logits, _ = core.forward(PARAMS, ids)

        cache = KVCache.init(CFG, 2, T, dtype=jnp.float32)
        mask = jnp.zeros((2, T), jnp.int32)
        step_logits = []
        for t in range(T):
            mask = mask.at[:, t].set(1)
            logits, _, cache = core.module.apply(
                {"params": PARAMS},
                ids[:, t : t + 1],
                attention_mask=mask,
                position_ids=jnp.full((2, 1), t, jnp.int32),
                cache=cache,
                deterministic=True,
            )
            step_logits.append(logits[:, 0])
        inc = jnp.stack(step_logits, axis=1)
        np.testing.assert_allclose(np.asarray(full_logits), np.asarray(inc), atol=2e-4)

    def test_prefill_then_decode(self):
        """Prefill 6 tokens then decode 3 == full forward on 9."""
        core = LMCore(CFG)
        ids = jax.random.randint(KEY, (1, 9), 0, CFG.vocab_size)
        full_logits, _ = core.forward(PARAMS, ids)

        total = 9
        cache = KVCache.init(CFG, 1, total, dtype=jnp.float32)
        mask = jnp.zeros((1, total), jnp.int32).at[:, :6].set(1)
        logits_p, _, cache = core.module.apply(
            {"params": PARAMS},
            ids[:, :6],
            attention_mask=mask,
            position_ids=jnp.arange(6)[None],
            cache=cache,
            deterministic=True,
        )
        np.testing.assert_allclose(
            np.asarray(full_logits[:, :6]), np.asarray(logits_p), atol=2e-4
        )
        for t in range(6, 9):
            mask = mask.at[:, t].set(1)
            logits_t, _, cache = core.module.apply(
                {"params": PARAMS},
                ids[:, t : t + 1],
                attention_mask=mask,
                position_ids=jnp.full((1, 1), t, jnp.int32),
                cache=cache,
                deterministic=True,
            )
            np.testing.assert_allclose(
                np.asarray(full_logits[:, t]), np.asarray(logits_t[:, 0]), atol=2e-4
            )


class TestGeneration:
    def test_generate_shapes_and_determinism(self):
        core = LMCore(CFG)
        B, T_prompt, T_new = 3, 5, 8
        prompt = jax.random.randint(KEY, (B, T_prompt), 0, CFG.vocab_size)
        mask = jnp.ones((B, T_prompt), jnp.int32)
        logits_fn, carry = core.make_lm_logits_fn(PARAMS, T_prompt + T_new, B)
        cfg = SamplingConfig(max_new_tokens=T_new, greedy=True)
        toks1, m1 = generate(logits_fn, carry, prompt, mask, jax.random.PRNGKey(1), cfg)
        logits_fn, carry = core.make_lm_logits_fn(PARAMS, T_prompt + T_new, B)
        toks2, _ = generate(logits_fn, carry, prompt, mask, jax.random.PRNGKey(2), cfg)
        assert toks1.shape == (B, T_new)
        np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))  # greedy
        assert (np.asarray(toks1) < CFG.vocab_size).all()  # pad region masked

    def test_greedy_matches_full_forward_argmax(self):
        """Greedy decode step 1 == argmax of the full forward's last logits."""
        core = LMCore(CFG)
        prompt = jax.random.randint(KEY, (2, 6), 0, CFG.vocab_size)
        mask = jnp.ones((2, 6), jnp.int32)
        full_logits, _ = core.forward(PARAMS, prompt)
        expected = jnp.argmax(
            mask_pad_logits(full_logits[:, -1], CFG.vocab_size), axis=-1
        )
        logits_fn, carry = core.make_lm_logits_fn(PARAMS, 6 + 4, 2)
        toks, _ = generate(
            logits_fn, carry, prompt, mask, KEY, SamplingConfig(max_new_tokens=4, greedy=True)
        )
        np.testing.assert_array_equal(np.asarray(toks[:, 0]), np.asarray(expected))

    def test_left_padded_prompt(self):
        """Generation from a left-padded prompt == from the unpadded one."""
        core = LMCore(CFG)
        prompt = jax.random.randint(KEY, (1, 4), 0, CFG.vocab_size)
        m = jnp.ones((1, 4), jnp.int32)
        logits_fn, carry = core.make_lm_logits_fn(PARAMS, 10, 1)
        t_plain, _ = generate(
            logits_fn, carry, prompt, m, KEY, SamplingConfig(max_new_tokens=6, greedy=True)
        )
        padded = jnp.concatenate([jnp.zeros((1, 2), jnp.int32), prompt], axis=1)
        mp = jnp.concatenate([jnp.zeros((1, 2), jnp.int32), m], axis=1)
        logits_fn, carry = core.make_lm_logits_fn(PARAMS, 12, 1)
        t_padded, _ = generate(
            logits_fn, carry, padded, mp, KEY, SamplingConfig(max_new_tokens=6, greedy=True)
        )
        np.testing.assert_array_equal(np.asarray(t_plain), np.asarray(t_padded))

    def test_eos_stop(self):
        core = LMCore(CFG)
        prompt = jax.random.randint(KEY, (2, 3), 0, CFG.vocab_size)
        mask = jnp.ones((2, 3), jnp.int32)
        logits_fn, carry = core.make_lm_logits_fn(PARAMS, 3 + 5, 2)
        # force eos to be whatever greedy picks first → rows stop after 1 token
        first, _ = generate(
            logits_fn, carry, prompt, mask, KEY, SamplingConfig(max_new_tokens=1, greedy=True)
        )
        eos = int(first[0, 0])
        logits_fn, carry = core.make_lm_logits_fn(PARAMS, 3 + 5, 2)
        toks, m = generate(
            logits_fn,
            carry,
            prompt,
            mask,
            KEY,
            SamplingConfig(max_new_tokens=5, greedy=True, eos_token_id=eos, pad_token_id=0),
        )
        # row 0 emits eos then pads with mask 0
        assert int(toks[0, 0]) == eos
        assert m[0, 0] == 1
        np.testing.assert_array_equal(np.asarray(toks[0, 1:]), 0)
        np.testing.assert_array_equal(np.asarray(m[0, 1:]), 0)

    def test_top_p_top_k_run(self):
        logits = jnp.asarray([[1.0, 5.0, 2.0, -1.0]])
        t = sample_token(logits, KEY, SamplingConfig(top_k=1))
        assert int(t[0]) == 1
        t = sample_token(logits, KEY, SamplingConfig(top_p=0.5))
        assert int(t[0]) == 1


class TestHeads:
    def test_linear_head(self):
        cfg = LinearHeadConfig(input_dim=16, output_dim=1, bias_init=-4.1)
        head = LinearHead(cfg)
        params = init_head_params(head, 16, KEY)
        out = head.apply({"params": params}, jnp.zeros((2, 3, 16)))
        assert out.shape == (2, 3, 1)
        np.testing.assert_allclose(np.asarray(out), -4.1, atol=1e-5)

    def test_mlp_head_zero_init_last(self):
        cfg = MLPHeadConfig(
            input_dim=16,
            hidden_dim=32,
            output_dim=4,
            layer2_initializer_range=0.0,
            layer2_bias_init=0.0,
        )
        head = MLPHead(cfg)
        params = init_head_params(head, 16, KEY)
        out = head.apply({"params": params}, jnp.ones((2, 3, 16)))
        np.testing.assert_allclose(np.asarray(out), 0.0)
        np.testing.assert_array_equal(
            np.asarray(params["dense2"]["kernel"]), 0.0
        )


class TestSharding:
    def test_sharded_forward(self):
        """Forward under a dp×fsdp×mp mesh with the config partition rules."""
        mesh = load_mesh((1, 2, 4))
        rules = CFG.partition_rules()
        specs = match_partition_rules(rules, PARAMS)
        sharded_params = shard_pytree(PARAMS, specs, mesh)
        core = LMCore(CFG)
        ids = jax.device_put(
            jnp.zeros((8, 16), jnp.int32),
            NamedSharding(mesh, PS(("dp", "fsdp"), None)),
        )

        @jax.jit
        def f(p, i):
            logits, hidden = core.forward(p, i)
            return logits.sum()

        out = f(sharded_params, ids)
        assert np.isfinite(float(out))

    def test_attn_mask_pos_ids(self):
        ids = jnp.asarray([[0, 0, 5, 6], [5, 6, 7, 0]])
        mask, pos = initialize_attn_mask_pos_ids(ids, pad_token_id=0)
        np.testing.assert_array_equal(np.asarray(mask), [[0, 0, 1, 1], [1, 1, 1, 0]])
        np.testing.assert_array_equal(np.asarray(pos), [[0, 0, 0, 1], [0, 1, 2, 2]])
