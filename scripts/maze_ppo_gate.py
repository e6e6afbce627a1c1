"""PPO learning gate on the double-T maze (VERDICT r2 item 3): online
PPO rounds must beat the frozen-BC policy's return by a margin under a
fixed evaluation seed set, with a sane KL-controller trace — nothing in
the repo previously proved PPO *learns* (test_ppo_cli asserts only
mechanics).

Pipeline (reference online loop semantics, ppo/train.py:138-478):
  1. BC on mediocre behavior data (uniform p_optimal mixture) — the
     frozen π₀ / KL anchor and the baseline policy;
  2. eval return R0 of frozen BC over fixed seeds (text_env_eval);
  3. N PPO rounds: sample rollouts from the live policy, GAE refresh with
     per-token KL penalty, clipped-update epochs;
  4. eval return R1 over the SAME seeds; R1 must beat R0 by the margin.

Run on the TPU chip:  python scripts/maze_ppo_gate.py
Curve recorded in PERF_NOTES.md; tests/test_learning_gate.py carries a
scaled-down slow-marked assertion version.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-chains", type=int, default=300)
    p.add_argument("--p-optimal", type=float, default=0.4)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--bc-epochs", type=int, default=4)
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--epochs-per-round", type=int, default=2)
    p.add_argument("--rollouts-per-round", type=int, default=48)
    p.add_argument("--eval-rollouts", type=int, default=48)
    p.add_argument("--bsize", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ppo-lr", type=float, default=3e-4)
    p.add_argument("--kl-weight", type=float, default=0.01)
    p.add_argument("--kl-target", type=float, default=None)
    p.add_argument(
        "--value-warmup-rounds", type=int, default=2,
        help="rounds that train ONLY the value head (policy restored after "
             "each step). With a cold value head, whitened GAE advantages "
             "are ~-(remaining steps): a systematically wrong, "
             "position-not-quality signal that measurably DEGRADES the "
             "policy (observed: rollout return -24 -> -401 in one round at "
             "lr 3e-4, -26 -> -70 at 3e-5). Fitting V first turns "
             "advantages into action-quality signals.",
    )
    p.add_argument("--seed", type=int, default=9)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from flax.training.train_state import TrainState

    from lmrl_gym_tpu.algos import data as algo_data
    from lmrl_gym_tpu.algos.bc import BCBatch, BCConfig, BCTrainState, make_bc_train_step
    from lmrl_gym_tpu.algos.ppo import (
        AdaptiveKLController,
        FixedKLController,
        PPOBatch,
        PPOConfig,
        PPOTrainState,
        block_ppo_data,
        get_ppo_data_from_chains,
        make_ppo_train_step,
        ppo_forward,
        token_logprobs_from_logits,
    )
    from lmrl_gym_tpu.algos.value_policy import GenerationPolicy, LMServer
    from lmrl_gym_tpu.cli.tasks import build_maze_env, generate_maze_chains
    from lmrl_gym_tpu.core.blocking import BlockingStrategy, Padding, Truncation
    from lmrl_gym_tpu.core.optimizer import OptimizerConfig, make_optimizer
    from lmrl_gym_tpu.envs.base import text_env_eval
    from lmrl_gym_tpu.models.config import TransformerConfig
    from lmrl_gym_tpu.models.generation import SamplingConfig
    from lmrl_gym_tpu.models.heads import LinearHead, LinearHeadConfig, init_head_params
    from lmrl_gym_tpu.models.interface import LMCore, initialize_attn_mask_pos_ids
    from lmrl_gym_tpu.models.transformer import init_params
    from lmrl_gym_tpu.text.frames import Text, TextTrajectory, TextTrajectoryChain, TokenTrajectoryChain
    from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

    MAX_LEN = 160
    tokenizer = ByteTokenizer()
    config = TransformerConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=args.hidden,
        num_layers=args.layers, num_heads=args.heads,
        max_position_embeddings=256, pad_vocab_to_multiple=64,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
    )
    core = LMCore(config)
    strategy = BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, MAX_LEN)
    env = build_maze_env()
    server = LMServer(core, tokenizer)
    greedy_sampling = SamplingConfig(
        max_new_tokens=12, greedy=True, eos_token_id=10,
        pad_token_id=tokenizer.pad_token_id,
    )
    rollout_sampling = SamplingConfig(
        max_new_tokens=12, greedy=False, temperature=1.0, eos_token_id=10,
        pad_token_id=tokenizer.pad_token_id,
    )

    def make_policy(params, sampling, key):
        def generate_batch(prompts, step_key):
            outs = server.generate_from_strs(params, prompts, MAX_LEN, sampling, step_key)
            return [p + o for p, o in zip(prompts, outs)]

        return GenerationPolicy(generate_batch=generate_batch, key=key)

    def eval_return(params, tag):
        """(sampled_return, greedy_return) on the FIXED eval seed set.
        The gate compares SAMPLED returns: PPO optimizes the stochastic
        policy, and at reference-scale lr (1e-5) the greedy argmax often
        does not flip even as the sampled policy measurably improves
        (observed: sampled -26.7 -> -19.8 with greedy unchanged)."""
        out = {}
        for name, sampling, key in (
            ("sampled", rollout_sampling, jax.random.PRNGKey(1234)),
            ("greedy", greedy_sampling, jax.random.PRNGKey(0)),
        ):
            pol = make_policy(params, sampling, key)
            _, summary = text_env_eval(
                env, pol, n_rollouts=args.eval_rollouts,
                seed_generator=iter(range(5000, 5000 + args.eval_rollouts)),
                bsize=16,
            )
            out[name] = summary["reward"]["mean"]
            print(f"{tag}: {name} return {out[name]:.2f} "
                  f"(len {summary['length']['mean']:.1f})")
        return out["sampled"], out["greedy"]

    # ---- stage 1: BC
    print(f"data: {args.n_chains} chains, p_optimal={args.p_optimal} uniform mixture")
    chains = generate_maze_chains(args.n_chains, seed=args.seed, p_optimal=args.p_optimal)
    token_chains = [
        TokenTrajectoryChain.from_text_trajectory_chain(c, tokenizer) for c in chains
    ]
    windows = []
    for c in token_chains:
        windows.extend(c.to_list())
    bc_examples = [
        algo_data.BCExample.from_segments(tt.tokens, tt.is_action) for tt in windows
    ]
    bc_dataset = algo_data.ArrayDataset(
        algo_data.block_bc_examples(bc_examples, strategy, tokenizer.pad_token_id)
    )
    params = init_params(config, jax.random.PRNGKey(0))
    bc_state = BCTrainState(
        model=TrainState.create(
            apply_fn=None, params=params,
            tx=make_optimizer(OptimizerConfig(lr=args.lr), params),
        )
    )
    bc_step = make_bc_train_step(core, BCConfig(), tokenizer.pad_token_id, None)
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    t0 = time.time()
    for _ in range(args.bc_epochs):
        for b in bc_dataset.batches(args.bsize, rng=rng, drop_last=False):
            key, sk = jax.random.split(key)
            bc_state, _, _ = bc_step(
                bc_state,
                BCBatch(jnp.asarray(b["input_ids"]), jnp.asarray(b["training_mask"])),
                sk,
            )
    bc_params = jax.tree.map(jnp.array, bc_state.model.params)
    print(f"BC trained ({time.time()-t0:.0f}s)")
    r0, g0 = eval_return(bc_params, "frozen BC")

    # ---- stage 2: PPO rounds
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    vh_cfg = LinearHeadConfig(
        input_dim=config.hidden_size, output_dim=1, bias_init=0.0
    )
    value_head = LinearHead(vh_cfg)
    vh_params = init_head_params(value_head, config.hidden_size, ks[0])
    init_policy_params = jax.tree.map(jnp.array, bc_params)
    state = PPOTrainState(
        policy=TrainState.create(
            apply_fn=None, params=jax.tree.map(jnp.array, bc_params),
            tx=make_optimizer(OptimizerConfig(lr=args.ppo_lr), bc_params),
        ),
        value_head=TrainState.create(
            apply_fn=None, params=vh_params,
            tx=make_optimizer(OptimizerConfig(lr=args.lr), vh_params),
        ),
    )
    algo_config = PPOConfig(gamma=0.99, lam=0.95)
    step = make_ppo_train_step(core, value_head, algo_config, tokenizer.pad_token_id, None)
    kl_controller = (
        AdaptiveKLController(args.kl_weight, args.kl_target, 10000.0)
        if args.kl_target is not None
        else FixedKLController(args.kl_weight)
    )

    @jax.jit
    def _ppo_fwd(init_p, pol_p, vh_p, tokens):
        attention_mask, position_ids = initialize_attn_mask_pos_ids(
            tokens, tokenizer.pad_token_id
        )
        init_logits, _ = core.forward(init_p, tokens, attention_mask, position_ids)
        logits, values = ppo_forward(
            core, value_head, pol_p, vh_p, tokens, attention_mask, position_ids
        )
        return (
            token_logprobs_from_logits(init_logits, tokens),
            token_logprobs_from_logits(logits, tokens),
            values,
        )

    def rollout_chains(params, round_idx):
        pol = make_policy(
            params, rollout_sampling, jax.random.PRNGKey(100 + round_idx)
        )
        interactions, summary = text_env_eval(
            env, pol, n_rollouts=args.rollouts_per_round,
            seed_generator=iter(
                range(args.seed * 7 + round_idx * 1009,
                      args.seed * 7 + round_idx * 1009 + args.rollouts_per_round)
            ),
            bsize=16,
        )
        out = []
        for rollout in interactions:
            # per-step Markov windows chained (the maze data convention)
            chain = None
            for tr in reversed(rollout):
                obs = tr.pre_action_history[-1]
                act = tr.post_action_history[-1]
                chain = TextTrajectoryChain(
                    TextTrajectory((obs, act), (0.0, tr.reward), tr.done), chain
                )
            out.append(TokenTrajectoryChain.from_text_trajectory_chain(chain, tokenizer))
        return out, summary

    kl_trace = []
    for rnd in range(args.rounds):
        t0 = time.time()
        chains_r, summary = rollout_chains(state.policy.params, rnd)

        def forward_fn(tokens):
            a, b, v = _ppo_fwd(
                init_policy_params, state.policy.params,
                state.value_head.params, tokens,
            )
            return np.asarray(a), np.asarray(b), np.asarray(v)

        datas, kls = get_ppo_data_from_chains(
            forward_fn, tokenizer, chains_r, bsize=args.bsize,
            max_length=MAX_LEN, gamma=0.99, lam=0.95,
            kl_weight=kl_controller.value,
        )
        mean_kl = float(np.mean(kls)) if len(kls) else 0.0
        kl_controller.update(mean_kl, len(datas))
        kl_trace.append(dict(round=rnd, mean_kl=mean_kl, kl_coef=kl_controller.value,
                             rollout_reward=summary["reward"]["mean"]))
        blocked = block_ppo_data(
            datas, BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, MAX_LEN),
            tokenizer.pad_token_id,
        )
        dataset = algo_data.ArrayDataset(blocked)
        warmup = rnd < args.value_warmup_rounds
        for _ in range(args.epochs_per_round):
            for b in dataset.batches(args.bsize, rng=rng, drop_last=False):
                key, sk = jax.random.split(key)
                if warmup:  # copy: the step donates its input state
                    saved_policy = jax.tree.map(jnp.array, state.policy)
                state, loss, _ = step(
                    state,
                    PPOBatch(
                        input_ids=jnp.asarray(b["input_ids"]),
                        should_take_action=jnp.asarray(b["should_take_action"]),
                        old_logprobs=jnp.asarray(b["old_logprobs"]),
                        old_values=jnp.asarray(b["old_values"]),
                        old_advantages=jnp.asarray(b["old_advantages"]),
                        old_returns=jnp.asarray(b["old_returns"]),
                        bc_input_ids=None, bc_training_mask=None,
                    ),
                    sk,
                )
                if warmup:  # value-only round: policy update discarded
                    state = PPOTrainState(
                        policy=saved_policy, value_head=state.value_head
                    )
        print(
            f"round {rnd}: rollout_r={summary['reward']['mean']:7.2f} "
            f"kl={mean_kl:.4f} coef={kl_controller.value:.5f} "
            f"loss={float(loss):7.3f} ({time.time()-t0:.0f}s)"
        )

    r1, g1 = eval_return(state.policy.params, "after PPO")
    result = dict(
        bc_return=r0, ppo_return=r1, improvement=r1 - r0,
        bc_return_greedy=g0, ppo_return_greedy=g1, kl_trace=kl_trace,
    )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(args=vars(args), **result), f, indent=1)
    return result


if __name__ == "__main__":
    main()
