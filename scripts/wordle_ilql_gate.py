"""Wordle ILQL learning gate (BASELINE config #2 / round-4 VERDICT item 2).

Config #2 is "vectorized env + GPT-2-class ILQL": the reference trains
offline ILQL on scripted-policy mixtures and serves π_β + β·min(Q1,Q2)
with β=32 (wordle/ilql/train_ilql_gpt2.py:33-100, experiments/wordle/
ilql.sh). This harness runs the whole thing TPU-natively:

  1. behavior data from the scripted mixture (StartWord + RandomMixture,
     cli/tasks.py::generate_wordle_chains — mixed quality so %BC has a
     signal to filter and ILQL has returns to regress);
  2. BC(all) and %BC(top filter_frac, equal gradient-update budget) —
     the reference's baselines (wordle/bc/create_percent_bc_data.py:6-19);
  3. offline ILQL from the BC trunk (twin Q + V, β-guided serving);
  4. ALL policy evals are fused on-device rollouts (loops/actor.py):
     the [26,5] int8 vectorized env steps under the same jit as the
     decode loop — the token stream matches the host protocol
     byte-for-byte (golden-tested), so host-trained BC drives it as-is;
  5. the OptimalPolicy expected-information bound on the same vocab
     (wordle/misc/optimal_perf.py semantics) situates all numbers.

Gate: ILQL guided (sampled, fixed seeds) must beat %BC by --margin.
Run on the TPU chip:  python scripts/wordle_ilql_gate.py
tests/test_learning_gate.py has a slow-marked CPU-budget variant.
"""
import argparse
import json
import os
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
    p.add_argument("--n-episodes", type=int, default=2000)
    p.add_argument(
        "--device-data", type=int, default=20480,
        help="generate this many behavior episodes ON DEVICE with the "
        "scripted per-TURN mixture (actor.rollout_wordle_scripted: "
        "consistent guess w.p. prob-smart else random valid word) at "
        "vector-env rates. Per-turn mixing makes episode-level %BC "
        "filtering unable to isolate turn quality while per-token values "
        "can (the maze/car-dealer adversarial design). 0 = host-scripted "
        "episode collection (--n-episodes, episode-level mixture)",
    )
    p.add_argument("--gen-batch", type=int, default=2048)
    p.add_argument("--prob-smart", type=float, default=0.66)
    p.add_argument("--filter-frac", type=float, default=0.25)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--bc-epochs", type=int, default=4)
    p.add_argument("--ilql-epochs", type=int, default=12)
    p.add_argument("--eval-every", type=int, default=4)
    p.add_argument("--bsize", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument(
        "--beta", type=float, default=32.0,
        help="decode-time advantage weight; the reference's wordle ILQL "
        "serves beta=32 (wordle/ilql/train_ilql_gpt2.py:100)",
    )
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument(
        "--polyak", type=float, default=0.02,
        help="token-level Bellman backups propagate one action token per "
        "target refresh (~60 action tokens/episode here); 0.005 was too "
        "slow to carry the terminal reward back at this update budget "
        "(the car-dealer gate's diagnosis, PERF_NOTES r5)",
    )
    p.add_argument("--value-bias-init", type=float, default=-4.0,
                   help="typical wordle return scale (cf. the reference's "
                   "bias_init=-4.1 wordle value head)")
    p.add_argument("--lr-warmdown", action="store_true", default=True)
    p.add_argument("--no-lr-warmdown", dest="lr_warmdown", action="store_false")
    p.add_argument("--eval-batch", type=int, default=512)
    p.add_argument("--eval-temp", type=float, default=1.0)
    p.add_argument("--optimal-episodes", type=int, default=64,
                   help="0 skips the host OptimalPolicy bound")
    p.add_argument("--online-rounds", type=int, default=0,
                   help="optional on-device online ILQL rounds after the "
                   "offline phase (loops/online_device.py)")
    p.add_argument("--constrain-vocab", action="store_true", default=True,
                   help="mask every serving rollout's decode to the vocab "
                   "trie (actor.rollout_wordle(constrain_vocab=True)) — "
                   "the serving-side legal-guess composition, applied to "
                   "BC, %BC and ILQL alike. A from-scratch byte LM emits "
                   "~no valid words unmasked (measured: every policy "
                   "-6.000); the reference's GPT-2 gets well-formedness "
                   "from pretraining (zero egress here)")
    p.add_argument("--no-constrain-vocab", dest="constrain_vocab",
                   action="store_false")
    p.add_argument("--seed", type=int, default=5)
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

    import optax
    from flax.training.train_state import TrainState

    from lmrl_gym_tpu.algos import data as algo_data
    from lmrl_gym_tpu.algos.bc import BCBatch, BCConfig, BCTrainState, make_bc_train_step
    from lmrl_gym_tpu.algos.ilql import (
        ILQLBatch, ILQLConfig, init_ilql_state, make_ilql_train_step,
    )
    from lmrl_gym_tpu.cli.tasks import generate_wordle_chains
    from lmrl_gym_tpu.core.blocking import BlockingStrategy, Padding, Truncation
    from lmrl_gym_tpu.core.optimizer import OptimizerConfig, make_optimizer
    from lmrl_gym_tpu.envs.wordle.vector import WordleVectorEnv, WordleVocab
    from lmrl_gym_tpu.loops import actor as actor_mod
    from lmrl_gym_tpu.models.config import TransformerConfig
    from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params
    from lmrl_gym_tpu.models.interface import LMCore
    from lmrl_gym_tpu.models.transformer import init_params
    from lmrl_gym_tpu.text.frames import TokenTrajectoryChain
    from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

    t_start = time.time()
    tokenizer = ByteTokenizer()
    MAX_LEN = actor_mod.EPISODE_LEN  # 128: full fixed-width episode
    config = TransformerConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=args.hidden,
        num_layers=args.layers, num_heads=args.heads,
        max_position_embeddings=MAX_LEN, pad_vocab_to_multiple=64,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
    )
    core = LMCore(config)
    strategy = BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, MAX_LEN)
    vocab = WordleVocab.from_file()
    venv = WordleVectorEnv(vocab)
    B = args.eval_batch

    # ---- behavior data: on-device scripted-mixture rollouts (default)
    # or host-scripted episode collection (--device-data 0)
    device_rollout = None
    if args.device_data > 0:
        print(f"data: {args.device_data} episodes ON DEVICE, per-turn "
              f"mixture p_smart={args.prob_smart}")
        gen_holder = jnp.zeros((args.gen_batch,))
        gkey = jax.random.PRNGKey(args.seed * 131 + 7)
        parts = []
        for i in range(-(-args.device_data // args.gen_batch)):
            gkey, k = jax.random.split(gkey)
            parts.append(
                actor_mod.rollout_wordle_scripted(
                    venv, k, gen_holder, args.prob_smart
                )
            )
        device_rollout = jax.tree.map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs])[
                : args.device_data
            ],
            *parts,
        )
        ep_rewards = (
            device_rollout.turn_reward * device_rollout.turn_live
        ).sum(axis=1)
        print(f"behavior: reward mean {ep_rewards.mean():.3f} "
              f"min {ep_rewards.min():.0f} max {ep_rewards.max():.0f} "
              f"win {device_rollout.win.mean():.3f} "
              f"({time.time()-t_start:.0f}s)")
        token_chains = None
    else:
        print(f"data: {args.n_episodes} episodes, scripted mixture "
              f"prob_smart={args.prob_smart}")
        chains = generate_wordle_chains(
            args.n_episodes, seed=args.seed, prob_smart=args.prob_smart
        )
        ep_rewards = np.asarray([sum(c.text_trajectory.reward) for c in chains])
        print(f"behavior: reward mean {ep_rewards.mean():.3f} "
              f"min {ep_rewards.min():.0f} max {ep_rewards.max():.0f} "
              f"({time.time()-t_start:.0f}s)")
        token_chains = [
            TokenTrajectoryChain.from_text_trajectory_chain(c, tokenizer) for c in chains
        ]

    # ---- BC(all) and %BC
    def train_bc(tcs, seed, epochs_scale=1):
        examples = []
        for c in tcs:
            for tt in c.to_list():
                examples.append(
                    algo_data.BCExample.from_segments(tt.tokens, tt.is_action)
                )
        dataset = algo_data.ArrayDataset(
            algo_data.block_bc_examples(examples, strategy, tokenizer.pad_token_id)
        )
        params = init_params(config, jax.random.PRNGKey(seed))
        state = BCTrainState(
            model=TrainState.create(
                apply_fn=None, params=params,
                tx=make_optimizer(OptimizerConfig(lr=args.lr), params),
            )
        )
        step = make_bc_train_step(core, BCConfig(), tokenizer.pad_token_id, None)
        key = jax.random.PRNGKey(seed + 1)
        rng = np.random.default_rng(seed)
        loss = jnp.zeros(())
        for _ in range(args.bc_epochs * epochs_scale):
            for b in dataset.batches(args.bsize, rng=rng, drop_last=False):
                key, sk = jax.random.split(key)
                state, loss, _ = step(
                    state,
                    BCBatch(jnp.asarray(b["input_ids"]), jnp.asarray(b["training_mask"])),
                    sk,
                )
        return state.model.params, float(loss)

    def train_bc_arrays(data, seed, epochs_scale=1):
        """BC straight from device-generated [N,128] token arrays."""
        dataset = algo_data.ArrayDataset(data)
        params = init_params(config, jax.random.PRNGKey(seed))
        state = BCTrainState(
            model=TrainState.create(
                apply_fn=None, params=params,
                tx=make_optimizer(OptimizerConfig(lr=args.lr), params),
            )
        )
        step = make_bc_train_step(core, BCConfig(), tokenizer.pad_token_id, None)
        key = jax.random.PRNGKey(seed + 1)
        rng = np.random.default_rng(seed)
        loss = jnp.zeros(())
        for _ in range(args.bc_epochs * epochs_scale):
            for b in dataset.batches(args.bsize, rng=rng, drop_last=False):
                key, sk = jax.random.split(key)
                state, loss, _ = step(
                    state,
                    BCBatch(jnp.asarray(b["input_ids"]), jnp.asarray(b["training_mask"])),
                    sk,
                )
        return state.model.params, float(loss)

    if device_rollout is not None:
        bc_tokens = device_rollout.tokens.astype(np.int32)
        bc_mask = np.asarray(device_rollout.token_action_mask()).astype(
            np.float32
        )
        bc_data = dict(input_ids=bc_tokens, training_mask=bc_mask)
        bc_params, bc_loss = train_bc_arrays(bc_data, args.seed)
        cutoff = np.quantile(ep_rewards, 1.0 - args.filter_frac)
        keep_idx = np.flatnonzero(ep_rewards >= cutoff)
        scale = max(1, round(len(bc_tokens) / max(1, len(keep_idx))))
        pbc_params, pbc_loss = train_bc_arrays(
            dict(input_ids=bc_tokens[keep_idx], training_mask=bc_mask[keep_idx]),
            args.seed, epochs_scale=scale,
        )
        print(f"BC loss {bc_loss:.3f} | %BC keeps {len(keep_idx)} eps "
              f"(reward >= {cutoff:.0f}) loss {pbc_loss:.3f} "
              f"({time.time()-t_start:.0f}s)")
    else:
        bc_params, bc_loss = train_bc(token_chains, args.seed)
        cutoff = np.quantile(ep_rewards, 1.0 - args.filter_frac)
        keep = [c for c, r in zip(token_chains, ep_rewards) if r >= cutoff]
        scale = max(1, round(len(token_chains) / max(1, len(keep))))
        pbc_params, pbc_loss = train_bc(keep, args.seed, epochs_scale=scale)
        print(f"BC loss {bc_loss:.3f} | %BC keeps {len(keep)} eps "
              f"(reward >= {cutoff:.0f}) loss {pbc_loss:.3f} "
              f"({time.time()-t_start:.0f}s)")

    # ---- on-device eval harness (fused actor; fixed keys)
    lm_step_fn, lm_carry0 = actor_mod.make_lm_step_fn(core, B)
    holder = jnp.zeros((B,))

    def eval_lm(params, name, greedy=False):
        out = actor_mod.rollout_wordle(
            venv, lm_step_fn, jax.tree.map(jnp.asarray, params), lm_carry0,
            jax.random.PRNGKey(args.seed * 31 + (1 if greedy else 0)),
            holder, args.eval_temp, greedy,
            constrain_vocab=args.constrain_vocab,
        )
        ret = float((out.turn_reward * out.turn_live).sum(axis=1).mean())
        win = float(out.win.mean())
        print(f"{name}{' greedy' if greedy else ''}: return {ret:.3f} "
              f"win {win:.3f} turns {float(out.n_turns.mean()):.2f} "
              f"({time.time()-t_start:.0f}s)")
        return dict(ret=ret, win=win)

    bc_s = eval_lm(bc_params, "BC(all)")
    bc_g = eval_lm(bc_params, "BC(all)", greedy=True)
    pbc_s = eval_lm(pbc_params, "%BC")
    pbc_g = eval_lm(pbc_params, "%BC", greedy=True)

    # ---- offline ILQL from the BC trunk
    if device_rollout is not None:
        n_examples = len(bc_tokens)
        dataset = algo_data.ArrayDataset(dict(
            input_ids=bc_tokens,
            should_take_action=bc_mask[:, 1:].astype(bool),
            rewards=np.asarray(device_rollout.token_rewards())[:, 1:].astype(
                np.float32
            ),
            dones=np.ones((n_examples,), bool),
        ))
    else:
        examples = []
        for c in token_chains:
            curr = c
            while curr is not None:
                examples.append(algo_data.ILQLExample.from_chain(curr))
                curr = curr.next
        dataset = algo_data.ArrayDataset(
            algo_data.block_ilql_examples(examples, strategy, tokenizer.pad_token_id)
        )
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q_cfg = MLPHeadConfig(
        input_dim=config.hidden_size, hidden_dim=2 * config.hidden_size,
        output_dim=config.padded_vocab_size, layer2_initializer_range=0.0,
        layer2_bias_init=args.value_bias_init,
    )
    v_cfg = MLPHeadConfig(
        input_dim=config.hidden_size, hidden_dim=2 * config.hidden_size,
        output_dim=1, layer2_initializer_range=0.0,
        layer2_bias_init=args.value_bias_init,
    )
    q_head, v_head = MLPHead(q_cfg), MLPHead(v_cfg)
    ilql_config = ILQLConfig(
        gamma=args.gamma, polyak_alpha=args.polyak, beta=args.beta,
        use_separate_target_base=True,
    )
    n_examples = (
        len(bc_tokens) if device_rollout is not None else len(examples)
    )
    n_batches = -(-n_examples // args.bsize)
    total_updates = max(1, args.ilql_epochs * n_batches)
    head_lr = (
        optax.cosine_decay_schedule(args.lr, total_updates)
        if args.lr_warmdown else args.lr
    )
    state = init_ilql_state(
        jax.tree.map(jnp.array, bc_params),
        init_head_params(q_head, config.hidden_size, ks[0]),
        init_head_params(q_head, config.hidden_size, ks[1]),
        init_head_params(v_head, config.hidden_size, ks[2]),
        optax.adamw(args.lr * 0.3),
        optax.adamw(head_lr),
        ilql_config,
    )
    train_step = make_ilql_train_step(
        core, q_head, v_head, ilql_config, tokenizer.pad_token_id
    )

    # guided eval: two-trunk π_β(BC) + β·min(Q1,Q2) fused actor
    guided_step_fn, guided_carry0 = actor_mod.make_value_guided_step_fn(
        core, q_head, batch=B, two_trunks=True, twin_q=True, beta=args.beta,
    )

    def eval_guided(state, name, greedy=False, use_target=False):
        params = {
            "pi_beta": jax.tree.map(jnp.asarray, bc_params),
            "base": state.base.params,
            "q1": state.q1_target_params if use_target else state.q1_head.params,
            "q2": state.q2_target_params if use_target else state.q2_head.params,
        }
        out = actor_mod.rollout_wordle(
            venv, guided_step_fn, params, guided_carry0,
            jax.random.PRNGKey(args.seed * 31 + (1 if greedy else 0)),
            holder, args.eval_temp, greedy,
            constrain_vocab=args.constrain_vocab,
        )
        ret = float((out.turn_reward * out.turn_live).sum(axis=1).mean())
        win = float(out.win.mean())
        print(f"{name}{' greedy' if greedy else ''}: return {ret:.3f} "
              f"win {win:.3f} turns {float(out.n_turns.mean()):.2f} "
              f"({time.time()-t_start:.0f}s)")
        return dict(ret=ret, win=win)

    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(args.seed)
    curve = []
    for epoch in range(1, args.ilql_epochs + 1):
        t0 = time.time()
        for b in dataset.batches(args.bsize, rng=rng, drop_last=False):
            key, sk = jax.random.split(key)
            state, loss, logs = train_step(
                state,
                ILQLBatch(
                    input_ids=jnp.asarray(b["input_ids"]),
                    should_take_action=jnp.asarray(b["should_take_action"]),
                    rewards=jnp.asarray(b["rewards"]),
                    dones=jnp.asarray(b["dones"]),
                    next_token_ids=None if b.get("next_token_ids") is None
                    else jnp.asarray(b["next_token_ids"]),
                    next_dones=None if b.get("next_dones") is None
                    else jnp.asarray(b["next_dones"]),
                ),
                sk,
            )
        if epoch % args.eval_every == 0 or epoch == args.ilql_epochs:
            qm = float(logs["q1"]["mean"])
            vm = float(logs["v"]["mean"])
            print(f"epoch {epoch}: loss {float(loss):.3f} q~{qm:.2f} "
                  f"v~{vm:.2f} ({time.time()-t0:.0f}s)")
            m = eval_guided(state, f"ILQL(ep{epoch})")
            curve.append(dict(epoch=epoch, **m))

    ilql_s = eval_guided(state, "ILQL guided (target heads)", use_target=True)
    ilql_g = eval_guided(state, "ILQL guided", greedy=True)

    online_history = []
    if args.online_rounds > 0:
        from lmrl_gym_tpu.loops.online_device import (
            OnlineDeviceConfig, online_ilql_wordle,
        )

        state, online_history = online_ilql_wordle(
            core, q_head, v_head, state, venv, ilql_config,
            OnlineDeviceConfig(
                n_rounds=args.online_rounds, rollout_batch=256,
                train_bsize=args.bsize, pad_token_id=tokenizer.pad_token_id,
            ),
            jax.random.PRNGKey(args.seed * 7 + 1),
        )
        for m in online_history:
            print(f"online round {m['round']}: reward {m['mean_episode_reward']:.3f} "
                  f"win {m['win_rate']:.3f} loss {m['loss']:.3f}")
        curve.append(dict(epoch="online", **eval_guided(state, "ILQL post-online")))

    # ---- OptimalPolicy bound (host, exact expected-information argmax)
    optimal_ret = None
    if args.optimal_episodes > 0:
        import random as _random

        from lmrl_gym_tpu.envs.wordle.data import generate_trajectories
        from lmrl_gym_tpu.envs.wordle.policies import OptimalPolicy, StartWordPolicy

        pol = OptimalPolicy(
            vocab, start_word_policy=StartWordPolicy(rng=_random.Random(0)),
            rng=_random.Random(0),
        )
        trajs = generate_trajectories(
            args.optimal_episodes, pol, vocab, seed=90_000, reformat=False
        )
        optimal_ret = float(np.mean([sum(t.reward) for t in trajs]))
        print(f"OptimalPolicy bound: {optimal_ret:.3f} over "
              f"{args.optimal_episodes} episodes ({time.time()-t_start:.0f}s)")

    final = curve[-1] if curve else dict(ret=float("nan"), win=float("nan"))
    result = dict(
        behavior_return=float(ep_rewards.mean()),
        bc_return=bc_s["ret"], bc_win=bc_s["win"],
        bc_return_greedy=bc_g["ret"],
        pbc_return=pbc_s["ret"], pbc_win=pbc_s["win"],
        pbc_return_greedy=pbc_g["ret"],
        ilql_return=final["ret"], ilql_win=final["win"],
        ilql_return_target_heads=ilql_s["ret"],
        ilql_return_greedy=ilql_g["ret"], ilql_win_greedy=ilql_g["win"],
        optimal_return=optimal_ret,
        curve=curve, online_history=online_history,
        constrain_vocab=args.constrain_vocab,
        model=f"d{args.hidden} L{args.layers} byte vocab "
        f"{tokenizer.vocab_size}, beta={args.beta}, eval B={B} on-device "
        f"fused rollouts (ref names GPT-2-small; sized to one v5e chip)",
    )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(args=vars(args), **result), f, indent=1)
    return result


if __name__ == "__main__":
    main()
