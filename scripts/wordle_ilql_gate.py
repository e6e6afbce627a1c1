"""Wordle ILQL learning gate (BASELINE config #2 / round-4 VERDICT item 2).

Config #2 is "vectorized env + GPT-2-class ILQL": the reference trains
offline ILQL on scripted-policy mixtures and serves π_β + β·min(Q1,Q2)
with β=32 (wordle/ilql/train_ilql_gpt2.py:33-100, experiments/wordle/
ilql.sh). This harness runs the whole thing TPU-natively, in the
STREAMING regime the vector env makes possible (934k env-steps/s/chip
means behavior data is effectively free — every gradient step trains on
a fresh scripted-mixture batch, the infinite-offline-dataset limit of
the reference's fixed jsonl):

  1. behavior = the per-TURN quality mixture (rollout_wordle_scripted:
     knowledge-consistent guess w.p. --p-smart else a random valid
     word). Per-turn mixing makes episode-level %BC filtering unable to
     isolate turn quality while per-token values can — the same
     adversarial design as the maze/car-dealer gates.
  2. BC(all): streaming BC, fresh 512-episode batch per step. The r5
     diagnosis (PERF_NOTES): at the old 2.5k-update budget the trunk
     learns only the vocab trie (serve-time guess consistency 0.02 vs
     behavior 0.67); at ~20k updates it learns the consistency function
     outright (serve win 0.93 vs behavior 0.95).
  3. %BC: same updates/batch, each batch filtered to the top
     --filter-frac episodes by return (wordle/bc/
     create_percent_bc_data.py:6-19 semantics, per-chunk quantile).
  4. offline ILQL from the BC trunk (twin Q + V, streaming batches from
     the same behavior policy), served as π_β + β·min(Q1,Q2) guided
     decode (value_rl_base/gpt2/generation.py:36-121) with the decode
     masked to the vocab trie for every policy alike.
  5. the OptimalPolicy expected-information bound and the
     pure-consistent scripted ceiling (p_smart=1.0) situate all
     numbers; the ILQL win is suppressing the (1 - p_smart) random
     component of the behavior mixture.

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
    p.add_argument("--bc-steps", type=int, default=16000,
                   help="streaming BC updates (fresh batch per step)")
    p.add_argument("--pbc-steps", type=int, default=16000)
    p.add_argument("--ilql-steps", type=int, default=10000)
    p.add_argument("--bsize", type=int, default=512)
    p.add_argument("--prob-smart", type=float, default=0.66)
    p.add_argument(
        "--prob-repeat", type=float, default=0.0,
        help="per-turn mass on REPEATING the previous valid guess (the "
        "reference's RepeatPolicy, wordle/env/scripted_policies.py:42-174)"
        " — a concentrated bad action greedy imitation locks onto. "
        "RECORDED NEGATIVE at 0.24 (GATE_WORDLE_ILQL_r05_repeatmix_"
        "negative.json): per-letter beta*Q cannot steer away from the "
        "repeat at its first letter, where Q averages over shared-prefix "
        "continuations — word-level sample-rerank is the named follow-up "
        "(PERF_NOTES r5). Default 0 = the passing gate configuration",
    )
    p.add_argument("--filter-frac", type=float, default=0.25)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=500)
    p.add_argument(
        "--beta", type=float, default=32.0,
        help="decode-time advantage weight; the reference's wordle ILQL "
        "serves beta=32 (wordle/ilql/train_ilql_gpt2.py:100)",
    )
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument(
        "--polyak", type=float, default=0.02,
        help="token-level Bellman backups propagate one action token per "
        "target refresh (~40 action tokens/episode here); 0.005 was too "
        "slow to carry the terminal reward back at this update budget "
        "(the car-dealer gate's diagnosis, PERF_NOTES r5)",
    )
    p.add_argument("--value-bias-init", type=float, default=-4.0,
                   help="typical wordle return scale (cf. the reference's "
                   "bias_init=-4.1 wordle value head)")
    p.add_argument("--base-lr-scale", type=float, default=0.3,
                   help="ILQL trunk lr = lr * this (heads get full lr); "
                   "both cosine-annealed to zero over --ilql-steps")
    p.add_argument("--eval-every", type=int, default=2500,
                   help="guided-eval interval in ILQL steps")
    p.add_argument("--eval-batch", type=int, default=1024)
    p.add_argument("--eval-temp", type=float, default=1.0)
    p.add_argument("--optimal-episodes", type=int, default=64,
                   help="0 skips the host OptimalPolicy bound")
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

    from lmrl_gym_tpu.algos.bc import BCBatch, BCConfig, BCTrainState, make_bc_train_step
    from lmrl_gym_tpu.algos.ilql import (
        ILQLBatch, ILQLConfig, init_ilql_state, make_ilql_train_step,
    )
    from lmrl_gym_tpu.core.optimizer import OptimizerConfig, make_optimizer
    from lmrl_gym_tpu.envs.wordle.vector import WordleVectorEnv, WordleVocab
    from lmrl_gym_tpu.loops import actor as actor_mod
    from lmrl_gym_tpu.models.config import TransformerConfig
    from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params
    from lmrl_gym_tpu.models.interface import LMCore
    from lmrl_gym_tpu.models.transformer import init_params
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
    vocab = WordleVocab.from_file()
    venv = WordleVectorEnv(vocab)
    B = args.eval_batch

    # ---- behavior / ceiling statistics (on-device scripted rollouts)
    def scripted_stats(p_smart, seed0, n_batches=2, p_repeat=0.0):
        rets, wins = [], []
        for s in range(n_batches):
            ro = actor_mod.rollout_wordle_scripted(
                venv, jax.random.PRNGKey(seed0 + s), jnp.zeros((2048,)),
                p_smart, p_repeat,
            )
            rets.append(float(
                (np.asarray(ro.turn_reward) * np.asarray(ro.turn_live)).sum(1).mean()
            ))
            wins.append(float(np.asarray(ro.win).mean()))
        return float(np.mean(rets)), float(np.mean(wins))

    behavior_ret, behavior_win = scripted_stats(
        args.prob_smart, 1000, p_repeat=args.prob_repeat
    )
    ceiling_ret, ceiling_win = scripted_stats(1.0, 2000)
    print(f"behavior (p_smart={args.prob_smart}, p_repeat={args.prob_repeat}): "
          f"return {behavior_ret:.3f} "
          f"win {behavior_win:.3f} | pure-consistent ceiling: "
          f"{ceiling_ret:.3f}/{ceiling_win:.3f} ({time.time()-t_start:.0f}s)")

    gen_holder = jnp.zeros((args.bsize,))
    # %BC draws a bigger chunk and keeps the top filter-frac, so every
    # update still sees a full bsize batch (equal update budget AND equal
    # tokens-per-update vs BC(all))
    pbc_gen = max(args.bsize, int(round(args.bsize / max(args.filter_frac, 1e-6))))
    pbc_holder = jnp.zeros((pbc_gen,))

    # ---- streaming BC (fresh scripted-mixture batch every update)
    def train_bc_stream(steps, seed, filter_frac=None):
        params = init_params(config, jax.random.PRNGKey(seed))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, min(args.warmup, max(1, steps // 4)), steps
        )
        state = BCTrainState(
            model=TrainState.create(
                apply_fn=None, params=params,
                tx=make_optimizer(OptimizerConfig(lr=sched), params),
            )
        )
        step = make_bc_train_step(core, BCConfig(), tokenizer.pad_token_id, None)
        gkey = jax.random.PRNGKey(seed * 131 + 7)
        key = jax.random.PRNGKey(seed + 1)
        holder = gen_holder if filter_frac is None else pbc_holder
        loss = jnp.zeros(())
        for it in range(1, steps + 1):
            gkey, gk = jax.random.split(gkey)
            ro = actor_mod.rollout_wordle_scripted(
                venv, gk, holder, args.prob_smart, args.prob_repeat
            )
            toks = ro.tokens.astype(jnp.int32)
            mask = ro.token_action_mask().astype(jnp.float32)
            if filter_frac is not None:
                ep_r = (ro.turn_reward * ro.turn_live).sum(axis=1)
                # top-frac episodes of this chunk (create_percent_bc_data
                # semantics, applied per streaming chunk)
                keep = jnp.argsort(ep_r)[::-1][: args.bsize]
                toks, mask = toks[keep], mask[keep]
            key, sk = jax.random.split(key)
            state, loss, _ = step(state, BCBatch(toks, mask), sk)
            if it % 4000 == 0:
                print(f"  bc step {it}/{steps}: loss {float(loss):.3f} "
                      f"({time.time()-t_start:.0f}s)", flush=True)
        return state.model.params, float(loss)

    print(f"BC(all): {args.bc_steps} streaming steps @ bsize {args.bsize}")
    bc_params, bc_loss = train_bc_stream(args.bc_steps, args.seed)
    print(f"BC loss {bc_loss:.3f} ({time.time()-t_start:.0f}s)")
    print(f"%BC: {args.pbc_steps} steps, top {args.filter_frac:.0%} of "
          f"{pbc_gen}-episode chunks")
    pbc_params, pbc_loss = train_bc_stream(
        args.pbc_steps, args.seed, filter_frac=args.filter_frac
    )
    print(f"%BC loss {pbc_loss:.3f} ({time.time()-t_start:.0f}s)")

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

    # ---- streaming offline ILQL from the BC trunk
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
    head_lr = optax.cosine_decay_schedule(args.lr, max(1, args.ilql_steps))
    base_lr = optax.cosine_decay_schedule(
        args.lr * args.base_lr_scale, max(1, args.ilql_steps)
    )
    state = init_ilql_state(
        jax.tree.map(jnp.array, bc_params),
        init_head_params(q_head, config.hidden_size, ks[0]),
        init_head_params(q_head, config.hidden_size, ks[1]),
        init_head_params(v_head, config.hidden_size, ks[2]),
        optax.adamw(base_lr),
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

    gkey = jax.random.PRNGKey(args.seed * 977 + 13)
    key = jax.random.PRNGKey(3)
    curve = []
    for it in range(1, args.ilql_steps + 1):
        gkey, gk = jax.random.split(gkey)
        ro = actor_mod.rollout_wordle_scripted(
            venv, gk, gen_holder, args.prob_smart, args.prob_repeat
        )
        mask = ro.token_action_mask()
        key, sk = jax.random.split(key)
        state, loss, logs = train_step(
            state,
            ILQLBatch(
                input_ids=ro.tokens.astype(jnp.int32),
                should_take_action=mask[:, 1:],
                rewards=ro.token_rewards()[:, 1:].astype(jnp.float32),
                dones=jnp.ones((args.bsize,), bool),
                next_token_ids=None,
                next_dones=None,
            ),
            sk,
        )
        if it % args.eval_every == 0 or it == args.ilql_steps:
            qm = float(logs["q1"]["mean"])
            vm = float(logs["v"]["mean"])
            print(f"ilql step {it}: loss {float(loss):.3f} q~{qm:.2f} "
                  f"v~{vm:.2f} ({time.time()-t_start:.0f}s)", flush=True)
            m = eval_guided(state, f"ILQL(step {it})")
            curve.append(dict(step=it, **m))

    ilql_t = eval_guided(state, "ILQL guided (target heads)", use_target=True)
    ilql_g = eval_guided(state, "ILQL guided", greedy=True)

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
        behavior_return=behavior_ret, behavior_win=behavior_win,
        consistent_ceiling_return=ceiling_ret,
        consistent_ceiling_win=ceiling_win,
        bc_return=bc_s["ret"], bc_win=bc_s["win"],
        bc_return_greedy=bc_g["ret"],
        pbc_return=pbc_s["ret"], pbc_win=pbc_s["win"],
        pbc_return_greedy=pbc_g["ret"],
        ilql_return=final["ret"], ilql_win=final["win"],
        ilql_return_target_heads=ilql_t["ret"],
        ilql_win_target_heads=ilql_t["win"],
        ilql_return_greedy=ilql_g["ret"], ilql_win_greedy=ilql_g["win"],
        optimal_return=optimal_ret,
        curve=curve,
        constrain_vocab=args.constrain_vocab,
        model=f"d{args.hidden} L{args.layers} byte vocab "
        f"{tokenizer.vocab_size}, beta={args.beta}, streaming bsize "
        f"{args.bsize}, eval B={B} on-device fused rollouts (ref names "
        f"GPT-2-small; sized to one v5e chip)",
    )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(args=vars(args), **result), f, indent=1)
    return result


if __name__ == "__main__":
    main()
