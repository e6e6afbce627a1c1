"""Dialog-task ILQL gate — the round-4 VERDICT's top item: an RL
algorithm must beat BC on a dialog task with the trained LM oracle in the
loop (BASELINE config #5's learning half; reference recipe
llm_rl_scripts/twenty_questions/ilql/train_ilql.py).

Twenty-Questions setup (same substrate as scripts/twenty_questions_gate):

  1. behavior = EPISODE-level quality mixture (half strong category-
     elimination asker p=0.85, half weak p=0.15 random-guesser) in the
     scripted-oracle env — reward spread comes from strategy, and ILQL's
     per-token credit assignment can pick the strong asker's actions out
     of the mixture where the r4 %BC top-reward filter could not (episode
     luck dominates episode reward; it does not dominate Q(s,a));
  2. BC on ALL episodes (the baseline the RL must beat);
  3. offline ILQL from the BC trunk (twin-Q + V, value-bias-init at the
     typical return, cosine lr warmdown);
  4. serving: (a) β-guided two-trunk decode π_β + β·min(Q1,Q2)
     (value_rl_base/gpt2/generation.py:36-121) and (b) SAMPLE-RERANK —
     K proposals sampled from the BC policy per turn, scored with
     Σ_action(min(Q1,Q2)−V), argmax (the reference's ReRankerPolicy over
     sampled proposals, ppo/reranker_policy.py:5-32 + ilql score_fn);
  5. eval on fixed seeds in BOTH the scripted-oracle env and the
     LM-oracle env (in-repo-trained oracle served batched on the mesh).
     The scripted-env column isolates oracle fidelity from policy
     quality — the r4 VERDICT item-7 diagnosis of why BC (-19.67) trailed
     its own teacher (-16.77) through the LM oracle.

Gate: ILQL (best declared serving = sample-rerank) beats BC under the
same eval protocol by --margin on fixed seeds.

Run on the TPU chip:  python scripts/dialog_ilql_gate.py
tests/test_learning_gate.py carries a slow-marked CPU-budget variant.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("GATE_BACKEND") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if os.environ.get("GATE_BACKEND") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--behavior-episodes", type=int, default=400)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--bc-epochs", type=int, default=60)
    p.add_argument("--ilql-epochs", type=int, default=10)
    p.add_argument("--bsize", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ilql-lr", type=float, default=1e-3)
    p.add_argument("--beta", type=float, default=8.0)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--polyak", type=float, default=0.005)
    p.add_argument("--value-bias-init", type=float, default=-17.0,
                   help="typical episode return of the mixture")
    p.add_argument("--freeze-base", action="store_true")
    p.add_argument("--lr-warmdown", action="store_true", default=True)
    p.add_argument("--no-lr-warmdown", dest="lr_warmdown", action="store_false")
    p.add_argument("--rerank-k", type=int, default=8,
                   help="BC proposals sampled per turn for the reranker")
    p.add_argument("--rerank-temp", type=float, default=1.0)
    p.add_argument("--max-len", type=int, default=768)
    p.add_argument("--bpe-vocab", type=int, default=2048)
    p.add_argument("--eval-rollouts", type=int, default=48)
    p.add_argument("--eval-bsize", type=int, default=16)
    p.add_argument("--oracle-episodes", type=int, default=200)
    p.add_argument("--oracle-epochs", type=int, default=10)
    p.add_argument("--skip-lm-oracle", action="store_true",
                   help="scripted-env eval only (fast debug)")
    p.add_argument("--seed", type=int, default=7)
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
    from twenty_questions_gate import build_policy_trainer, collect_behavior

    from lmrl_gym_tpu.algos import data as algo_data
    from lmrl_gym_tpu.algos.ilql import (
        ILQLBatch, ILQLConfig, init_ilql_state, make_ilql_train_step,
    )
    from lmrl_gym_tpu.algos.value_policy import (
        GenerationPolicy,
        LMServer,
        ValueGuidedServer,
        ValueRLParams,
        make_ilql_score_fn,
        tokenize_histories_for_scoring,
    )
    from lmrl_gym_tpu.cli.tasks import build_twenty_questions_env
    from lmrl_gym_tpu.core.blocking import (
        BlockingStrategy, Padding, Truncation, strip_prompt_from_completion,
    )
    from lmrl_gym_tpu.envs.base import BatchedTextPolicy, text_env_eval
    from lmrl_gym_tpu.models.config import tiny_test_config
    from lmrl_gym_tpu.models.generation import SamplingConfig
    from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params
    from lmrl_gym_tpu.models.interface import LMCore
    from lmrl_gym_tpu.text.bpe import train_bpe_for_task
    from lmrl_gym_tpu.text.frames import (
        Text, TextTrajectoryChain, TokenTrajectoryChain,
    )

    t_start = time.time()
    tokenizer = train_bpe_for_task(
        "twenty_questions", vocab_size=args.bpe_vocab, n_episodes=200, seed=0
    )
    eos_id = tokenizer.newline_token_id
    print(f"BPE tokenizer: vocab {tokenizer.vocab_size}")
    config = tiny_test_config(
        vocab_size=tokenizer.vocab_size, hidden_size=args.hidden,
        num_layers=args.layers, num_heads=args.heads,
        max_position_embeddings=max(256, args.max_len),
    )
    core = LMCore(config)
    strategy = BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, args.max_len)
    sampling_greedy = SamplingConfig(
        max_new_tokens=48, greedy=True, eos_token_id=eos_id,
        pad_token_id=tokenizer.pad_token_id,
    )
    sampling_sample = SamplingConfig(
        max_new_tokens=48, greedy=False, temperature=args.rerank_temp,
        eos_token_id=eos_id, pad_token_id=tokenizer.pad_token_id,
    )

    # ---- behavior: episode-level quality mixture (p_good=-1 sentinel)
    episodes = collect_behavior(args.behavior_episodes, -1.0, args.seed)
    rewards = np.asarray([r for _, r in episodes])
    print(f"behavior: {len(episodes)} episodes, reward mean {rewards.mean():.2f} "
          f"min {rewards.min():.0f} max {rewards.max():.0f} "
          f"({time.time()-t_start:.0f}s)")

    # ---- BC baseline
    train_bc = build_policy_trainer(
        core, config, tokenizer, args.max_len, args.lr, args.bc_epochs, args.bsize
    )
    all_trajs = [t for t, _ in episodes]
    bc_params, bc_loss = train_bc(all_trajs, args.seed)
    print(f"BC loss {bc_loss:.3f} ({time.time()-t_start:.0f}s)")

    # ---- offline ILQL from the BC trunk
    chains = [
        TokenTrajectoryChain.from_text_trajectory_chain(
            TextTrajectoryChain(t, None), tokenizer
        )
        for t in all_trajs
    ]
    examples = [algo_data.ILQLExample.from_chain(c) for c in chains]
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
        use_separate_target_base=not args.freeze_base,
        freeze_base=args.freeze_base,
    )
    n_batches = -(-len(examples) // args.bsize)
    total_updates = max(1, args.ilql_epochs * n_batches)
    head_lr = (
        optax.cosine_decay_schedule(args.ilql_lr, total_updates)
        if args.lr_warmdown else args.ilql_lr
    )
    base_tx = (
        optax.set_to_zero() if args.freeze_base
        else optax.adamw(args.ilql_lr * 0.3)
    )
    state = init_ilql_state(
        jax.tree.map(jnp.array, bc_params),
        init_head_params(q_head, config.hidden_size, ks[0]),
        init_head_params(q_head, config.hidden_size, ks[1]),
        init_head_params(v_head, config.hidden_size, ks[2]),
        base_tx, optax.adamw(head_lr), ilql_config,
    )
    train_step = make_ilql_train_step(
        core, q_head, v_head, ilql_config, tokenizer.pad_token_id
    )
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(args.seed)
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
        print(f"ILQL epoch {epoch}: loss {float(loss):.3f} "
              f"q~{float(logs['q1']['mean']):.2f} v~{float(logs['v']['mean']):.2f} "
              f"({time.time()-t0:.0f}s)")

    # ---- serving policies
    server = LMServer(core, tokenizer)

    def bc_policy(greedy=True):
        def generate_batch(prompts, key):
            return server.generate_from_strs(
                bc_params, prompts, args.max_len,
                sampling_greedy if greedy else sampling_sample, key,
            )
        return GenerationPolicy(
            generate_batch=generate_batch, key=jax.random.PRNGKey(args.seed)
        )

    guided = ValueGuidedServer(
        core, q_head, v_head, tokenizer, beta=args.beta, share_trunk=False
    )
    guided_bundle = ValueRLParams(
        pi_beta=jax.tree.map(jnp.asarray, bc_params),
        base=state.base.params,
        q1_head=state.q1_head.params,
        q2_head=state.q2_head.params,
        v_head=state.v_head.params,
    )

    def guided_policy():
        def generate_batch(prompts, key):
            return guided.generate_from_strs(
                guided_bundle, prompts, args.max_len, sampling_greedy, key
            )
        return GenerationPolicy(
            generate_batch=generate_batch, key=jax.random.PRNGKey(args.seed)
        )

    score_bundle = ValueRLParams(
        pi_beta=None, base=state.base.params,
        q1_head=state.q1_head.params, q2_head=state.q2_head.params,
        v_head=state.v_head.params,
    )
    score_fn = make_ilql_score_fn(
        core, q_head, v_head, score_bundle, tokenizer.pad_token_id
    )
    K = args.rerank_k
    CH = args.eval_bsize * K  # fixed score-chunk shape: one compile

    class SampleRerankPolicy(BatchedTextPolicy):
        """K BC samples per turn, best by Σ_action(min(Q1,Q2)−V)."""

        def __init__(self):
            self.key = jax.random.PRNGKey(args.seed + 1)

        def act(self, histories, done=None):
            if done is None:
                done = [False] * len(histories)
            live = [i for i, d in enumerate(done) if not d]
            results = [None] * len(histories)
            if not live:
                return results
            from lmrl_gym_tpu.text.frames import text_history_to_str

            prompts = [text_history_to_str(histories[i]) for i in live]
            tiled = [pr for pr in prompts for _ in range(K)]
            self.key, gk = jax.random.split(self.key)
            outs = server.generate_from_strs(
                bc_params, tiled, args.max_len, sampling_sample, gk
            )
            cand_histories = []
            for j, i in enumerate(live):
                for k in range(K):
                    raw = outs[j * K + k]
                    out = strip_prompt_from_completion(prompts[j], raw)
                    cand_histories.append(histories[i] + (Text(out, True),))
            ids, am = tokenize_histories_for_scoring(
                cand_histories, tokenizer, args.max_len
            )
            n = ids.shape[0]
            if n < CH:
                ids = jnp.concatenate(
                    [ids, jnp.broadcast_to(ids[:1], (CH - n, ids.shape[1]))]
                )
                am = jnp.concatenate(
                    [am, jnp.broadcast_to(am[:1], (CH - n, am.shape[1]))]
                )
            scores = np.asarray(score_fn(ids, am))[:n]
            for j, i in enumerate(live):
                sub = scores[j * K : (j + 1) * K]
                results[i] = cand_histories[j * K + int(np.argmax(sub))]
            return results

    # ---- envs: scripted oracle always; LM oracle unless skipped
    envs = {"scripted": build_twenty_questions_env()}
    oracle_fidelity = None
    if not args.skip_lm_oracle:
        import random as _random

        from lmrl_gym_tpu.envs.lm_oracle import (
            OracleTrainConfig,
            build_lm_twenty_questions_env,
            collect_twenty_questions_qa,
            collect_twenty_questions_qa_balanced,
            train_oracle_lm,
        )
        from lmrl_gym_tpu.envs.twenty_questions.data import get_default_word_list
        from lmrl_gym_tpu.envs.twenty_questions.oracle import ScriptedOracle

        qa = collect_twenty_questions_qa(args.oracle_episodes, seed=args.seed)
        qa += collect_twenty_questions_qa_balanced(seed=args.seed) * 3
        oracle_core, _, oracle_params, _ = train_oracle_lm(
            qa,
            OracleTrainConfig(
                n_episodes=args.oracle_episodes, epochs=args.oracle_epochs,
                seed=args.seed,
            ),
            tokenizer=tokenizer,
        )
        envs["lm_oracle"] = build_lm_twenty_questions_env(
            oracle_core, tokenizer, oracle_params, batched=True
        )
        probe_words = get_default_word_list()
        rng0 = _random.Random(123)
        pw, pq = [], []
        for _ in range(100):
            w = rng0.choice(probe_words)
            t = (w.words[0] if rng0.random() < 0.5
                 else rng0.choice(probe_words).words[0]).lower()
            article = "an" if t[0] in "aeiou" else "a"
            pw.append(w)
            pq.append(f"Is it {article} {t}?")
        lm_ans = envs["lm_oracle"].oracle.generate_answers(pw, pq)
        sc_ans = ScriptedOracle().generate_answers(pw, pq)
        oracle_fidelity = sum(a == b for a, b in zip(lm_ans, sc_ans)) / len(pw)
        print(f"oracle fidelity vs scripted: {oracle_fidelity:.2f} "
              f"({time.time()-t_start:.0f}s)")

    def eval_policy(policy, env, name):
        _, summary = text_env_eval(
            env, policy, n_rollouts=args.eval_rollouts,
            seed_generator=iter(range(10_000, 10_000 + args.eval_rollouts)),
            bsize=args.eval_bsize,
        )
        r = summary["reward"]["mean"]
        print(f"{name}: reward {r:.2f} done {summary['done']['mean']:.2f} "
              f"len {summary['length']['mean']:.1f} "
              f"({time.time()-t_start:.0f}s)")
        return r

    results = {}
    for env_name, env in envs.items():
        results[f"bc_greedy_{env_name}"] = eval_policy(
            bc_policy(greedy=True), env, f"BC greedy [{env_name}]"
        )
        results[f"bc_sampled_{env_name}"] = eval_policy(
            bc_policy(greedy=False), env, f"BC sampled [{env_name}]"
        )
        results[f"ilql_guided_{env_name}"] = eval_policy(
            guided_policy(), env, f"ILQL guided [{env_name}]"
        )
        results[f"ilql_rerank_{env_name}"] = eval_policy(
            SampleRerankPolicy(), env, f"ILQL sample-rerank K={K} [{env_name}]"
        )

    gate_env = "lm_oracle" if "lm_oracle" in envs else "scripted"
    result = dict(
        behavior_reward_mean=float(rewards.mean()),
        oracle_fidelity=oracle_fidelity,
        gate_env=gate_env,
        bc_reward=results[f"bc_greedy_{gate_env}"],
        ilql_rerank_reward=results[f"ilql_rerank_{gate_env}"],
        ilql_guided_reward=results[f"ilql_guided_{gate_env}"],
        improvement=results[f"ilql_rerank_{gate_env}"]
        - results[f"bc_greedy_{gate_env}"],
        all_evals=results,
        model=f"d{args.hidden} L{args.layers} bpe vocab "
        f"{tokenizer.vocab_size} policy; in-repo LM oracle (ref uses "
        f"flan-t5-xl — zero egress); K={K} sample-rerank serving",
    )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(args=vars(args), **result), f, indent=1)
    return result


if __name__ == "__main__":
    main()
