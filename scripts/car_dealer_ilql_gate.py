"""Car-Dealer ILQL gate — the round-4 VERDICT's top item (dialog-task RL
win, BASELINE config #5's learning half) on its named fallback task:
"Car-Dealer (continuous reward — `fancy` mode gives gradient everywhere)".
Reference recipe: llm_rl_scripts/car_dealer/ilql/train_ilql.py (offline
ILQL on seller-view conversations vs the GPT-2 buyer sim,
car_dealer/env/buyer.py:12-83).

Why Car-Dealer: the 20Q attempt (scripts/dialog_ilql_gate.py) showed the
task's wins are luck-dominated at this scale AND its Σ-advantage reranker
carries a length bias (short wasteful guesses score higher — PERF_NOTES
r5). Car-Dealer's fancy reward buy_price/((budget+msrp)/2) is CONTINUOUS
in the negotiated price (car_dealer/env/data.py:130-173), so strategy —
not luck — sets the episode return, and every candidate offer has the
same surface form, so ranking is clean.

The adversarial setup (same philosophy as scripts/maze_ilql_gate.py):

  1. behavior = RANDOM-PRICE seller: each offer turn quotes a uniformly
     random price from a 9-value menu. Identical contexts thus carry
     actions spanning the full quality range (measured: mean 0.65,
     min 0.07, max 0.97) — BC imitates the uniform mess while Q(s,a)
     separates it. The scripted buyer's counteroffer min(budget, 0.9·p)
     REVEALS the budget in-context whenever 0.9·p > budget, so the
     optimal continuation (offer exactly the revealed budget → reward
     ~1.0) is inferable from the conversation alone;
  2. BC on all episodes (the baseline RL must beat);
  3. offline ILQL from the BC trunk (twin-Q + V, cosine lr warmdown);
  4. serving: (a) SAMPLE-RERANK — K BC proposals per turn scored by the
     LENGTH-NORMALIZED mean_action(min(Q1,Q2)−V) (the r5 bias fix in
     make_ilql_score_fn), argmax (reference ReRankerPolicy,
     ppo/reranker_policy.py:5-32 + ilql/gpt2/score_fn.py:11-68); and
     (b) β-guided two-trunk decode π_β + β·min(Q1,Q2)
     (value_rl_base/gpt2/generation.py:36-121);
  5. eval on fixed seeds vs BOTH the scripted buyer and a TRAINED LM
     buyer in the loop (decoder-only like the reference's GPT-2 buyer,
     car_dealer/env/buyer.py; trained in-repo — zero egress), with a
     (budget × price)-grid fidelity probe for the LM buyer.

Gate: ILQL (best declared serving = sample-rerank) beats BC greedy by
--margin on fixed seeds in the scripted env, and the same ordering holds
through the LM buyer.

Run on the TPU chip:  python scripts/car_dealer_ilql_gate.py
tests/test_learning_gate.py carries a slow-marked CPU-budget variant.
"""
import argparse
import json
import os
import random
import re
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

PRICE_MENU = [15000, 25000, 35000, 45000, 55000, 65000, 75000, 85000, 95000]
WELCOME = "Welcome! We have excellent cars on the lot today.\n"


def offer_line(price: int) -> str:
    return f"I can offer this one for ${price:,}. It's a great deal.\n"


def make_random_price_seller(rng):
    """Behavior policy: uniform menu price at every offer turn."""
    from lmrl_gym_tpu.envs.base import TextPolicy
    from lmrl_gym_tpu.text.frames import Text

    class RandomPriceSeller(TextPolicy):
        def act(self, th):
            n = sum(1 for t in th if t.is_action)
            if n == 0:
                return th + (Text(WELCOME, True),)
            return th + (Text(offer_line(rng.choice(PRICE_MENU)), True),)

    return RandomPriceSeller()


def collect_behavior(n_episodes, seed):
    """Random-price seller vs the scripted buyer → (trajectory, return)."""
    from lmrl_gym_tpu.cli.tasks import build_car_dealer_env, transitions_to_chain
    from lmrl_gym_tpu.envs.base import interact_environment

    env = build_car_dealer_env()
    rng = random.Random(seed)
    episodes = []
    for i in range(n_episodes):
        transitions = interact_environment(
            env, make_random_price_seller(rng), env_seed=seed * 104729 + i
        )[0]
        chain = transitions_to_chain(transitions)
        traj = chain.text_trajectory
        episodes.append((traj, sum(traj.reward)))
    return episodes


def buyer_fidelity_grid(lm_env_buyer_factory, tokenizer=None):
    """Probe the LM buyer on the full (budget × menu price) grid: build
    the exact buyer-view prompt the env serves (persona header + welcome
    + buyer ask + seller offer), compare the buyer's decision and
    counteroffer against the scripted buyer on the same view."""
    from lmrl_gym_tpu.envs.car_dealer.data import (
        DEFAULT_BRANDS, DEFAULT_BUDGETS, DEFAULT_FEATURES,
        DEFAULT_PERSONALITIES, DEFAULT_TYPES, Role,
        create_lines_from_text_history, create_trajectory_from_conversation,
        extract_output_from_str,
    )
    from lmrl_gym_tpu.envs.car_dealer.env import ScriptedBuyerPolicy
    from lmrl_gym_tpu.text.frames import Text

    rng = random.Random(0)
    agree, total = 0, 0
    for budget in DEFAULT_BUDGETS:
        for price in PRICE_MENU:
            info = {
                "personality": rng.choice(DEFAULT_PERSONALITIES),
                "preferred_brands": rng.choice(DEFAULT_BRANDS),
                "preferred_type": rng.choice(DEFAULT_TYPES),
                "preferred_features": rng.sample(DEFAULT_FEATURES, k=2),
                "budget": budget,
            }
            ask = (
                f"I'm looking for {info['preferred_brands']} "
                f"{info['preferred_type']}. What have you got?\n"
            )
            seller_view = (
                Text("Start\n", False), Text(WELCOME, True),
                Text(ask, False), Text(offer_line(price), True),
            )
            conversation = {
                "buyer_info": info,
                "lines": create_lines_from_text_history(seller_view),
            }
            view = create_trajectory_from_conversation(conversation, Role.BUYER)
            scripted = ScriptedBuyerPolicy(info, patience=4)
            want = scripted.act(view.text_history)[-1].text
            got = lm_env_buyer_factory(info).act(view.text_history)[-1].text
            w_out, _ = extract_output_from_str(want)
            g_out, _ = extract_output_from_str(got)
            if w_out is not None or g_out is not None:
                ok = (
                    w_out is not None and g_out is not None
                    and w_out["car_bought"] == g_out["car_bought"]
                    and w_out.get("buy_price") == g_out.get("buy_price")
                )
            else:
                wm = re.findall(r"\$([0-9][0-9,]*)", want)
                gm = re.findall(r"\$([0-9][0-9,]*)", got)
                ok = bool(wm) and wm == gm
            agree += int(ok)
            total += 1
    return agree / total


def ranking_probe(score_fn, tokenizer, max_len):
    """Controlled Q-ranking probe, independent of rollout noise: the state
    is welcome → buyer ask → offer $95,000 → buyer counter min(B, $85,500)
    (which reveals the budget B for every B < $85,500), and the candidates
    are the nine menu offers. The best continuation is the largest menu
    price ≤ the counter (sale at 2p/(B+p)), except B=$10,000 where no menu
    price fits under budget and the top reject reward (p−B)/p picks $95k.
    Returns (rank accuracy over budgets, per-budget score rows)."""
    import jax.numpy as jnp  # local: probe is called from main only
    from lmrl_gym_tpu.algos.value_policy import tokenize_histories_for_scoring
    from lmrl_gym_tpu.envs.car_dealer.data import DEFAULT_BUDGETS
    from lmrl_gym_tpu.text.frames import Text

    best = {10000: 95000, 30000: 25000, 50000: 45000, 70000: 65000, 90000: 85000}
    rows, hits = [], 0
    for budget in DEFAULT_BUDGETS:
        counter = min(budget, int(95000 * 0.9))
        state = (
            Text("Start\n", False), Text(WELCOME, True),
            Text("I'm looking for a Toyota SUV. What have you got?\n", False),
            Text(offer_line(95000), True),
            Text(f"That's too much. I could do ${counter:,}.\n", False),
        )
        cands = [state + (Text(offer_line(p), True),) for p in PRICE_MENU]
        ids, am = tokenize_histories_for_scoring(cands, tokenizer, max_len)
        scores = np.asarray(score_fn(jnp.asarray(ids), jnp.asarray(am)))
        pick = PRICE_MENU[int(np.argmax(scores))]
        hits += int(pick == best[budget])
        rows.append({
            "budget": budget, "picked": pick, "best": best[budget],
            "scores": {str(p): round(float(s), 4)
                       for p, s in zip(PRICE_MENU, scores)},
        })
    return hits / len(DEFAULT_BUDGETS), rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--behavior-episodes", type=int, default=600)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--bc-epochs", type=int, default=40)
    p.add_argument(
        "--ilql-epochs", type=int, default=80,
        help="token-level Bellman backups propagate reward one action "
        "token per target refresh; a ~45-action-token episode at polyak "
        "0.02 needs thousands of updates before turn-level Q ranks "
        "(the 12-epoch first run left Q flat at the attenuated mean)",
    )
    p.add_argument(
        "--mc-epochs", type=int, default=60,
        help="MC-returns column (single Q regressed on reward-to-go — no "
        "propagation chain; mc_returns/train_mc.py:38). 0 disables.",
    )
    p.add_argument("--bsize", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ilql-lr", type=float, default=1e-3)
    p.add_argument("--beta", type=float, default=8.0)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--polyak", type=float, default=0.02)
    p.add_argument("--value-bias-init", type=float, default=0.65,
                   help="behavior-mixture mean return (fancy reward)")
    p.add_argument("--freeze-base", action="store_true")
    p.add_argument("--lr-warmdown", action="store_true", default=True)
    p.add_argument("--no-lr-warmdown", dest="lr_warmdown", action="store_false")
    p.add_argument("--rerank-k", type=int, default=8)
    p.add_argument("--rerank-temp", type=float, default=1.0)
    p.add_argument("--max-len", type=int, default=448)
    p.add_argument("--bpe-vocab", type=int, default=1024)
    p.add_argument("--eval-rollouts", type=int, default=64)
    p.add_argument("--eval-bsize", type=int, default=16)
    p.add_argument("--buyer-episodes", type=int, default=400)
    p.add_argument("--buyer-epochs", type=int, default=12)
    p.add_argument("--buyer-hidden", type=int, default=192)
    p.add_argument("--skip-lm-buyer", action="store_true",
                   help="scripted-buyer eval only (fast debug)")
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
    from flax.training.train_state import TrainState as _TS
    from twenty_questions_gate import build_policy_trainer

    from lmrl_gym_tpu.algos import data as algo_data
    from lmrl_gym_tpu.algos.ilql import (
        ILQLBatch, ILQLConfig, init_ilql_state, make_ilql_train_step,
    )
    from lmrl_gym_tpu.algos.mc import (
        MCBatch, MCConfig, MCTrainState, make_mc_train_step,
    )
    from lmrl_gym_tpu.algos.value_policy import (
        GenerationPolicy,
        LMServer,
        ValueGuidedServer,
        ValueRLParams,
        make_ilql_score_fn,
        make_mc_score_fn,
        tokenize_histories_for_scoring,
    )
    from lmrl_gym_tpu.cli.tasks import build_car_dealer_env
    from lmrl_gym_tpu.core.blocking import (
        BlockingStrategy, Padding, Truncation, strip_prompt_from_completion,
    )
    from lmrl_gym_tpu.envs.base import BatchedTextPolicy, text_env_eval
    from lmrl_gym_tpu.models.config import tiny_test_config
    from lmrl_gym_tpu.models.generation import SamplingConfig
    from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params
    from lmrl_gym_tpu.models.interface import LMCore
    from lmrl_gym_tpu.text.bpe import train_bpe
    from lmrl_gym_tpu.text.frames import (
        Text, TextTrajectoryChain, TokenTrajectoryChain,
    )

    t_start = time.time()

    # ---- behavior: random-price seller (adversarial quality spread)
    episodes = collect_behavior(args.behavior_episodes, args.seed)
    rewards = np.asarray([r for _, r in episodes])
    print(f"behavior: {len(episodes)} episodes, reward mean {rewards.mean():.3f} "
          f"min {rewards.min():.3f} max {rewards.max():.3f} "
          f"({time.time()-t_start:.0f}s)")

    # ---- tokenizer on the gate's own text distribution: seller views
    # (menu prices) + buyer views (personas, counters, verdict lines)
    from lmrl_gym_tpu.envs.lm_oracle import collect_buyer_conversations

    corpus = [t.text for traj, _ in episodes[:150] for t in traj.text_history]
    corpus += [
        t.text
        for w in collect_buyer_conversations(
            60, seed=args.seed + 13, seller_factory=make_random_price_seller
        )
        for t in w.text_history
    ]
    tokenizer = train_bpe(corpus, vocab_size=args.bpe_vocab)
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
        max_new_tokens=40, greedy=True, eos_token_id=eos_id,
        pad_token_id=tokenizer.pad_token_id,
    )
    sampling_sample = SamplingConfig(
        max_new_tokens=40, greedy=False, temperature=args.rerank_temp,
        eos_token_id=eos_id, pad_token_id=tokenizer.pad_token_id,
    )

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

    # ---- MC-returns column: single Q regressed on reward-to-go
    # (mc_returns/train_mc.py:38 — no Bellman chain, so turn-level
    # ranking needs no target propagation)
    mc_state = None
    if args.mc_epochs > 0:
        mc_examples = [
            algo_data.MCExample.from_chain(c, args.gamma) for c in chains
        ]
        mc_dataset = algo_data.ArrayDataset(
            algo_data.block_mc_examples(
                mc_examples, strategy, tokenizer.pad_token_id
            )
        )
        mc_total = max(1, args.mc_epochs * n_batches)
        mc_lr = (
            optax.cosine_decay_schedule(args.ilql_lr, mc_total)
            if args.lr_warmdown else args.ilql_lr
        )
        mc_state = MCTrainState(
            base=_TS.create(
                apply_fn=None, params=jax.tree.map(jnp.array, bc_params),
                tx=optax.set_to_zero() if args.freeze_base
                else optax.adamw(args.ilql_lr * 0.3),
            ),
            q_head=_TS.create(
                apply_fn=None,
                params=init_head_params(q_head, config.hidden_size, ks[1]),
                tx=optax.adamw(mc_lr),
            ),
        )
        mc_step = make_mc_train_step(
            core, q_head, MCConfig(gamma=args.gamma),
            tokenizer.pad_token_id,
        )
        mkey = jax.random.PRNGKey(4)
        mrng = np.random.default_rng(args.seed + 2)
        for epoch in range(1, args.mc_epochs + 1):
            t0 = time.time()
            for b in mc_dataset.batches(args.bsize, rng=mrng, drop_last=False):
                mkey, sk = jax.random.split(mkey)
                mc_state, mloss, mlogs = mc_step(
                    mc_state,
                    MCBatch(
                        input_ids=jnp.asarray(b["input_ids"]),
                        should_take_action=jnp.asarray(b["should_take_action"]),
                        returns=jnp.asarray(b["returns"]),
                    ),
                    sk,
                )
            if epoch % 10 == 0 or epoch == args.mc_epochs:
                print(f"MC epoch {epoch}: loss {float(mloss):.4f} "
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
    # length-normalized mean advantage: the r5 fix for the Σ-advantage
    # short-candidate bias diagnosed on 20Q (PERF_NOTES r5)
    score_fn = make_ilql_score_fn(
        core, q_head, v_head, score_bundle, tokenizer.pad_token_id,
        length_normalize=True,
    )
    mc_score_fn = None
    if mc_state is not None:
        mc_bundle = ValueRLParams(
            pi_beta=None, base=mc_state.base.params,
            q1_head=mc_state.q_head.params, q2_head=None, v_head=None,
        )
        mc_score_fn = make_mc_score_fn(
            core, q_head, mc_bundle, tokenizer.pad_token_id,
            length_normalize=True,
        )

    # controlled Q-ranking probes (rollout-independent diagnosability)
    ilql_probe_acc, ilql_probe_rows = ranking_probe(
        score_fn, tokenizer, args.max_len
    )
    print(f"ILQL ranking probe: {ilql_probe_acc:.2f} "
          f"picks {[r['picked'] for r in ilql_probe_rows]} "
          f"best {[r['best'] for r in ilql_probe_rows]}")
    mc_probe_acc, mc_probe_rows = (None, None)
    if mc_score_fn is not None:
        mc_probe_acc, mc_probe_rows = ranking_probe(
            mc_score_fn, tokenizer, args.max_len
        )
        print(f"MC ranking probe: {mc_probe_acc:.2f} "
              f"picks {[r['picked'] for r in mc_probe_rows]}")

    K = args.rerank_k
    CH = args.eval_bsize * K

    class SampleRerankPolicy(BatchedTextPolicy):
        """K BC samples per turn, best by the given action-token score."""

        def __init__(self, scorer=None):
            self.scorer = scorer if scorer is not None else score_fn
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
            scores = np.asarray(self.scorer(ids, am))[:n]
            for j, i in enumerate(live):
                sub = scores[j * K : (j + 1) * K]
                results[i] = cand_histories[j * K + int(np.argmax(sub))]
            return results

    # ---- envs: scripted buyer always; trained LM buyer unless skipped
    envs = {"scripted": build_car_dealer_env()}
    buyer_fidelity = None
    if not args.skip_lm_buyer:
        from lmrl_gym_tpu.envs.lm_oracle import (
            OracleTrainConfig, build_lm_car_dealer_env, train_oracle_lm,
        )

        buyer_windows = collect_buyer_conversations(
            args.buyer_episodes, seed=args.seed + 1,
            seller_factory=make_random_price_seller,
        )
        buyer_core, _, buyer_params, _ = train_oracle_lm(
            buyer_windows,
            OracleTrainConfig(
                n_episodes=args.buyer_episodes, epochs=args.buyer_epochs,
                max_length=512, hidden_size=args.buyer_hidden, seed=args.seed,
            ),
            tokenizer=tokenizer,
        )
        lm_env = build_lm_car_dealer_env(buyer_core, tokenizer, buyer_params)
        envs["lm_buyer"] = lm_env
        buyer_fidelity = buyer_fidelity_grid(lm_env.buyer_factory)
        print(f"LM buyer fidelity on the (budget x price) grid: "
              f"{buyer_fidelity:.2f} ({time.time()-t_start:.0f}s)")

    def eval_policy(policy, env, name):
        _, summary = text_env_eval(
            env, policy, n_rollouts=args.eval_rollouts,
            seed_generator=iter(range(10_000, 10_000 + args.eval_rollouts)),
            bsize=args.eval_bsize,
        )
        r = summary["reward"]["mean"]
        print(f"{name}: reward {r:.3f} done {summary['done']['mean']:.2f} "
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
        if mc_score_fn is not None:
            results[f"mc_rerank_{env_name}"] = eval_policy(
                SampleRerankPolicy(mc_score_fn), env,
                f"MC sample-rerank K={K} [{env_name}]",
            )

    result = dict(
        behavior_reward_mean=float(rewards.mean()),
        buyer_fidelity=buyer_fidelity,
        gate_env="scripted",
        bc_reward=results["bc_greedy_scripted"],
        ilql_rerank_reward=results["ilql_rerank_scripted"],
        ilql_guided_reward=results["ilql_guided_scripted"],
        mc_rerank_reward=results.get("mc_rerank_scripted"),
        ilql_probe_acc=ilql_probe_acc,
        mc_probe_acc=mc_probe_acc,
        ilql_probe=ilql_probe_rows,
        mc_probe=mc_probe_rows,
        improvement=results["ilql_rerank_scripted"]
        - results["bc_greedy_scripted"],
        mc_improvement=(
            results["mc_rerank_scripted"] - results["bc_greedy_scripted"]
            if mc_score_fn is not None else None
        ),
        lm_improvement=(
            results["ilql_rerank_lm_buyer"] - results["bc_greedy_lm_buyer"]
            if "lm_buyer" in envs else None
        ),
        all_evals=results,
        model=f"d{args.hidden} L{args.layers} bpe vocab "
        f"{tokenizer.vocab_size} policy; in-repo LM buyer "
        f"d{args.buyer_hidden} (ref uses a finetuned GPT-2 buyer "
        f"checkpoint — zero egress); K={K} sample-rerank serving with "
        f"length-normalized mean-advantage scores",
    )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(args=vars(args), **result), f, indent=1)
    return result


if __name__ == "__main__":
    main()
