"""Reference-scale ILQL learning gate on the double-T maze (VERDICT r2
item 2). The reference's headline maze evaluator is per-cell optimal-move
accuracy vs the BFS table (maze/env/maze_utils.py:63-89); BASELINE asks
for "a Maze ILQL run reaching reference eval return". This harness runs
the full pipeline at enough scale to clear a high-water threshold and
prints the learning curve:

  1. behavior data with an ADVERSARIAL mode: p_optimal of the mass on the
     BFS-optimal action, the rest on a fixed wrong action — so BC greedy
     imitation is systematically wrong and only value learning can
     recover optimality (RL > imitation, the point of the benchmark);
  2. BC pretrain (the reference pipeline's first stage);
  3. offline ILQL; every eval_every epochs, per-cell accuracy of the
     β-guided decode policy (π_β + β·min(q1,q2), shared trunk).

Run on the TPU chip:  python scripts/maze_ilql_gate.py
The recorded curve lives in PERF_NOTES.md; tests/test_learning_gate.py
has a slow-marked assertion version.

--gpt2-small runs the gate at the REFERENCE operating point (round-3
VERDICT item 1): the exact GPT-2-small architecture — d768 L12 H12,
vocab 50,257 (maze/ilql/train_ilql.py:184-194 loads HF gpt2) — with the
in-repo BPE tokenizer (text/bpe.py) in place of the hub-downloaded GPT-2
BPE (zero egress; pretrained weights are likewise not obtainable here,
so the trunk is BC-pretrained from random init on the behavior data —
the honest in-environment equivalent, documented in PERF_NOTES.md).
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
    p.add_argument(
        "--algo", choices=["ilql", "mc", "cql"], default="ilql",
        help="mc: single-Q reward-to-go regression + Σ-Q reranker "
        "(mc_returns/train_mc.py:38, score_fn.py:10-60); cql: twin-Q "
        "SARSA + CQL regularizer, ILQL minus the V head "
        "(cql/base_interface.py:29-120)",
    )
    p.add_argument(
        "--lr-warmdown", action="store_true",
        help="cosine-decay the head lr to 0 over the training run. The "
        "Q→polyak-target→expectile-V→Q recursion rings at a fixed point "
        "with constant lr (9 instrumented runs, PERF_NOTES r4); decaying "
        "lr shrinks the ring amplitude to zero so the curve holds to the "
        "END of training instead of needing an early stop",
    )
    p.add_argument(
        "--guided-legal", action="store_true",
        help="constrain guided decode to the 4 legal maze actions "
        "(models/generation.py::generate_constrained) — the serving-side "
        "composition of the env's action set, VERDICT r4 item 4",
    )
    p.add_argument(
        "--eval-heads", choices=["online", "target"], default="online",
        help="score rerank/guided evals through the ONLINE heads or the "
        "polyak TARGET heads (a free EMA of the online heads — the "
        "principled always-on evaluation choice for a ringing fixed "
        "point, not an early-stopping trick)",
    )
    p.add_argument("--n-chains", type=int, default=400)
    p.add_argument("--p-optimal", type=float, default=0.35)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--bc-epochs", type=int, default=4)
    p.add_argument("--ilql-epochs", type=int, default=12)
    p.add_argument("--eval-every", type=int, default=2)
    p.add_argument("--bsize", type=int, default=32)
    p.add_argument(
        "--grad-accum", type=int, default=1,
        help="optax.MultiSteps on the head optimizer: effective batch "
        "bsize*accum without the head-logits memory (B=64 already OOMs "
        "the 16GB chip at vocab 50257); polyak is accum-gated already",
    )
    p.add_argument("--beta", type=float, default=8.0)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--polyak", type=float, default=0.005)
    p.add_argument(
        "--value-bias-init", type=float, default=0.0,
        help="last-layer bias init of the Q/V heads. Starting values near "
        "the typical return kills the slow descent transient (zero-init "
        "heads at gamma=0.99 spend 30+ epochs sinking to ~-20 while the "
        "action ranking sloshes; cf. the reference's bias_init=-4.1 "
        "wordle value head, wordle/ppo/train_ppo_gpt2.py:254-259)",
    )
    p.add_argument(
        "--freeze-base", action="store_true",
        help="heads-only ILQL on stop-gradient trunk features "
        "(ILQLConfig.freeze_base): the stable configuration for "
        "high-capacity trunks; equivalent to the reference recipe with "
        "base lr -> 0",
    )
    p.add_argument(
        "--lr", type=float, default=None,
        help="default 1e-3 (3e-4 under --gpt2-small); explicit values are "
        "never overridden",
    )
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--out", type=str, default=None)
    p.add_argument(
        "--gpt2-small", action="store_true",
        help="run at the reference operating point: GPT-2-small arch "
        "(d768 L12 H12, vocab 50257) + in-repo BPE tokenizer",
    )
    p.add_argument("--tokenizer", choices=["byte", "bpe"], default=None)
    p.add_argument("--bpe-vocab", type=int, default=1024)
    args = p.parse_args(argv)
    if args.gpt2_small:
        args.hidden, args.layers, args.heads = 768, 12, 12
        if args.tokenizer is None:
            args.tokenizer = "bpe"
    if args.lr is None:
        args.lr = 3e-4 if args.gpt2_small else 1e-3  # GPT-2-small: 1e-3 unstable
    if args.tokenizer is None:
        args.tokenizer = "byte"

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
    from lmrl_gym_tpu.algos.value_policy import ValueGuidedServer, ValueRLParams
    from lmrl_gym_tpu.cli.tasks import generate_maze_chains
    from lmrl_gym_tpu.core.blocking import BlockingStrategy, Padding, Truncation
    from lmrl_gym_tpu.core.optimizer import OptimizerConfig, make_optimizer
    from lmrl_gym_tpu.envs.maze.eval import per_cell_optimal_move_accuracy
    from lmrl_gym_tpu.envs.maze.grids import double_t_maze
    from lmrl_gym_tpu.models.config import TransformerConfig
    from lmrl_gym_tpu.models.generation import SamplingConfig
    from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params
    from lmrl_gym_tpu.models.interface import LMCore
    from lmrl_gym_tpu.models.transformer import init_params
    from lmrl_gym_tpu.algos.value_policy import LMServer
    from lmrl_gym_tpu.text.frames import TokenTrajectoryChain
    from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

    MAX_LEN, GOAL = 160, (8, 6)
    if args.tokenizer == "bpe":
        from lmrl_gym_tpu.text.bpe import train_bpe_for_task

        tokenizer = train_bpe_for_task(
            "maze", vocab_size=args.bpe_vocab, n_episodes=100, seed=0
        )
        eos_id = tokenizer.newline_token_id
    else:
        tokenizer = ByteTokenizer()
        eos_id = 10
    # --gpt2-small: model vocab is the full 50,257 GPT-2 id space even
    # though the task BPE only populates the low ids — the embedding/
    # softmax cost is what defines the reference operating point
    model_vocab = 50257 if args.gpt2_small else tokenizer.vocab_size
    assert tokenizer.vocab_size <= model_vocab
    config = TransformerConfig(
        vocab_size=model_vocab, hidden_size=args.hidden,
        num_layers=args.layers, num_heads=args.heads,
        max_position_embeddings=256,
        pad_vocab_to_multiple=128 if args.gpt2_small else 64,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
    )
    core = LMCore(config)
    maze = double_t_maze()
    strategy = BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, MAX_LEN)
    sampling = SamplingConfig(
        max_new_tokens=12, greedy=True, eos_token_id=eos_id,
        pad_token_id=tokenizer.pad_token_id,
    )
    print(f"model: d{args.hidden} L{args.layers} H{args.heads} "
          f"vocab{model_vocab} tokenizer={args.tokenizer}({tokenizer.vocab_size})")

    print(f"data: {args.n_chains} chains, p_optimal={args.p_optimal} wrong-biased")
    chains = generate_maze_chains(
        args.n_chains, seed=args.seed, p_optimal=args.p_optimal, wrong_bias=True
    )
    token_chains = [
        TokenTrajectoryChain.from_text_trajectory_chain(c, tokenizer) for c in chains
    ]

    # ---- stage 1: BC pretrain
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

    server = LMServer(core, tokenizer)

    def bc_act(histories):
        from lmrl_gym_tpu.text.frames import Text
        prompts = ["".join(t.text for t in h) for h in histories]
        outs = server.generate_from_strs(
            bc_params, prompts, MAX_LEN, sampling, jax.random.PRNGKey(0)
        )
        return [h + (Text(o, True),) for h, o in zip(histories, outs)]

    bc_acc, _ = per_cell_optimal_move_accuracy(bc_act, maze, GOAL)
    print(f"BC greedy per-cell accuracy: {bc_acc:.3f}  "
          f"(bc loss {float(bc_loss):.3f}, {time.time()-t0:.0f}s)")

    # ---- stage 2: offline value learning (ILQL / MC / CQL) from the BC trunk
    examples = []
    for c in token_chains:
        curr = c
        while curr is not None:
            if args.algo == "mc":
                examples.append(algo_data.MCExample.from_chain(curr, args.gamma))
            else:
                examples.append(algo_data.ILQLExample.from_chain(curr))
            curr = curr.next
    if args.algo == "mc":
        dataset = algo_data.ArrayDataset(
            algo_data.block_mc_examples(examples, strategy, tokenizer.pad_token_id)
        )
    else:
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

    # head-lr schedule: constant, or cosine warmdown to 0 over the run
    n_batches_per_epoch = -(-len(examples) // args.bsize)
    total_updates = max(
        1, args.ilql_epochs * n_batches_per_epoch // max(1, args.grad_accum)
    )
    head_lr = (
        optax.cosine_decay_schedule(args.lr, total_updates)
        if args.lr_warmdown
        else args.lr
    )
    base_tx = (
        optax.set_to_zero() if args.freeze_base else optax.adamw(args.lr * 0.3)
    )
    head_tx = optax.adamw(head_lr)
    if args.grad_accum > 1:
        head_tx = optax.MultiSteps(head_tx, every_k_schedule=args.grad_accum)
        if not args.freeze_base:
            base_tx = optax.MultiSteps(base_tx, every_k_schedule=args.grad_accum)

    if args.algo == "ilql":
        ilql_config = ILQLConfig(
            use_separate_target_base=not args.freeze_base,
            polyak_alpha=args.polyak,
            freeze_base=args.freeze_base,
            gamma=args.gamma,
        )
        state = init_ilql_state(
            jax.tree.map(jnp.array, bc_params),
            init_head_params(q_head, config.hidden_size, ks[0]),
            init_head_params(q_head, config.hidden_size, ks[1]),
            init_head_params(v_head, config.hidden_size, ks[2]),
            base_tx, head_tx,
            ilql_config,
        )
        train_step = make_ilql_train_step(
            core, q_head, v_head, ilql_config, tokenizer.pad_token_id
        )
    elif args.algo == "cql":
        from lmrl_gym_tpu.algos.cql import (
            CQLConfig, init_cql_state, make_cql_train_step,
        )

        cql_config = CQLConfig(
            gamma=args.gamma, polyak_alpha=args.polyak,
            use_separate_target_base=not args.freeze_base,
        )
        state = init_cql_state(
            jax.tree.map(jnp.array, bc_params),
            init_head_params(q_head, config.hidden_size, ks[0]),
            init_head_params(q_head, config.hidden_size, ks[1]),
            base_tx, head_tx,
            cql_config,
        )
        train_step = make_cql_train_step(
            core, q_head, cql_config, tokenizer.pad_token_id
        )
    else:  # mc
        from flax.training.train_state import TrainState as _TS

        from lmrl_gym_tpu.algos.mc import (
            MCBatch, MCConfig, MCTrainState, make_mc_train_step,
        )

        mc_config = MCConfig(gamma=args.gamma)
        state = MCTrainState(
            base=_TS.create(
                apply_fn=None, params=jax.tree.map(jnp.array, bc_params),
                tx=base_tx,
            ),
            q_head=_TS.create(
                apply_fn=None,
                params=init_head_params(q_head, config.hidden_size, ks[0]),
                tx=head_tx,
            ),
        )
        train_step = make_mc_train_step(
            core, q_head, mc_config, tokenizer.pad_token_id
        )

    guided = ValueGuidedServer(
        core, q_head, v_head, tokenizer, beta=args.beta, share_trunk=False
    )

    def heads_of(state, use_target):
        """(q1, q2, v) params per algo; use_target swaps in the polyak
        EMA heads where the algo keeps them (MC has none)."""
        if args.algo == "ilql":
            if use_target:
                return state.q1_target_params, state.q2_target_params, state.v_head.params
            return state.q1_head.params, state.q2_head.params, state.v_head.params
        if args.algo == "cql":
            if use_target:
                return state.q1_target_params, state.q2_target_params, None
            return state.q1_head.params, state.q2_head.params, None
        return state.q_head.params, None, None

    ACTION_PROPOSALS = ["move up\n", "move down\n", "move left\n", "move right\n"]

    def guided_act_fn(state):
        q1p, q2p, vp = heads_of(state, args.eval_heads == "target")
        bundle = ValueRLParams(
            pi_beta=bc_params, base=state.base.params,
            q1_head=q1p, q2_head=q2p, v_head=vp,
        )

        def act(histories):
            from lmrl_gym_tpu.text.frames import Text
            prompts = ["".join(t.text for t in h) for h in histories]
            if args.guided_legal:
                outs = guided.generate_from_strs_legal(
                    bundle, prompts, [ACTION_PROPOSALS] * len(prompts),
                    MAX_LEN, sampling, jax.random.PRNGKey(0),
                    max_proposals=4, max_proposal_len=16,
                )
            else:
                outs = guided.generate_from_strs(
                    bundle, prompts, MAX_LEN, sampling, jax.random.PRNGKey(0)
                )
            return [h + (Text(o, True),) for h, o in zip(histories, outs)]

        return act

    # reranker probe: score the 4-move proposal set with Σ(min(Q1,Q2)−V)
    # per cell (the reference's maze reranker) — decomposes VALUE learning
    # from decode-composition failures in the guided accuracy
    from lmrl_gym_tpu.algos.value_policy import (
        ReRankerPolicy,
        make_ilql_score_fn,
        tokenize_histories_for_scoring,
    )
    from lmrl_gym_tpu.envs.maze.grids import ACTION_STRS
    from lmrl_gym_tpu.text.frames import Text as _Text

    from lmrl_gym_tpu.algos.value_policy import make_mc_score_fn

    def reranker_acc(state, use_target=False):
        """use_target=True scores with the polyak TARGET Q heads — a free
        exponential moving average of the online heads, which damps the
        Q/V fixed-point ringing at evaluation time (the reference keeps
        the same target params; evaluating through them is the
        Polyak-averaged-weights trick). MC keeps no targets; its online
        heads are returned either way."""
        q1p, q2p, vp = heads_of(state, use_target)
        bundle = ValueRLParams(
            pi_beta=None, base=state.base.params,
            q1_head=q1p, q2_head=q2p, v_head=vp,
        )
        if args.algo == "ilql":
            score = make_ilql_score_fn(
                core, q_head, v_head, bundle, tokenizer.pad_token_id
            )
        else:
            # length_normalize: byte-tokenizer proposals are 8-11 tokens,
            # so the reference's raw Σ-Q favors short proposals (see
            # make_mc_score_fn docstring); mean-Q is the faithful probe
            score = make_mc_score_fn(
                core, q_head, bundle, tokenizer.pad_token_id,
                length_normalize=True,
            )

        def proposal_fn(history):
            return [history + (_Text(a, True),) for a in ACTION_STRS]

        def score_batch(histories):
            ids, am = tokenize_histories_for_scoring(histories, tokenizer, MAX_LEN)
            return np.asarray(score(ids, am))

        policy = ReRankerPolicy(proposal_fn=proposal_fn, score_batch=score_batch)
        acc, _ = per_cell_optimal_move_accuracy(lambda hs: policy.act(hs), maze, GOAL)
        return acc

    def make_batch(b):
        if args.algo == "mc":
            from lmrl_gym_tpu.algos.mc import MCBatch as _MCBatch

            return _MCBatch(
                input_ids=jnp.asarray(b["input_ids"]),
                should_take_action=jnp.asarray(b["should_take_action"]),
                returns=jnp.asarray(b["returns"]),
            )
        return ILQLBatch(
            input_ids=jnp.asarray(b["input_ids"]),
            should_take_action=jnp.asarray(b["should_take_action"]),
            rewards=jnp.asarray(b["rewards"]),
            dones=jnp.asarray(b["dones"]),
            next_token_ids=jnp.asarray(b["next_token_ids"]),
            next_dones=jnp.asarray(b["next_dones"]),
        )

    curve = [dict(epoch=0, acc=bc_acc, kind="bc")]
    _last_logs = None
    for epoch in range(1, args.ilql_epochs + 1):
        t0 = time.time()
        for b in dataset.batches(args.bsize, rng=rng, drop_last=False):
            key, sk = jax.random.split(key)
            state, loss, _last_logs = train_step(state, make_batch(b), sk)
        if epoch % args.eval_every == 0 or epoch == args.ilql_epochs:
            acc, _ = per_cell_optimal_move_accuracy(guided_act_fn(state), maze, GOAL)
            racc = reranker_acc(state)
            tacc = reranker_acc(state, use_target=True)
            ll = jax.tree.map(float, _last_logs["losses"])
            _qkey = "q1" if "q1" in _last_logs else ("q" if "q" in _last_logs else None)
            qm = float(_last_logs[_qkey]["mean"]) if _qkey else float("nan")
            vm = float(_last_logs["v"]["mean"]) if "v" in _last_logs else float("nan")
            loss_bits = " ".join(f"{k} {v:.3f}" for k, v in sorted(ll.items()))
            curve.append(dict(epoch=epoch, acc=acc, rerank_acc=racc,
                              target_rerank_acc=tacc, kind=f"{args.algo}_guided"))
            print(f"epoch {epoch:3d}: loss {float(loss):8.3f} "
                  f"[{loss_bits}] q~{qm:.2f} v~{vm:.2f} "
                  f"guided acc {acc:.3f}  rerank acc {racc:.3f}  "
                  f"target-rerank {tacc:.3f}  ({time.time()-t0:.0f}s)")

    result = dict(bc_acc=bc_acc, curve=curve)
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(args=vars(args), **result), f, indent=1)
    return result


if __name__ == "__main__":
    main()
