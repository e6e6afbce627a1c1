"""Chess-endgames ILQL learning gate — BASELINE config #4 ("Chess
Endgames (KQ-vs-K): FEN/SAN legality kernel + ILQL") end-to-end on the
vectorized jnp chess kernel (envs/chess/vector.py).

Round-4 redesign (VERDICT r3 item 2). The r3 online variant failed for a
diagnosed reason: rollouts came from the guided DECODE policy, whose
token-by-token composition out of a multimodal uniform-legal BC target is
mostly illegal — so +1 mate rewards were vanishingly sparse and the Q
heads never saw signal. The fix is the behavior stream, not the
algorithm: OFFLINE ILQL on kernel-generated random-LEGAL behavior over
mate-in-1 positions. A uniform-legal policy mates ~1/|legal| (~7%) of
the time, which is a dense +1 stream at B=512 (~35 mates per batch), and
every (FEN, SAN, reward) window is generated and consumed on device.
This mirrors the reference's offline chess-endgames ILQL recipe
(llm_rl_scripts/chess/ilql/train_ilql.py trains on pre-collected endgame
data; the online variant train_online_ilql.py:285-419 likewise feeds the
round loop from a dataset, not from raw policy decode).

Stages:
  1. BC on random-legal frames over RANDOM endgame positions so the
     trunk speaks the FEN/SAN protocol;
  2. offline ILQL on random-legal behavior over a TRAIN pool of
     mate-in-1 positions (engine-classified, kernel-sampled);
  3. eval on a HELD-OUT pool: reranker-as-policy (enumerate the kernel's
     legal moves, score each with sum_action(min(Q1,Q2)-V), argmax —
     the reference's ReRankerPolicy, ppo/reranker_policy.py:5-32) plus
     the beta-guided greedy decode, vs the random-legal baseline.

Run on the TPU chip:  python scripts/chess_ilql_gate.py
tests/test_learning_gate.py carries the slow-marked assertion version.
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


def first_mate_move(fen):
    """The first mating SAN for a mate-in-1 position, else None."""
    from lmrl_gym_tpu.envs.chess.engine import CHECKMATE, Board

    b = Board(fen)
    for m in b.legal_moves_san():
        c = Board(fen)
        c.push_san(m)
        if c.game_state() == CHECKMATE:
            return m
    return None


def san_to_kernel_action(san):
    """'Qd5#' → (is_king, dst) in the kernel's action encoding (KQK has
    no captures/disambiguation, so SAN is piece letter + square)."""
    s = san.rstrip("#+")
    is_king = s[0] == "K"
    file_c, rank_c = s[-2], s[-1]
    dst = (ord(rank_c) - ord("1")) * 8 + (ord(file_c) - ord("a"))
    return is_king, dst


def sample_mate_in_1_states(env, key, batch):
    """Kernel-sampled positions filtered to mate-in-1 by the native
    engine (host-side classify; the episodes themselves stay on device).
    Also returns each position's first mating move in kernel encoding
    (for the behavior curriculum)."""
    from lmrl_gym_tpu.envs.chess.vector import ChessVecState

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    cols = {k: [] for k in ("wk", "pc", "bk", "mk", "md")}
    PROBE = 512  # fixed size: one compiled reset/fen program, many draws
    while len(cols["wk"]) < batch:
        key, rk = jax.random.split(key)
        state = env.reset(rk, PROBE)
        fens = env.fen_strings(state)
        wk, pc, bk = (np.asarray(x) for x in (state.wk, state.pc, state.bk))
        for i, f in enumerate(fens):
            if len(cols["wk"]) >= batch:
                break
            san = first_mate_move(f)
            if san is not None:
                mk, md = san_to_kernel_action(san)
                cols["wk"].append(int(wk[i]))
                cols["pc"].append(int(pc[i]))
                cols["bk"].append(int(bk[i]))
                cols["mk"].append(mk)
                cols["md"].append(md)
    z = lambda: jnp.zeros((batch,), jnp.int32)
    pool = ChessVecState(
        wk=jnp.asarray(cols["wk"], jnp.int32),
        pc=jnp.asarray(cols["pc"], jnp.int32),
        bk=jnp.asarray(cols["bk"], jnp.int32),
        halfmove=z(), fullmove=z() + 1, n_steps=z(),
        done=jnp.zeros((batch,), bool),
        reward=jnp.zeros((batch,), jnp.float32),
        illegal=jnp.zeros((batch,), bool),
    )
    mate = (jnp.asarray(cols["mk"], bool), jnp.asarray(cols["md"], jnp.int32))
    return pool, mate


def pool_slice(pool, lo, hi):
    return jax.tree.map(lambda x: x[lo:hi], pool)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--train-pool", type=int, default=1024)
    p.add_argument("--eval-pool", type=int, default=256)
    p.add_argument("--bc-batches", type=int, default=1500)
    p.add_argument("--bc-bsize", type=int, default=64)
    p.add_argument("--ilql-batches", type=int, default=8000)
    p.add_argument("--ilql-bsize", type=int, default=512)
    p.add_argument("--eval-every", type=int, default=2000)
    p.add_argument(
        "--curriculum", type=float, default=0.3,
        help="fraction of behavior actions that play the engine-"
        "classified mating move (0 = pure uniform-legal)",
    )
    p.add_argument(
        "--obs", choices=["fen", "grid"], default="fen",
        help="observation rendering: 'fen' = reference protocol "
        "(spelled FEN); 'grid' = 8x8 board tokens — the FEN encoding a "
        "from-scratch small trunk can read (the reference policy reads "
        "FEN with PRETRAINED GPT-2, unobtainable here; see vector.py)",
    )
    p.add_argument(
        "--freeze-base", action="store_true",
        help="heads-only ILQL on the frozen BC trunk (see maze gate)",
    )
    p.add_argument("--beta", type=float, default=4.0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=11)
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
        ILQLBatch,
        ILQLConfig,
        init_ilql_state,
        make_ilql_train_step,
    )
    from lmrl_gym_tpu.core.optimizer import OptimizerConfig, make_optimizer
    from lmrl_gym_tpu.envs.chess.vector import ChessEndgameVectorEnv
    from lmrl_gym_tpu.loops import actor as actor_mod
    from lmrl_gym_tpu.models.config import TransformerConfig
    from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params
    from lmrl_gym_tpu.models.interface import LMCore
    from lmrl_gym_tpu.models.transformer import init_params

    key = jax.random.PRNGKey(args.seed)
    inner = ChessEndgameVectorEnv(max_steps=1, obs_mode=args.obs)
    W = inner.OBS_LEN + inner.ACT_LEN
    t0 = time.time()
    key, pk = jax.random.split(key)
    full_pool, (mate_k, mate_d) = sample_mate_in_1_states(
        inner, pk, args.train_pool + args.eval_pool
    )
    train_pool = pool_slice(full_pool, 0, args.train_pool)
    train_mate_k = mate_k[: args.train_pool]
    train_mate_d = mate_d[: args.train_pool]
    eval_pool = pool_slice(full_pool, args.train_pool, args.train_pool + args.eval_pool)
    print(f"pools: {args.train_pool} train / {args.eval_pool} HELD-OUT "
          f"mate-in-1 positions ({time.time()-t0:.0f}s)")

    config = TransformerConfig(
        vocab_size=259, hidden_size=args.hidden, num_layers=args.layers,
        num_heads=args.heads, max_position_embeddings=W,
        pad_vocab_to_multiple=64,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
    )
    core = LMCore(config)

    # ---- stage 1: BC on random-legal frames over RANDOM endgames
    params = init_params(config, jax.random.PRNGKey(0))
    bc_state = BCTrainState(
        model=TrainState.create(
            apply_fn=None, params=params,
            tx=make_optimizer(OptimizerConfig(lr=args.lr), params),
        )
    )
    bc_step = make_bc_train_step(core, BCConfig(), pad_token_id=256, mesh=None)
    mask = np.zeros((args.bc_bsize, W), bool)
    mask[:, inner.OBS_LEN:] = True
    mask = jnp.asarray(mask)
    t0 = time.time()
    for i in range(args.bc_batches):
        key, rk, ak, sk = jax.random.split(key, 4)
        st = inner.reset(rk, args.bc_bsize)
        obs = inner.obs_tokens(st)
        act = inner.random_legal_action(st, ak)
        windows = jnp.concatenate([obs, act], axis=1)
        bc_state, bc_loss, _ = bc_step(bc_state, BCBatch(windows, mask), sk)
    print(f"BC: {args.bc_batches} batches, loss {float(bc_loss):.3f} "
          f"({time.time()-t0:.0f}s)")

    # ---- stage 2: OFFLINE ILQL on random-legal behavior over train pool
    q_cfg = MLPHeadConfig(
        input_dim=config.hidden_size, hidden_dim=2 * config.hidden_size,
        output_dim=config.padded_vocab_size, layer2_initializer_range=0.0,
    )
    v_cfg = MLPHeadConfig(
        input_dim=config.hidden_size, hidden_dim=2 * config.hidden_size,
        output_dim=1, layer2_initializer_range=0.0,
    )
    q_head, v_head = MLPHead(q_cfg), MLPHead(v_cfg)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    ilql_config = ILQLConfig(
        use_separate_target_base=False, beta=args.beta,
        freeze_base=args.freeze_base,
    )
    base_tx = (
        optax.set_to_zero() if args.freeze_base else optax.adamw(args.lr * 0.3)
    )
    state = init_ilql_state(
        jax.tree.map(jnp.array, bc_state.model.params),
        init_head_params(q_head, config.hidden_size, ks[0]),
        init_head_params(q_head, config.hidden_size, ks[1]),
        init_head_params(v_head, config.hidden_size, ks[2]),
        base_tx, optax.adamw(args.lr), ilql_config,
    )
    ilql_step = make_ilql_train_step(
        core, q_head, v_head, ilql_config, pad_token_id=256
    )

    Bi = args.ilql_bsize
    n_train = args.train_pool
    sta = np.zeros((Bi, W - 1), bool)
    sta[:, inner.OBS_LEN - 1:] = True
    sta_j = jnp.asarray(sta)

    @jax.jit
    def make_behavior_batch(key):
        """One on-device batch: sample train-pool positions, play a
        uniform-legal move — or, with prob --curriculum, the engine-
        classified mating move (denser +1 signal, the VERDICT's
        'curriculum from mate-in-1-rich behavior data') — and record the
        kernel's reward on the action's last token. Single-window
        episodes, done=True (no bootstrap)."""
        ki, ka, kc, ks_ = jax.random.split(key, 4)
        idx = jax.random.randint(ki, (Bi,), 0, n_train)
        st = jax.tree.map(lambda x: x[idx], train_pool)
        obs = inner.obs_tokens(st)
        act = inner.random_legal_action(st, ka)
        if args.curriculum > 0:
            mate_act = inner.render_san(train_mate_k[idx], train_mate_d[idx])
            use_mate = jax.random.bernoulli(kc, args.curriculum, (Bi,))
            act = jnp.where(use_mate[:, None], mate_act, act)
        stepped = inner.step(st, act, ks_)
        windows = jnp.concatenate([obs, act], axis=1)
        rewards = jnp.zeros((Bi, W - 1)).at[:, W - 2].set(stepped.reward)
        return windows, rewards

    # ---- stage 3 eval helpers (used periodically during training too)
    def random_baseline(pool, n):
        key_ = jax.random.PRNGKey(99)
        k1, k2 = jax.random.split(key_)
        act = inner.random_legal_action(pool, k1)
        stepped = inner.step(pool, act, k2)
        return float((np.asarray(stepped.reward) == 1.0).mean())

    base_rate = random_baseline(eval_pool, args.eval_pool)
    print(f"random-legal baseline mate rate (held-out): {base_rate:.3f}")

    from lmrl_gym_tpu.algos.value_policy import ValueRLParams, make_ilql_score_fn

    def rerank_mate_rate(state, pool, tag):
        k_legal, p_legal = (np.asarray(x) for x in inner.agent_legal_moves(pool))
        P = k_legal.shape[0]
        rows = []  # (pos_idx, is_king, dst)
        for i in range(P):
            for d in np.flatnonzero(k_legal[i]):
                rows.append((i, True, int(d)))
            for d in np.flatnonzero(p_legal[i]):
                rows.append((i, False, int(d)))
        pos_idx = np.asarray([r[0] for r in rows])
        frames = inner.render_san(
            jnp.asarray([r[1] for r in rows]), jnp.asarray([r[2] for r in rows])
        )
        obs = np.asarray(inner.obs_tokens(pool))[pos_idx]
        ids = jnp.asarray(np.concatenate([obs, np.asarray(frames)], axis=1))
        amask = jnp.zeros(ids.shape, bool).at[:, inner.OBS_LEN:].set(True)
        bundle = ValueRLParams(
            pi_beta=None, base=state.base.params,
            q1_head=state.q1_head.params, q2_head=state.q2_head.params,
            v_head=state.v_head.params,
        )
        score_fn = make_ilql_score_fn(core, q_head, v_head, bundle, 256)
        # score in fixed-size chunks (one compile), pad last chunk
        CH = 4096
        scores = []
        for lo in range(0, ids.shape[0], CH):
            chunk = ids[lo:lo + CH]
            amch = amask[lo:lo + CH]
            n = chunk.shape[0]
            if n < CH:
                chunk = jnp.concatenate([chunk, jnp.broadcast_to(chunk[:1], (CH - n, chunk.shape[1]))])
                amch = jnp.concatenate([amch, jnp.broadcast_to(amch[:1], (CH - n, amch.shape[1]))])
            scores.append(np.asarray(score_fn(chunk, amch))[:n])
        scores = np.concatenate(scores)
        picks = []
        for i in range(P):
            rows_i = np.flatnonzero(pos_idx == i)
            picks.append(rows[rows_i[np.argmax(scores[rows_i])]])
        act = inner.render_san(
            jnp.asarray([p[1] for p in picks]), jnp.asarray([p[2] for p in picks])
        )
        stepped = inner.step(pool, act, jax.random.PRNGKey(0))
        rate = float((np.asarray(stepped.reward) == 1.0).mean())
        print(f"{tag}: reranker mate rate {rate:.3f} over {P} positions "
              f"({len(rows)} candidate moves)")
        return rate

    # ---- training loop with periodic held-out reranker eval
    t0 = time.time()
    curve = []
    for i in range(args.ilql_batches):
        key, bk_, sk = jax.random.split(key, 3)
        windows, rewards = make_behavior_batch(bk_)
        batch = ILQLBatch(
            input_ids=windows,
            should_take_action=sta_j,
            rewards=rewards,
            dones=jnp.ones((Bi,), bool),
            next_token_ids=None,
            next_dones=None,
        )
        state, loss, _ = ilql_step(state, batch, sk)
        if (i + 1) % args.eval_every == 0:
            r = rerank_mate_rate(
                state, eval_pool, f"[batch {i+1}] held-out"
            )
            curve.append(dict(batch=i + 1, rerank=r, loss=float(loss)))
    print(f"ILQL: {args.ilql_batches} offline batches, loss "
          f"{float(loss):.3f} ({time.time()-t0:.0f}s)")

    rerank_rate = rerank_mate_rate(state, eval_pool, "ILQL values (held-out)")
    rerank_rate_train = rerank_mate_rate(
        state, pool_slice(train_pool, 0, args.eval_pool), "ILQL values (train)"
    )

    # guided greedy decode on the held-out pool
    vg_step, vg_carry = actor_mod.make_value_guided_step_fn(
        core, q_head, batch=args.eval_pool, two_trunks=True, twin_q=True,
        beta=args.beta, total_len=W,
    )
    guided_params = {
        "pi_beta": bc_state.model.params,
        "base": state.base.params,
        "q1": state.q1_head.params,
        "q2": state.q2_head.params,
    }
    out, _ = actor_mod.rollout_markov(
        inner, 1, vg_step, guided_params, vg_carry, eval_pool,
        jax.random.PRNGKey(0), 1.0, True,
    )
    guided_rate = float((out.turn_reward[:, 0] == 1.0).mean())
    guided_ill = float((out.turn_reward[:, 0] == -1.0).mean())
    print(f"ILQL guided greedy (held-out): mate {guided_rate:.3f} "
          f"illegal {guided_ill:.3f}")

    # ---- legality-MASKED guided decode (VERDICT r4 item 4a): constrain
    # each decode step to the kernel's legal SAN set for the position
    # (models/generation.py::generate_constrained). The guided policy
    # π_β + β·min(Q1,Q2) still chooses — but only among legal
    # continuations, so illegal-move composition is structurally
    # impossible. This is the serving mode the reference gets for free
    # from pretrained GPT-2's SAN fluency.
    from lmrl_gym_tpu.models.generation import SamplingConfig, generate_constrained

    def guided_legal_rate_fn(state, pool, tag):
        B = int(pool.wk.shape[0])
        k_legal, p_legal = (np.asarray(x) for x in inner.agent_legal_moves(pool))
        rows_k, rows_d, rows_pos = [], [], []
        for i in range(B):
            for d in np.flatnonzero(k_legal[i]):
                rows_k.append(True), rows_d.append(int(d)), rows_pos.append(i)
            for d in np.flatnonzero(p_legal[i]):
                rows_k.append(False), rows_d.append(int(d)), rows_pos.append(i)
        frames = np.asarray(
            inner.render_san(jnp.asarray(rows_k), jnp.asarray(rows_d))
        )
        counts = np.bincount(rows_pos, minlength=B)
        P = int(counts.max())
        cands = np.full((B, P, inner.ACT_LEN), 256, np.int32)
        cmask = np.zeros((B, P), bool)
        slot = np.zeros(B, np.int32)
        for r, i in enumerate(rows_pos):
            cands[i, slot[i]] = frames[r]
            cmask[i, slot[i]] = True
            slot[i] += 1

        params = {
            "pi_beta": bc_state.model.params,
            "base": state.base.params,
            "q1": state.q1_head.params,
            "q2": state.q2_head.params,
        }
        step_fn, carry0 = actor_mod.make_value_guided_step_fn(
            core, q_head, batch=B, two_trunks=True, twin_q=True,
            beta=args.beta, total_len=W,
        )

        def logits_fn(toks, attn_mask, carry):
            return step_fn(params, toks, carry)

        obs = inner.obs_tokens(pool)
        sampling = SamplingConfig(
            max_new_tokens=inner.ACT_LEN, greedy=True,
            eos_token_id=10, pad_token_id=256,
        )
        toks, _tm = generate_constrained(
            logits_fn, carry0, obs, jnp.ones(obs.shape, jnp.int32),
            jax.random.PRNGKey(0), sampling,
            jnp.asarray(cands), jnp.asarray(cmask),
        )
        toks = np.asarray(toks)
        # parse the emitted frame (piece@0, file@2, rank@4 — render_san
        # layout) back into the kernel action encoding
        is_king = toks[:, 0] == ord("K")
        dst = (toks[:, 4] - ord("1")) * 8 + (toks[:, 2] - ord("a"))
        act = inner.render_san(jnp.asarray(is_king), jnp.asarray(np.clip(dst, 0, 63)))
        stepped = inner.step(pool, act, jax.random.PRNGKey(0))
        rate = float((np.asarray(stepped.reward) == 1.0).mean())
        ill = float((np.asarray(stepped.reward) == -1.0).mean())
        print(f"{tag}: legality-masked guided greedy mate {rate:.3f} "
              f"illegal {ill:.3f} (P_max={P})")
        return rate, ill

    guided_legal_rate, guided_legal_ill = guided_legal_rate_fn(
        state, eval_pool, "ILQL guided+legal (held-out)"
    )

    result = dict(
        random_rate=base_rate,
        rerank_rate=rerank_rate,
        rerank_rate_train=rerank_rate_train,
        guided_rate=guided_rate,
        guided_illegal=guided_ill,
        guided_legal_rate=guided_legal_rate,
        guided_legal_illegal=guided_legal_ill,
        curve=curve,
    )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(args=vars(args), **result), f, indent=1)
    return result


if __name__ == "__main__":
    main()
