"""Learning-quality gate (round-1 VERDICT weak #7 / next-round item 7).

BASELINE.md row 3 requires training to actually learn. This test BC-trains
a tiny model on BFS-optimal maze demonstrations and asserts the
reference's headline maze metric — per-cell optimal-move accuracy vs the
BFS table (maze/env/maze_utils.py:63-89) — strictly improves from init
and clears a threshold. If the training path stops learning, this fails.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.training.train_state import TrainState

from lmrl_gym_tpu.algos import data as algo_data
from lmrl_gym_tpu.algos.bc import BCBatch, BCConfig, BCTrainState, make_bc_train_step
from lmrl_gym_tpu.algos.value_policy import LMServer
from lmrl_gym_tpu.cli.tasks import generate_maze_chains
from lmrl_gym_tpu.core.blocking import BlockingStrategy, Padding, Truncation
from lmrl_gym_tpu.core.optimizer import OptimizerConfig, make_optimizer
from lmrl_gym_tpu.envs.maze.eval import per_cell_optimal_move_accuracy
from lmrl_gym_tpu.envs.maze.grids import double_t_maze
from lmrl_gym_tpu.models.config import tiny_test_config
from lmrl_gym_tpu.models.generation import SamplingConfig
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import init_params
from lmrl_gym_tpu.text.frames import Text, TokenTrajectoryChain
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer

MAX_LEN = 160
GOAL = (8, 6)


def _policy_act(server, params, tokenizer, sampling):
    def act(histories):
        prompts = ["".join(t.text for t in h) for h in histories]
        outs = server.generate_from_strs(
            params, prompts, MAX_LEN, sampling, jax.random.PRNGKey(0)
        )
        return [h + (Text(o, True),) for h, o in zip(histories, outs)]

    return act


def test_bc_learning_smoke_default_suite():
    """Default-suite e2e learning smoke (round-3 VERDICT item 10): a d64
    L1 maze BC run whose loss must drop by >2x in under a minute, so the
    default (non-slow) run exercises at least one real training path —
    data generation -> tokenization -> blocking -> train step — end to
    end and would catch a learning regression."""
    tokenizer = ByteTokenizer()
    config = tiny_test_config(
        hidden_size=64, num_layers=1, num_heads=2, max_position_embeddings=256
    )
    core = LMCore(config)
    chains = generate_maze_chains(24, seed=3, p_optimal=1.0)
    token_chains = [
        TokenTrajectoryChain.from_text_trajectory_chain(c, tokenizer) for c in chains
    ]
    windows = []
    for c in token_chains:
        windows.extend(c.to_list())
    examples = [
        algo_data.BCExample.from_segments(tt.tokens, tt.is_action) for tt in windows
    ]
    strategy = BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, MAX_LEN)
    dataset = algo_data.ArrayDataset(
        algo_data.block_bc_examples(examples, strategy, tokenizer.pad_token_id)
    )
    params = init_params(config, jax.random.PRNGKey(0))
    state = BCTrainState(
        model=TrainState.create(
            apply_fn=None,
            params=params,
            tx=make_optimizer(OptimizerConfig(lr=3e-3), params),
        )
    )
    step = make_bc_train_step(core, BCConfig(), tokenizer.pad_token_id, None)
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    losses = []
    for _epoch in range(2):
        for b in dataset.batches(32, rng=rng, drop_last=False):
            key, sk = jax.random.split(key)
            state, loss, _ = step(
                state,
                BCBatch(jnp.asarray(b["input_ids"]), jnp.asarray(b["training_mask"])),
                sk,
            )
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (
        f"BC loss did not learn: first={losses[0]:.3f} last={losses[-1]:.3f}"
    )


@pytest.mark.slow
def test_bc_training_learns_maze():
    tokenizer = ByteTokenizer()
    config = tiny_test_config(
        hidden_size=128, num_layers=2, num_heads=4, max_position_embeddings=256
    )
    core = LMCore(config)

    # expert data: BFS-optimal moves from every start cell
    chains = generate_maze_chains(120, seed=3, p_optimal=1.0)
    token_chains = [
        TokenTrajectoryChain.from_text_trajectory_chain(c, tokenizer) for c in chains
    ]
    windows = []
    for c in token_chains:
        windows.extend(c.to_list())
    examples = [
        algo_data.BCExample.from_segments(tt.tokens, tt.is_action) for tt in windows
    ]
    strategy = BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, MAX_LEN)
    dataset = algo_data.ArrayDataset(
        algo_data.block_bc_examples(examples, strategy, tokenizer.pad_token_id)
    )

    params = init_params(config, jax.random.PRNGKey(0))
    state = BCTrainState(
        model=TrainState.create(
            apply_fn=None,
            params=params,
            tx=make_optimizer(OptimizerConfig(lr=1e-3), params),
        )
    )
    step = make_bc_train_step(core, BCConfig(), tokenizer.pad_token_id, None)

    server = LMServer(core, tokenizer)
    sampling = SamplingConfig(
        max_new_tokens=12,
        greedy=True,
        eos_token_id=10,
        pad_token_id=tokenizer.pad_token_id,
    )
    maze = double_t_maze()

    acc_init, _ = per_cell_optimal_move_accuracy(
        _policy_act(server, state.model.params, tokenizer, sampling), maze, GOAL
    )

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    losses = []
    for _epoch in range(3):
        for b in dataset.batches(32, rng=rng, drop_last=False):
            key, sk = jax.random.split(key)
            state, loss, _ = step(
                state,
                BCBatch(jnp.asarray(b["input_ids"]), jnp.asarray(b["training_mask"])),
                sk,
            )
            losses.append(float(loss))

    acc_trained, per_cell = per_cell_optimal_move_accuracy(
        _policy_act(server, state.model.params, tokenizer, sampling), maze, GOAL
    )

    assert losses[-1] < losses[0], "BC loss did not decrease"
    assert acc_trained > acc_init + 0.2, (
        f"no learning: init={acc_init:.3f} trained={acc_trained:.3f}"
    )
    assert acc_trained >= 0.5, (
        f"per-cell optimal-move accuracy too low: {acc_trained:.3f}\n"
        + "\n".join(f"{c}: {v}" for c, v in sorted(per_cell.items()))
    )


@pytest.mark.slow
def test_ilql_values_rank_optimal_actions():
    """Value-based gate: train ILQL (from a BC-pretrained base, the
    reference's pipeline) on mixed-quality demonstrations and check the
    learned values directly with the reference's maze reranker eval —
    score the 4-move proposal set with sum(min(Q1,Q2) - V) per cell
    (ilql/gpt2/score_fn.py:11-68) and argmax. Untrained (zero-init) heads
    tie every proposal, so their accuracy is the first-proposal baseline;
    trained values must rank the BFS-optimal move far above that.

    (A decode-based gate was tried and dropped: greedy BC decoding
    already denoises a uniform action mixture to ~0.88 accuracy, leaving
    no headroom to attribute to the values.)"""
    import optax
    from lmrl_gym_tpu.algos.ilql import (
        ILQLBatch,
        ILQLConfig,
        init_ilql_state,
        make_ilql_train_step,
    )
    from lmrl_gym_tpu.algos.value_policy import (
        ReRankerPolicy,
        ValueRLParams,
        make_ilql_score_fn,
        tokenize_histories_for_scoring,
    )
    from lmrl_gym_tpu.envs.maze.grids import ACTION_STRS
    from lmrl_gym_tpu.models.heads import MLPHead, MLPHeadConfig, init_head_params

    tokenizer = ByteTokenizer()
    config = tiny_test_config(
        hidden_size=128, num_layers=2, num_heads=4, max_position_embeddings=256
    )
    core = LMCore(config)
    maze = double_t_maze()
    strategy = BlockingStrategy(Padding.RIGHT, Truncation.RIGHT, MAX_LEN)

    chains = generate_maze_chains(150, seed=5, p_optimal=0.5)
    token_chains = [
        TokenTrajectoryChain.from_text_trajectory_chain(c, tokenizer) for c in chains
    ]

    # stage 1: BC pretrain so the trunk speaks the action protocol
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
            apply_fn=None,
            params=params,
            tx=make_optimizer(OptimizerConfig(lr=1e-3), params),
        )
    )
    bc_step = make_bc_train_step(core, BCConfig(), tokenizer.pad_token_id, None)
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    for _epoch in range(2):
        for b in bc_dataset.batches(32, rng=rng, drop_last=False):
            key, sk = jax.random.split(key)
            bc_state, _, _ = bc_step(
                bc_state,
                BCBatch(jnp.asarray(b["input_ids"]), jnp.asarray(b["training_mask"])),
                sk,
            )
    bc_params = bc_state.model.params

    # stage 2: ILQL on the mixed-reward chains (base copied: the donated
    # train step consumes its input buffers)
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
        input_dim=config.hidden_size,
        hidden_dim=2 * config.hidden_size,
        output_dim=config.padded_vocab_size,
        layer2_initializer_range=0.0,
    )
    v_cfg = MLPHeadConfig(
        input_dim=config.hidden_size,
        hidden_dim=2 * config.hidden_size,
        output_dim=1,
        layer2_initializer_range=0.0,
    )
    q_head, v_head = MLPHead(q_cfg), MLPHead(v_cfg)
    untrained_q1 = init_head_params(q_head, config.hidden_size, ks[0])
    untrained_q2 = init_head_params(q_head, config.hidden_size, ks[1])
    untrained_v = init_head_params(v_head, config.hidden_size, ks[2])
    ilql_config = ILQLConfig(gamma=0.99, tau=0.7, cql_weight=0.01)
    state = init_ilql_state(
        jax.tree.map(jnp.copy, bc_params),
        jax.tree.map(jnp.copy, untrained_q1),
        jax.tree.map(jnp.copy, untrained_q2),
        jax.tree.map(jnp.copy, untrained_v),
        optax.adam(3e-4),
        optax.adam(3e-3),
        ilql_config,
    )
    step = make_ilql_train_step(
        core, q_head, v_head, ilql_config, tokenizer.pad_token_id, None
    )
    for _epoch in range(6):
        for b in dataset.batches(32, rng=rng, drop_last=False):
            key, sk = jax.random.split(key)
            batch = ILQLBatch(
                input_ids=jnp.asarray(b["input_ids"]),
                should_take_action=jnp.asarray(b["should_take_action"]),
                rewards=jnp.asarray(b["rewards"]),
                dones=jnp.asarray(b["dones"]),
                next_token_ids=None if b.get("next_token_ids") is None
                else jnp.asarray(b["next_token_ids"]),
                next_dones=None if b.get("next_dones") is None
                else jnp.asarray(b["next_dones"]),
            )
            state, _, _ = step(state, batch, sk)

    def reranker_accuracy(base_p, q1_p, q2_p, v_p):
        bundle = ValueRLParams(
            pi_beta=None, base=base_p, q1_head=q1_p, q2_head=q2_p, v_head=v_p
        )
        score = make_ilql_score_fn(
            core, q_head, v_head, bundle, tokenizer.pad_token_id
        )

        def proposal_fn(history):
            return [history + (Text(a, True),) for a in ACTION_STRS]

        def score_batch(histories):
            ids, am = tokenize_histories_for_scoring(histories, tokenizer, MAX_LEN)
            return np.asarray(score(ids, am))

        policy = ReRankerPolicy(proposal_fn=proposal_fn, score_batch=score_batch)
        acc, _ = per_cell_optimal_move_accuracy(
            lambda hs: policy.act(hs), maze, GOAL
        )
        return acc

    acc_untrained = reranker_accuracy(
        bc_params, untrained_q1, untrained_q2, untrained_v
    )
    acc_trained = reranker_accuracy(
        state.base.params,
        state.q1_head.params,
        state.q2_head.params,
        state.v_head.params,
    )
    print(f"reranker acc: untrained={acc_untrained:.3f} trained={acc_trained:.3f}")
    assert acc_trained > acc_untrained + 0.2, (
        f"values did not learn: untrained={acc_untrained:.3f} "
        f"trained={acc_trained:.3f}"
    )
    # measured 0.48 at this tiny scale (0.32 at 3 epochs/1e-3 head lr —
    # monotone in training); the primary gate is the +0.2 delta above
    assert acc_trained >= 0.4, f"value ranking too weak: {acc_trained:.3f}"


@pytest.mark.slow
def test_ilql_reference_scale_gate():
    """VERDICT r2 item 2: the reference-scale ILQL gate. Behavior data
    puts most of its mass on a FIXED WRONG action per cell, so BC's mode
    is systematically wrong (greedy accuracy ~0.0-0.1) and only value
    learning can recover optimality. The β-guided decode policy must then
    clear a high-water per-cell optimal-move accuracy — the reference's
    headline maze evaluator (maze/env/maze_utils.py:63-89).

    On the TPU chip the full-scale config reaches 1.000 by epoch 2
    (d256 L4, 400 chains — curve in PERF_NOTES.md, reproduce with
    `python scripts/maze_ilql_gate.py`); this CPU-sized CI config is
    smaller and gates at 0.7+ with a required +0.5 jump over BC."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from maze_ilql_gate import main as gate_main

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        argv = ["--n-chains", "400", "--hidden", "256", "--layers", "4",
                "--bc-epochs", "4", "--ilql-epochs", "4", "--eval-every", "4"]
        threshold, jump = 0.8, 0.6
    else:
        argv = ["--n-chains", "200", "--hidden", "128", "--layers", "2",
                "--bc-epochs", "3", "--ilql-epochs", "4", "--eval-every", "4"]
        threshold, jump = 0.7, 0.5
    result = gate_main(argv)
    final_acc = result["curve"][-1]["acc"]
    assert result["bc_acc"] <= 0.3, (
        f"behavior data not adversarial enough: bc_acc={result['bc_acc']}"
    )
    assert final_acc >= threshold, (
        f"ILQL guided decode accuracy {final_acc} below {threshold} "
        f"(curve: {result['curve']})"
    )
    assert final_acc - result["bc_acc"] >= jump


@pytest.mark.slow
def test_ppo_learning_gate():
    """VERDICT r2 item 3: PPO must BEAT the frozen-BC return by a margin
    under a fixed eval seed set, with a sane KL trace (finite, and ~0 at
    the round-0 refresh where policy == π₀). Full-scale curve recorded in
    PERF_NOTES.md (`python scripts/maze_ppo_gate.py`)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from maze_ppo_gate import main as gate_main

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # measured +7.8 on the chip (PERF_NOTES.md round-3 PPO table)
        argv = ["--ppo-lr", "1e-5", "--epochs-per-round", "1",
                "--rounds", "12", "--rollouts-per-round", "64",
                "--eval-rollouts", "96", "--value-warmup-rounds", "2"]
        margin = 2.0
    else:
        # CPU-sized: too few updates to require improvement; gate on
        # no-degradation + KL sanity (the TPU config carries the margin)
        argv = ["--ppo-lr", "1e-5", "--epochs-per-round", "1",
                "--rounds", "3", "--rollouts-per-round", "16",
                "--eval-rollouts", "24", "--hidden", "128", "--layers", "2",
                "--value-warmup-rounds", "1"]
        margin = -3.0
    result = gate_main(argv)
    assert result["ppo_return"] > result["bc_return"] + margin, result
    kls = [r["mean_kl"] for r in result["kl_trace"]]
    assert all(np.isfinite(k) for k in kls)
    assert abs(kls[0]) < 1e-3  # round 0 refresh: policy == π₀


@pytest.mark.slow
def test_mc_returns_maze_gate():
    """VERDICT r4 item 6: MC-returns must demonstrate learning on the
    maze with the same adversarial harness as the ILQL gate — single Q
    head regressing reward-to-go, guided decode constrained to the legal
    action set (mc_returns/train_mc.py:38, score_fn.py:10-60). Recorded
    full-scale run (GATE_MAZE_MC_r05.json, d256 L4 on the chip, lr
    warmdown): guided-legal accuracy 0.80-0.84 held to the END of
    training vs BC 0.0."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from maze_ilql_gate import main as gate_main

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        argv = ["--algo", "mc", "--guided-legal", "--lr-warmdown"]
        threshold, jump = 0.8, 0.6
    else:
        argv = ["--algo", "mc", "--guided-legal", "--lr-warmdown",
                "--n-chains", "150", "--hidden", "128", "--layers", "2",
                "--bc-epochs", "2", "--ilql-epochs", "6", "--eval-every", "6"]
        threshold, jump = 0.35, 0.3
    result = gate_main(argv)
    final_acc = result["curve"][-1]["acc"]
    assert result["bc_acc"] <= 0.3, result["bc_acc"]
    assert final_acc >= threshold, (
        f"MC guided-legal accuracy {final_acc} below {threshold} "
        f"(curve: {result['curve']})"
    )
    assert final_acc - result["bc_acc"] >= jump


@pytest.mark.slow
def test_cql_maze_gate():
    """CQL (twin-Q SARSA + CQL regularizer, ILQL minus V —
    cql/base_interface.py:29-120) rides the same harness; gate on the
    learned values beating BC through the legal-constrained guided
    decode. Full-scale artifact: GATE_MAZE_CQL_r05.json."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from maze_ilql_gate import main as gate_main

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        argv = ["--algo", "cql", "--guided-legal", "--lr-warmdown"]
        threshold, jump = 0.7, 0.5
    else:
        argv = ["--algo", "cql", "--guided-legal", "--lr-warmdown",
                "--n-chains", "150", "--hidden", "128", "--layers", "2",
                "--bc-epochs", "2", "--ilql-epochs", "6", "--eval-every", "6"]
        threshold, jump = 0.3, 0.25
    result = gate_main(argv)
    final_acc = result["curve"][-1]["acc"]
    assert result["bc_acc"] <= 0.3, result["bc_acc"]
    assert final_acc >= threshold, (
        f"CQL guided-legal accuracy {final_acc} below {threshold} "
        f"(curve: {result['curve']})"
    )
    assert final_acc - result["bc_acc"] >= jump


@pytest.mark.slow
def test_text_nav_ppo_gate():
    """VERDICT r4 item 5: the Text-Nav PPO gate under test. Full-scale
    recorded run (GATE_TEXTNAV_PPO_r04.json, chip): sampled return
    0.219 -> 0.750 after 5 PPO rounds. The CPU-budget variant asserts
    pipeline health: PPO does not collapse the BC policy and the KL
    trace stays finite (the same contract test_ppo_learning_gate applies
    to the maze PPO gate)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from text_nav_ppo_gate import main as gate_main

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        argv = ["--ppo-lr", "1e-4", "--kl-weight", "0.05",
                "--epochs-per-round", "1", "--rounds", "5",
                "--value-warmup-rounds", "2"]
        margin = 0.1  # PPO must actually beat BC on the chip
    else:
        argv = ["--n-episodes", "80", "--hidden", "96", "--layers", "2",
                "--heads", "2", "--bc-epochs", "2", "--rounds", "2",
                "--epochs-per-round", "1", "--rollouts-per-round", "8",
                "--eval-rollouts", "16", "--value-warmup-rounds", "1",
                "--ppo-lr", "1e-4", "--kl-weight", "0.05",
                "--bpe-vocab", "512"]
        margin = -0.25  # no-collapse contract at CPU budget
    result = gate_main(argv)
    assert result["ppo_return"] >= result["bc_return"] + margin, result
    kls = [r["mean_kl"] for r in result["kl_trace"]]
    assert all(np.isfinite(k) for k in kls), kls


@pytest.mark.slow
def test_twenty_questions_gate_pipeline():
    """VERDICT r4 item 5: the 20Q oracle-in-the-loop gate under test.
    Health contract: the in-repo LM oracle must track the scripted
    labeler well above the 0.5 majority-class floor, its yes-rate must
    not collapse to a constant answer, and the BC policies must produce
    finite in-range returns through it. (The r4 full-scale run measured
    fidelity 0.82; filtered-BC ~ BC is the recorded honest negative —
    the RL gate on this task is scripts/dialog_ilql_gate.py.)"""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from twenty_questions_gate import main as gate_main

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        argv = []
        fidelity_floor = 0.7
    else:
        argv = ["--oracle-episodes", "40", "--oracle-epochs", "4",
                "--behavior-episodes", "48", "--hidden", "96",
                "--layers", "2", "--heads", "2", "--bc-epochs", "6",
                "--eval-rollouts", "8", "--eval-bsize", "4",
                "--bpe-vocab", "512"]
        fidelity_floor = 0.55
    result = gate_main(argv)
    assert result["oracle_fidelity"] >= fidelity_floor, result
    assert 0.15 <= result["oracle_yes_rate"] <= 0.85, result
    for k in ("bc_reward", "filtered_bc_reward"):
        assert np.isfinite(result[k]) and -20.0 <= result[k] <= 0.0, result


@pytest.mark.slow
def test_wordle_ilql_gate():
    """BASELINE config #2 (VERDICT r4 item 2): ILQL on the vectorized
    Wordle env. Full-scale chip run recorded in GATE_WORDLE_ILQL_r05.json;
    gate = ILQL guided return beats %BC on fixed-seed on-device rollouts.
    The CPU-budget variant asserts the pipeline end-to-end with a
    no-degradation contract (too few updates to demand learning)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from wordle_ilql_gate import main as gate_main

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        argv = []
        margin = 0.05  # ILQL must beat %BC on the chip
    else:
        argv = ["--bc-steps", "30", "--pbc-steps", "30", "--ilql-steps", "20",
                "--bsize", "16", "--hidden", "96", "--layers", "2",
                "--heads", "2", "--eval-every", "10", "--eval-batch", "32",
                "--optimal-episodes", "0"]
        margin = -1.5
    result = gate_main(argv)
    assert result["ilql_return"] >= result["pbc_return"] + margin, result
    for k in ("bc_return", "pbc_return", "ilql_return"):
        assert np.isfinite(result[k]) and -6.0 <= result[k] <= 0.0, result


@pytest.mark.slow
def test_dialog_ilql_gate():
    """20Q dialog-ILQL pipeline health (the full-scale chip run is the
    honest NEGATIVE recorded in GATE_20Q_ILQL_r05.json: 20Q wins are
    luck-dominated and the in-repo LM oracle caps the eval — the dialog
    RL WIN lives on Car-Dealer, test_car_dealer_ilql_gate below). This
    variant runs the scripted-oracle env only and asserts the rerank
    serving does not degrade BC beyond noise and produces in-range
    returns."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from dialog_ilql_gate import main as gate_main

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        argv = ["--skip-lm-oracle"]
        margin = -1.5  # pipeline health: rerank within noise of BC
    else:
        argv = ["--behavior-episodes", "48", "--hidden", "96",
                "--layers", "2", "--heads", "2", "--bc-epochs", "6",
                "--ilql-epochs", "3", "--bsize", "8",
                "--eval-rollouts", "8", "--eval-bsize", "4",
                "--rerank-k", "4", "--bpe-vocab", "512",
                "--skip-lm-oracle"]
        margin = -2.5
    result = gate_main(argv)
    assert result["ilql_rerank_reward"] >= result["bc_reward"] + margin, result
    for k in ("bc_reward", "ilql_rerank_reward", "ilql_guided_reward"):
        assert np.isfinite(result[k]) and -20.0 <= result[k] <= 0.0, result


@pytest.mark.slow
def test_car_dealer_ilql_gate():
    """The round-4 VERDICT's top item under test: RL beats BC on a dialog
    task (Car-Dealer, the VERDICT's named continuous-reward fallback).
    Full-scale chip run recorded in GATE_CAR_DEALER_ILQL_r05.json: BC
    greedy 0.664 → ILQL sample-rerank 0.760 / MC sample-rerank 0.808 in
    the scripted-buyer env, and BC 0.645 → MC rerank 0.799 through the
    trained LM buyer (fidelity 0.89 on the budget×price grid). On TPU
    this test reruns the full recipe and asserts the win; the CPU-budget
    variant asserts the pipeline end-to-end with a no-degradation
    contract (too few updates to demand learning)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from car_dealer_ilql_gate import main as gate_main

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        argv = []
        margin = 0.05  # best RL serving must beat BC greedy on the chip
    else:
        argv = ["--behavior-episodes", "48", "--hidden", "96",
                "--layers", "2", "--heads", "2", "--bc-epochs", "6",
                "--ilql-epochs", "4", "--mc-epochs", "4", "--bsize", "8",
                "--eval-rollouts", "8", "--eval-bsize", "4",
                "--rerank-k", "4", "--bpe-vocab", "512",
                "--skip-lm-buyer"]
        margin = -0.15
    result = gate_main(argv)
    best_rl = max(result["ilql_rerank_reward"], result["mc_rerank_reward"])
    # the rerank serving selects among BC SAMPLES, so at CPU scale (where
    # an undertrained BC samples garbage while its greedy mode survives)
    # the no-degradation contract is vs the sampled baseline; the chip
    # run demands a win over BC greedy
    baseline = (
        result["bc_reward"] if on_tpu
        else result["all_evals"]["bc_sampled_scripted"]
    )
    assert best_rl >= baseline + margin, result
    for k in ("bc_reward", "ilql_rerank_reward", "mc_rerank_reward",
              "ilql_guided_reward"):
        assert np.isfinite(result[k]) and 0.0 <= result[k] <= 1.2, result


@pytest.mark.slow
def test_chess_mate_in_1_gate():
    """BASELINE config #4 gate (round-3 VERDICT item 2): ILQL on the jnp
    chess-endgame kernel must rank mating moves on HELD-OUT mate-in-1
    positions far above the random-legal baseline. Full-scale recorded
    run (GATE_CHESS_MATE_r04.json, d256 L4 grid obs, 12k batches on the
    chip): held-out reranker mate rate 0.82 vs 0.074 random. This test
    runs a budget-scaled variant; thresholds tighten on TPU where the
    full-size run fits.
    """
    import sys as _sys

    _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent / "scripts"))
    from chess_ilql_gate import main as chess_gate_main

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        args = [
            "--train-pool", "512", "--eval-pool", "128",
            "--bc-batches", "800", "--ilql-batches", "6000",
            "--eval-every", "6000", "--obs", "grid",
        ]
    else:
        args = [
            "--train-pool", "96", "--eval-pool", "32",
            "--hidden", "128", "--layers", "2", "--heads", "4",
            "--bc-batches", "150", "--bc-bsize", "32",
            "--ilql-batches", "400", "--ilql-bsize", "128",
            "--eval-every", "400", "--obs", "grid",
        ]
    result = chess_gate_main(args)
    assert np.isfinite(result["rerank_rate"])
    if on_tpu:
        assert result["rerank_rate"] >= 0.5, result
        assert result["rerank_rate"] >= result["random_rate"] * 3, result
    else:
        # CPU-budget variant: the values must still beat random held-out
        assert result["rerank_rate"] >= result["random_rate"], result


@pytest.mark.slow
def test_gpt2_small_maze_gate():
    """VERDICT r4 item 3: the GPT-2-small maze ILQL configuration under
    test (TPU-gated — the d768 L12 vocab-50,257 model does not fit a CPU
    budget). The r5 recipe replaces the r4 post-hoc early stop with a
    FIXED 2-epoch horizon: head lr cosine-annealed to zero over exactly
    the run, evals through the polyak-EMA target heads (the EMA holds the
    early good ranking; the 12-epoch warmdown curve that still collapses
    is recorded as GATE_GPT2SMALL_MAZE_r05_warmdown12_negative.json).
    Seeds 5/7/9 artifacts: GATE_GPT2SMALL_MAZE_r05_seed*.json."""
    if jax.default_backend() != "tpu":
        pytest.skip("GPT-2-small gate needs the TPU chip")
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from maze_ilql_gate import main as gate_main

    result = gate_main([
        "--gpt2-small", "--n-chains", "800", "--grad-accum", "4",
        "--value-bias-init", "-15", "--freeze-base", "--lr-warmdown",
        "--guided-legal", "--eval-heads", "target",
        "--ilql-epochs", "2", "--eval-every", "1", "--seed", "5",
    ])
    final = [r for r in result["curve"] if r.get("kind") != "bc"][-1]
    assert final["target_rerank_acc"] >= 0.8, result
    assert result["bc_acc"] <= 0.2, result  # adversarial data: BC must fail
