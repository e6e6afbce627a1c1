"""End-to-end: train → checkpoint → standalone evaluate CLI (the
reference's eval_*.py flow, SURVEY §4)."""
import json
import os

import pytest

from lmrl_gym_tpu.cli import evaluate as eval_cli
from lmrl_gym_tpu.cli import train as train_cli


def _train(tmp_path, algo, extra=()):
    train_cli.main(
        [
            "--task", "maze",
            "--algo", algo,
            "--model-size", "tiny",
            "--n-data", "6",
            "--epochs", "1",
            "--train-bsize", "4",
            "--no-eval",
            "--save-dir", str(tmp_path),
            "--exp-name", f"maze_{algo}",
            *extra,
        ]
    )
    return os.path.join(str(tmp_path), f"maze_{algo}")


def test_evaluate_bc_checkpoint(tmp_path):
    save_dir = _train(tmp_path, "bc")
    results = eval_cli.main(
        [
            "--task", "maze",
            "--algo", "bc",
            "--checkpoint", save_dir,
            "--n-rollouts", "2",
            "--bsize", "2",
            "--max-new-tokens", "12",
            "--out", str(tmp_path / "results.json"),
        ]
    )
    assert "rollouts" in results and "reward" in results["rollouts"]
    assert 0.0 <= results["optimal_move_accuracy"] <= 1.0
    with open(tmp_path / "results.json") as f:
        assert json.load(f)["rollouts"]["reward"]["mean"] == pytest.approx(
            results["rollouts"]["reward"]["mean"]
        )


@pytest.mark.slow
def test_evaluate_ilql_guided_and_reranker(tmp_path):
    save_dir = _train(tmp_path, "ilql")
    guided = eval_cli.main(
        [
            "--task", "maze",
            "--algo", "ilql",
            "--checkpoint", save_dir,
            "--n-rollouts", "2",
            "--bsize", "2",
            "--max-new-tokens", "12",
        ]
    )
    assert "optimal_move_accuracy" in guided
    reranked = eval_cli.main(
        [
            "--task", "maze",
            "--algo", "ilql",
            "--checkpoint", save_dir,
            "--policy", "reranker",
            "--n-rollouts", "2",
            "--bsize", "2",
        ]
    )
    # reranker always emits a legal move string → accuracy well-defined
    assert 0.0 <= reranked["optimal_move_accuracy"] <= 1.0


def test_resolve_checkpoint_dir_variants(tmp_path):
    base = tmp_path / "ck" / "base"
    base.mkdir(parents=True)
    assert eval_cli.resolve_checkpoint_dir(str(tmp_path / "ck")) == str(tmp_path / "ck")
    nested = tmp_path / "run" / "best" / "base"
    nested.mkdir(parents=True)
    assert eval_cli.resolve_checkpoint_dir(str(tmp_path / "run")).endswith("best")
    with pytest.raises(FileNotFoundError):
        eval_cli.resolve_checkpoint_dir(str(tmp_path))


def test_infer_algo_from_module_layout(tmp_path):
    """--algo defaults to layout inference so a value checkpoint cannot
    silently evaluate as plain BC (ADVICE r2)."""
    def mk(*modules):
        d = tmp_path / "_".join(modules)
        for m in modules:
            (d / m).mkdir(parents=True)
            (d / m / "params.msgpack").write_bytes(b"")
        return str(d)

    assert eval_cli.infer_algo(mk("base")) == "bc"
    assert eval_cli.infer_algo(mk("base", "q1_head", "q2_head", "v_head")) == "ilql"
    assert eval_cli.infer_algo(mk("base", "q1_head", "q2_head")) == "cql"
    assert eval_cli.infer_algo(mk("base", "q_head")) == "mc"
    assert eval_cli.infer_algo(mk("policy", "value_head")) == "ppo"


def test_evaluate_no_cell_accuracy_flag(tmp_path):
    save_dir = _train(tmp_path, "bc")
    results = eval_cli.main(
        [
            "--task", "maze",
            "--checkpoint", save_dir,  # no --algo: inferred as bc
            "--n-rollouts", "2",
            "--bsize", "2",
            "--max-new-tokens", "12",
            "--no-cell-accuracy",
        ]
    )
    assert "optimal_move_accuracy" not in results


def test_evaluate_ppo_checkpoint(tmp_path):
    """PPO checkpoints name their trunk 'policy' (not 'base'); the
    evaluate CLI must resolve, infer, and serve them."""
    train_cli.main(
        [
            "--task", "maze",
            "--algo", "ppo",
            "--model-size", "tiny",
            "--n-data", "6",
            "--epochs", "1",
            "--train-bsize", "4",
            "--online-rounds", "0",
            "--no-eval",
            "--save-dir", str(tmp_path),
            "--exp-name", "maze_ppo",
        ]
    )
    save_dir = os.path.join(str(tmp_path), "maze_ppo")
    results = eval_cli.main(
        [
            "--task", "maze",
            "--checkpoint", save_dir,  # --algo inferred as ppo
            "--n-rollouts", "2",
            "--bsize", "2",
            "--max-new-tokens", "12",
            "--no-cell-accuracy",
        ]
    )
    assert "rollouts" in results and "reward" in results["rollouts"]
