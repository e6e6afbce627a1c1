"""API-baseline policy (the reference's gpt4 eval role) with a fake
transport — no network, same machinery."""
import json
import re

import pytest

from lmrl_gym_tpu.envs.api_policy import (
    APIChatPolicy,
    extract_json_action,
    openai_chat_transport,
    render_history,
)
from lmrl_gym_tpu.text.frames import Text


def test_extract_json_action():
    assert extract_json_action('{"action": "move up"}') == "move up"
    assert extract_json_action('Sure!\n```{"action": "move left"}```') == "move left"
    assert extract_json_action("plain text answer") == "plain text answer"
    with pytest.raises(ValueError):
        extract_json_action("no json here", fallback_to_reply=False)


def test_render_history_roles():
    h = (Text("obs\n", False), Text("act\n", True))
    out = render_history(h)
    assert out.splitlines() == ["environment: obs", "action: act"]
    assert "\n\n" not in out


def test_api_policy_act_appends_action():
    seen = {}

    def transport(messages):
        seen["messages"] = messages
        return json.dumps({"action": "move right"})

    policy = APIChatPolicy(transport, instructions="INSTR")
    out = policy.act((Text("the maze\n", False),))
    assert out[-1] == Text("move right\n", True)
    assert seen["messages"][0]["role"] == "system"
    assert seen["messages"][1]["content"].startswith("INSTR")
    assert "the maze" in seen["messages"][1]["content"]


def test_transport_requires_key(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    t = openai_chat_transport()
    with pytest.raises(RuntimeError, match="API key"):
        t([{"role": "user", "content": "hi"}])


def test_api_policy_plays_maze_end_to_end():
    """Scripted 'API' that always answers with the BFS-optimal move —
    the rollout must reach the goal through text_env_eval."""
    import numpy as np

    from lmrl_gym_tpu.envs.base import text_env_eval
    from lmrl_gym_tpu.envs.maze.env import MazeEnv
    from lmrl_gym_tpu.envs.maze.grids import (
        DOUBLE_T_GOAL,
        double_t_maze,
        maze_solver,
    )

    maze = double_t_maze()
    table = maze_solver(maze, DOUBLE_T_GOAL)

    def transport(messages):
        # the env spells coordinates digit-by-digit: "position is at
        # position 8, 6." — grab the last "current position" sentence
        content = messages[1]["content"]
        m = re.search(
            r"current position is at position ([\d ]+), ([\d ]+)\.",
            content.splitlines()[-1],
        )
        assert m, content
        pos = tuple(int(g.replace(" ", "")) for g in m.groups())
        return json.dumps({"action": table[pos].strip()})

    env = MazeEnv(maze, np.array([DOUBLE_T_GOAL]), max_steps=50)
    policy = APIChatPolicy(transport)
    _, summary = text_env_eval(
        env, policy, n_rollouts=2, seed_generator=iter([3, 4]), bsize=1
    )
    assert summary["reward"]["mean"] > -30  # reaches the goal, not timeout


def test_evaluate_cli_api_policy(monkeypatch, capsys):
    """--policy api runs checkpoint-free through the evaluate CLI."""
    import lmrl_gym_tpu.cli.evaluate as ev

    def fake_transport(model):
        def t(messages):
            return '{"action": "move up"}'

        return t

    monkeypatch.setattr(
        "lmrl_gym_tpu.envs.api_policy.openai_chat_transport",
        lambda model: fake_transport(model),
    )
    results = ev.main(
        ["--task", "maze", "--policy", "api", "--n-rollouts", "1", "--bsize", "1"]
    )
    assert "rollouts" in results
