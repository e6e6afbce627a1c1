"""Generate golden fixtures from the reference implementation.

Run manually (requires /root/reference):
    python tests/make_goldens.py

Produces tests/goldens/*.json capturing reference-env trajectories under
fixed seeds — the BASELINE.json "env trajectories and rewards match the
reference exactly under fixed seed" gate. Tests consume the JSON only; the
reference tree is not needed at test time.
"""
import json
import os
import random
import sys

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
REFERENCE = "/root/reference"


def make_wordle_goldens():
    sys.path.insert(0, REFERENCE)
    from llm_rl_scripts.wordle.env.game import Vocabulary, WordleGame

    vocab_path = os.path.join(
        REFERENCE, "llm_rl_scripts/wordle/vocab/wordle_official_400.txt"
    )
    episodes = []
    for seed in range(20):
        rng = random.Random(seed)
        vocab = Vocabulary.from_file(vocab_path, fill_cache=False, rng=rng)
        game = WordleGame.initialize(vocab)
        # action selection from an independent rng so the env-side rng
        # stream is exactly what the env implementation consumes
        act_rng = random.Random(1000 + seed)
        steps = []
        done = False
        while not done:
            if act_rng.random() < 0.1:
                action = "zzzzz"  # invalid: not in vocab
            else:
                action = act_rng.choice(vocab.all_vocab)
            game, reward, done = game.next(action)
            feedback = game.transition_sequence()[-1]
            steps.append(
                dict(action=action, feedback=feedback, reward=reward, done=done)
            )
        episodes.append(dict(seed=seed, steps=steps))
    with open(os.path.join(GOLDEN_DIR, "wordle.json"), "w") as f:
        json.dump(episodes, f, indent=1)
    print(f"wordle: {len(episodes)} episodes")


def make_maze_goldens():
    sys.path.insert(0, REFERENCE)
    from llm_rl_scripts.maze.env.env import (
        MazeEnv,
        describe_observation_give_position,
        standard_reward,
        manhatten_actions,
    )
    import numpy as np
    from LLM_RL.environment import Text

    # double_t_maze grid inlined (reference mazes.py pulls in skimage,
    # which is absent here; the grid itself is ours from envs/maze/grids.py)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lmrl_gym_tpu.envs.maze.grids import double_t_maze

    maze = double_t_maze()
    goal = np.asarray([[8, 6]])
    episodes = []
    for seed in range(20):
        env = MazeEnv(
            maze=maze,
            valid_goals=goal,
            actions=manhatten_actions,
            max_steps=100,
            describe_function=describe_observation_give_position,
            reward_function=standard_reward,
        )
        obs0 = env.reset(seed=seed)
        act_rng = random.Random(2000 + seed)
        steps = []
        history = obs0
        done = False
        actions = list(manhatten_actions.keys()) + ["fly\n"]
        while not done and len(steps) < 60:
            action = act_rng.choice(actions)
            history = history + (Text(action, True),)
            history, reward, done = env.step(history)
            steps.append(
                dict(
                    action=action,
                    obs="".join(t.text for t in history),
                    reward=reward,
                    done=done,
                )
            )
        episodes.append(
            dict(
                seed=seed,
                initial_obs=obs0[0].text,
                goal=list(env.goal),
                steps=steps,
            )
        )
    with open(os.path.join(GOLDEN_DIR, "maze.json"), "w") as f:
        json.dump(episodes, f, indent=1)
    print(f"maze: {len(episodes)} episodes")


def make_maze_optimal_table_golden():
    # transcribed from reference mazes.py:20-48 double_t_maze_optimal_directions
    # (the module itself imports skimage, absent here)
    ref = {
        (1, 1): "move right\n", (1, 2): "move right\n", (1, 3): "move down\n",
        (1, 4): "move left\n", (1, 5): "move left\n", (1, 7): "move right\n",
        (1, 8): "move right\n", (1, 9): "move down\n", (1, 10): "move left\n",
        (1, 11): "move left\n", (2, 3): "move down\n", (3, 3): "move down\n",
        (4, 3): "move down\n", (5, 3): "move right\n", (5, 4): "move right\n",
        (5, 5): "move right\n", (5, 6): "move down\n", (6, 6): "move down\n",
        (7, 6): "move down\n", (5, 7): "move left\n", (5, 8): "move left\n",
        (5, 9): "move left\n", (4, 9): "move down\n", (3, 9): "move down\n",
        (2, 9): "move down\n",
    }
    table = {f"{y},{x}": v for (y, x), v in ref.items()}
    with open(os.path.join(GOLDEN_DIR, "maze_optimal_directions.json"), "w") as f:
        json.dump(table, f, indent=1)
    print(f"maze optimal table: {len(table)} cells")


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    make_wordle_goldens()
    make_maze_goldens()
    make_maze_optimal_table_golden()
