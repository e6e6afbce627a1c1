"""Text-Nav structural parity vs the reference game SPEC (VERDICT r2
item 9). TextWorld cannot run here, but the reference game is
deterministically specified in make_game.py:33-119; the spec-golden
tests/goldens/text_nav_spec.json encodes it, and these tests assert the
from-scratch engine reproduces it: room graph, container/object
placement, walkthrough completion with win reward 1, the eat-food fail
event, and the fully/partially-observed observation difference."""
import json
import os
import random
import re

import pytest

from lmrl_gym_tpu.envs.text_nav.engine import OPPOSITE
from lmrl_gym_tpu.envs.text_nav.env import (
    OBJECTIVE,
    TextNavEnv,
    WalkthroughAgent,
    build_house,
    quest_status,
    walkthrough_from,
)
from lmrl_gym_tpu.text.frames import Text


@pytest.fixture(scope="module")
def spec():
    with open(
        os.path.join(os.path.dirname(__file__), "goldens", "text_nav_spec.json")
    ) as f:
        return json.load(f)


def test_room_graph_matches_spec(spec):
    world = build_house(random.Random(0))
    assert sorted(world.rooms) == sorted(spec["rooms"])
    # every spec connection present in both directions, and no extras
    expected = set()
    for a, d, b in spec["connections"]:
        expected.add((a, d, b))
        expected.add((b, OPPOSITE[d], a))
    actual = {
        (room, d, to)
        for room, r in world.rooms.items()
        for d, to in r.exits.items()
    }
    assert actual == expected


def test_placement_matches_spec(spec):
    world = build_house(random.Random(1))
    for room, names in spec["supporters"].items():
        got = [t.name for t in world.rooms[room].things if t.kind == "supporter"]
        assert got == names, room
    for cname, info in spec["containers"].items():
        cont = next(
            t for t in world.rooms[info["room"]].things if t.name == cname
        )
        assert cont.kind == "container"
        assert cont.is_open is (not info["closed"])
    for oname, (room, holder) in spec["objects"].items():
        h = next(t for t in world.rooms[room].things if t.name == holder)
        assert any(t.name == oname for t in h.contents), oname


def test_start_room_uniform_over_spec_rooms(spec):
    seen = set()
    for seed in range(64):
        world = build_house(random.Random(seed))
        assert world.player_room in spec["start_rooms"]
        seen.add(world.player_room)
    assert seen == set(spec["start_rooms"])


def test_objective_matches_spec(spec):
    assert OBJECTIVE == spec["objective"]


def test_walkthrough_wins_with_reward_1(spec):
    for seed in (0, 3, 11):
        env = TextNavEnv()
        history = env.reset(seed=seed)
        agent = WalkthroughAgent(env)
        plan = walkthrough_from(env.world)
        # spec: movement prefix then the fixed action suffix around the
        # living room and kitchen (make_game.py:103-119)
        non_move = [c for c in plan if not c.startswith("go ")]
        assert non_move == spec["walkthrough_suffix"]
        total, done, reward = 0.0, False, 0.0
        for _ in range(40):
            history = agent.act(history)
            history, reward, done = env.step(history)
            total += reward
            if done:
                break
        assert done and reward == 1.0
        won, failed = quest_status(env.world)
        assert won and not failed


def test_eating_the_food_fails_the_episode():
    env = TextNavEnv()
    history = env.reset(seed=2)
    # walk to the living room, take the food, eat it
    from lmrl_gym_tpu.envs.text_nav.env import _shortest_path

    cmds = [
        f"go {d}"
        for d in _shortest_path(env.world, env.world.player_room, "living room")
    ] + ["take stale food from table", "eat stale food"]
    done = False
    for c in cmds:
        history = history + (Text(c + "\n", True),)
        history, reward, done = env.step(history)
    assert done and reward == 0.0
    won, failed = quest_status(env.world)
    assert failed and not won


def test_partial_vs_full_observation_differ_by_location_only():
    """hide_location (make_game.py:127-144): the partially-observed env
    strips room headers; otherwise the observation text is identical."""
    full = TextNavEnv(display_location=True)
    part = TextNavEnv(display_location=False)
    h_full = full.reset(seed=7)
    h_part = part.reset(seed=7)
    assert full.world.player_room == part.world.player_room
    room = full.world.player_room
    assert f"-= {room.title()} =-" in h_full[0].text
    assert f"-= {room.title()} =-" not in h_part[0].text
    strip = lambda s: re.sub(r"-= .+? =-\n?", "", s)  # noqa: E731
    assert strip(h_full[0].text) == h_part[0].text
