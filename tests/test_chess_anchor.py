"""Absolute anchor for the chess opponent's handicap scale (VERDICT r2
item 10): the pinned level (1200, the reference's UCI_Elo 1200 role,
chess/env/env.py:54-56) must solve every mate-in-1 but NOT every
mate-in-3, over the classified kQK positions recorded by
scripts/chess_anchor.py. The full per-level table (mate-in-1/2/3 solve
rates + win rate vs the random opponent) lives in
tests/goldens/chess_anchor.json and PERF_NOTES.md."""
import json
import os

from lmrl_gym_tpu.envs.chess.engine import best_move_san


def _load():
    path = os.path.join(
        os.path.dirname(__file__), "goldens", "chess_anchor.json"
    )
    with open(path) as f:
        return json.load(f)


def _forces_mate(fen, move, n):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from chess_anchor import move_forces_mate

    return move_forces_mate(fen, move, n)


def test_pinned_level_solves_all_mate_in_1():
    d = _load()
    elo = d["pinned"]
    for i, fen in enumerate(d["positions"]["1"]):
        mv = best_move_san(fen, elo=elo, seed=1234 + i)
        assert mv is not None and _forces_mate(fen, mv, 1), fen


def test_pinned_level_misses_some_mate_in_3():
    d = _load()
    elo = d["pinned"]
    solved = sum(
        1
        for i, fen in enumerate(d["positions"]["3"])
        if _forces_mate(fen, best_move_san(fen, elo=elo, seed=1234 + i), 3)
    )
    assert solved < len(d["positions"]["3"])


def test_recorded_rates_consistent():
    d = _load()
    by_elo = {r["elo"]: r for r in d["levels"]}
    assert by_elo[d["pinned"]]["mate1"] == 1.0
    assert by_elo[d["pinned"]]["mate3"] < 1.0
    # full-strength level is strictly stronger on the recorded axes
    assert by_elo[2400]["mate2"] == 1.0 and by_elo[2400]["mate3"] == 1.0
