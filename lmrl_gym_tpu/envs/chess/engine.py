"""ctypes bindings for the native chess core (native/chess/chesscore.cpp).

Fills the roles of python-chess (rules/SAN/FEN) and the vendored Stockfish
opponent (reference chess/env/env.py:1-2,56) with one self-built C++
library. The .so is compiled on demand from the vendored source if absent.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "lib")
_LIB_PATH = os.path.join(_LIB_DIR, "libchesscore.so")
_SRC_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "..", "..", "native", "chess", "chesscore.cpp",
)

STARTING_FEN = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"

# game states (chesscore.cpp GameState)
ONGOING, CHECKMATE, STALEMATE, DRAW_50, DRAW_MATERIAL = 0, 1, 2, 3, 4

_lib = None


def _build_lib() -> None:
    os.makedirs(_LIB_DIR, exist_ok=True)
    src = os.path.normpath(_SRC_PATH)
    subprocess.check_call(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", _LIB_PATH]
    )


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build_lib()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cc_validate_fen.argtypes = [ctypes.c_char_p]
    lib.cc_legal_moves.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.cc_push_san.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.cc_game_state.argtypes = [ctypes.c_char_p]
    lib.cc_in_check.argtypes = [ctypes.c_char_p]
    lib.cc_zobrist.argtypes = [ctypes.c_char_p]
    lib.cc_zobrist.restype = ctypes.c_uint64
    lib.cc_best_move.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_long, ctypes.c_uint64,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.cc_random_move.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_int
    ]
    lib.cc_perft.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.cc_perft.restype = ctypes.c_long
    _lib = lib
    return lib


class Board:
    """Minimal python-chess-like board over the native core.

    State is a FEN string plus a zobrist history for repetition detection
    (fivefold auto-draw, matching python-chess is_game_over())."""

    def __init__(self, fen: str = STARTING_FEN):
        lib = get_lib()
        if not lib.cc_validate_fen(fen.encode()):
            raise ValueError(f"invalid FEN: {fen}")
        self.fen = fen
        self._history = [lib.cc_zobrist(fen.encode())]

    @property
    def turn_white(self) -> bool:
        return self.fen.split()[1] == "w"

    def legal_moves_san(self) -> List[str]:
        lib = get_lib()
        buf = ctypes.create_string_buffer(16384)
        n = lib.cc_legal_moves(self.fen.encode(), buf, len(buf))
        if n < 0:
            raise RuntimeError(f"legal_moves failed: {n}")
        s = buf.value.decode()
        return s.split() if s else []

    def push_san(self, san: str) -> bool:
        """Apply a SAN move; returns False (board unchanged) if illegal."""
        lib = get_lib()
        out = ctypes.create_string_buffer(128)
        rc = lib.cc_push_san(self.fen.encode(), san.encode(), out)
        if rc != 0:
            return False
        self.fen = out.value.decode()
        self._history.append(lib.cc_zobrist(self.fen.encode()))
        return True

    def game_state(self) -> int:
        state = get_lib().cc_game_state(self.fen.encode())
        if state == ONGOING and self._history.count(self._history[-1]) >= 5:
            return DRAW_50  # fivefold repetition → auto draw
        return state

    def is_game_over(self) -> bool:
        return self.game_state() != ONGOING

    def is_checkmate(self) -> bool:
        return self.game_state() == CHECKMATE

    def in_check(self) -> bool:
        return bool(get_lib().cc_in_check(self.fen.encode()))

    def copy(self) -> "Board":
        b = Board.__new__(Board)
        b.fen = self.fen
        b._history = list(self._history)
        return b


def best_move_san(
    fen: str, elo: int = 1200, node_budget: int = 200_000, seed: int = 0
) -> Optional[str]:
    """Engine reply (the Stockfish-opponent stand-in: reference used
    UCI_Elo 1200 at 100ms/move, chess/env/env.py:54-56,162)."""
    lib = get_lib()
    out = ctypes.create_string_buffer(32)
    rc = lib.cc_best_move(fen.encode(), elo, node_budget, seed, out, len(out))
    if rc != 0:
        return None
    return out.value.decode()


def random_move_san(fen: str, seed: int = 0) -> Optional[str]:
    lib = get_lib()
    out = ctypes.create_string_buffer(32)
    rc = lib.cc_random_move(fen.encode(), seed, out, len(out))
    if rc != 0:
        return None
    return out.value.decode()


def perft(fen: str, depth: int) -> int:
    return get_lib().cc_perft(fen.encode(), depth)


class EnginePool:
    """Batched engine bridge for vectorized env stepping.

    The reference runs one Stockfish subprocess per env slot
    (chess/env/env.py:56); here the C search is in-process and ctypes
    releases the GIL for the call's duration, so a thread pool turns a
    batch of positions into parallel native searches — the host-callback
    bridge SURVEY.md §2.11 asks for.
    """

    def __init__(self, workers: int = 8, elo: int = 1200, node_budget: int = 200_000):
        from concurrent.futures import ThreadPoolExecutor

        get_lib()  # build/load once before threads race on it
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self.elo = elo
        self.node_budget = node_budget

    def best_moves(self, fens, seeds=None):
        """[fen, ...] → [san | None, ...] searched concurrently."""
        if seeds is None:
            seeds = range(len(fens))
        futs = [
            self._pool.submit(best_move_san, f, self.elo, self.node_budget, s)
            for f, s in zip(fens, seeds)
        ]
        return [f.result() for f in futs]

    def close(self) -> None:
        self._pool.shutdown(wait=False)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
