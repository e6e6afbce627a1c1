"""jnp chess-endgame kernel == native chesscore engine, state for state.

The vectorized KQ-K/KR-K env (envs/chess/vector.py) is cross-checked
against the perft-validated C++ engine (native/chess/chesscore.cpp) that
the host env uses: FEN rendering, agent legal-move sets, post-move
terminal classification, and the black-reply sets the random opponent
samples from. The opponent CHOICE is random on both sides, so parity is
asserted on the underlying sets and verdicts, which determine the full
step distribution.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmrl_gym_tpu.envs.chess.engine import (
    Board,
    CHECKMATE,
    DRAW_50,
    DRAW_MATERIAL,
    ONGOING,
    STALEMATE,
)
from lmrl_gym_tpu.envs.chess.vector import (
    ACT_LEN,
    OBS_LEN,
    ChessEndgameVectorEnv,
    _parse_san_frame,
)


def sq_name(sq: int) -> str:
    return "abcdefgh"[sq % 8] + str(sq // 8 + 1)


def native_legal(fen):
    """{(piece_char, dst_sq)} from the engine, suffixes stripped."""
    out = set()
    for san in Board(fen).legal_moves_san():
        san = san.rstrip("+#")
        assert "x" not in san, san  # no captures exist in these piece sets
        piece, file_c, rank_c = san[0], san[-2], san[-1]
        out.add((piece, (ord(rank_c) - ord("1")) * 8 + (ord(file_c) - ord("a"))))
    return out


def kernel_legal(env, state, i):
    k_legal, p_legal = jax.device_get(env.agent_legal_moves(state))
    out = set()
    for d in np.flatnonzero(k_legal[i]):
        out.add(("K", int(d)))
    for d in np.flatnonzero(p_legal[i]):
        out.add((env.piece, int(d)))
    return out


@pytest.mark.parametrize("piece", ["Q", "R"])
def test_reset_fens_valid_and_legal_moves_match(piece):
    env = ChessEndgameVectorEnv(piece=piece)
    B = 64
    state = env.reset(jax.random.PRNGKey(0), B)
    fens = env.fen_strings(state)
    for i, fen in enumerate(fens):
        b = Board(fen)  # raises on invalid FEN
        assert not b.in_check()
        assert b.turn_white
        assert native_legal(fen) == kernel_legal(env, state, i), fen


def test_fen_rendering_clocks():
    env = ChessEndgameVectorEnv()
    state = env.reset(jax.random.PRNGKey(1), 4)
    state = state.replace(
        halfmove=jnp.asarray([0, 9, 10, 149], jnp.int32),
        fullmove=jnp.asarray([1, 5, 42, 400], jnp.int32),
    )
    for fen, (h, f) in zip(
        env.fen_strings(state), [(0, 1), (9, 5), (10, 42), (149, 400)]
    ):
        parts = fen.split()
        assert parts[1:4] == ["w", "-", "-"]
        assert int(parts[4]) == h and int(parts[5]) == f
        Board(fen)


def test_obs_tokens_spell_fen():
    env = ChessEndgameVectorEnv()
    state = env.reset(jax.random.PRNGKey(2), 3)
    toks = np.asarray(jax.device_get(env.obs_tokens(state)))
    assert toks.shape == (3, OBS_LEN)
    for i, fen in enumerate(env.fen_strings(state)):
        # even slots spell the fen then pad with spaces; final slot '\n'
        chars = bytes(toks[i, 0::2][: len(fen)].astype(np.uint8)).decode()
        assert chars == fen
        assert (toks[i, 0::2][len(fen):] == 32).all()
        assert toks[i, -1] == 10
        odd = toks[i, 1::2]
        assert (odd[:-1] == 32).all() if OBS_LEN % 2 == 0 else True


def test_san_frame_round_trip():
    env = ChessEndgameVectorEnv()
    is_king = jnp.asarray([True, False, True])
    dst = jnp.asarray([28, 61, 0])  # e4, f8, a1
    frames = env.render_san(is_king, dst)
    piece, got_dst, ok = jax.device_get(_parse_san_frame(frames, ord("Q")))
    assert ok.all()
    assert (got_dst == np.asarray([28, 61, 0])).all()
    assert (piece == np.asarray([ord("K"), ord("Q"), ord("K")])).all()


def test_parse_rejects_malformed():
    env = ChessEndgameVectorEnv()
    bad = [
        "Q x f 7\n",  # capture syntax: no captures exist here
        "e 4\n",  # pawn move
        "Q f\n",  # missing rank
        "Qf7  \n",  # missing separators
        "Q f 9\n",  # off-board rank
        "B f 7\n",  # wrong piece letter
        "Q f 7 !\n",  # bad suffix
    ]
    frames = np.full((len(bad), ACT_LEN), 32, np.int32)
    for i, s in enumerate(bad):
        b = s.encode()[:ACT_LEN]
        frames[i, : len(b)] = np.frombuffer(b, np.uint8)
    _, _, ok = jax.device_get(_parse_san_frame(jnp.asarray(frames), ord("Q")))
    assert not ok.any()


def test_suffix_tolerated():
    frames = np.full((2, ACT_LEN), 32, np.int32)
    for i, s in enumerate(["Q f 7 #\n", "K e 4 +\n"]):
        b = s.encode()
        frames[i, : len(b)] = np.frombuffer(b, np.uint8)
    piece, dst, ok = jax.device_get(_parse_san_frame(jnp.asarray(frames), ord("Q")))
    assert ok.all()


@pytest.mark.parametrize("piece", ["Q", "R"])
def test_step_parity_random_playout(piece):
    """Drive batched episodes with the kernel's random legal policy and
    re-verify every transition against the native engine: legality
    verdict, post-white-move game state, black reply set membership, and
    the resulting FEN."""
    env = ChessEndgameVectorEnv(piece=piece, max_steps=30)
    B = 16
    key = jax.random.PRNGKey(3)
    state = env.reset(key, B)
    for t in range(30):
        prev_fens = env.fen_strings(state)
        prev_done = np.asarray(state.done)
        key, ak, sk = jax.random.split(key, 3)
        # mostly legal moves; every 5th step inject junk (illegal path)
        if t % 5 == 4:
            act = jnp.tile(
                jnp.asarray(
                    np.frombuffer(b"Q a 9\n  ", np.uint8).astype(np.int32)
                )[None, :],
                (B, 1),
            )
        else:
            act = env.random_legal_action(state, ak)
        act_np = np.asarray(jax.device_get(act))
        new_state = env.step(state, act, sk)
        new_fens = env.fen_strings(new_state)

        for i in range(B):
            if prev_done[i]:
                assert float(np.asarray(new_state.reward)[i]) == 0.0
                continue
            san = (
                bytes(act_np[i].astype(np.uint8)).decode().split("\n")[0]
                .replace(" ", "")
            )
            b = Board(prev_fens[i])
            legal = b.push_san(san)
            r = float(np.asarray(new_state.reward)[i])
            if not legal:
                assert bool(np.asarray(new_state.illegal)[i])
                assert r == -1.0
                assert new_fens[i] == prev_fens[i]
                continue
            assert not bool(np.asarray(new_state.illegal)[i])
            gs = b.game_state()
            if gs == CHECKMATE:
                assert r == 1.0 and bool(np.asarray(new_state.done)[i])
                continue
            if gs in (STALEMATE, DRAW_50, DRAW_MATERIAL):
                assert r == 0.0 and bool(np.asarray(new_state.done)[i])
                continue
            # game continued: the kernel's black reply must be one of the
            # engine's legal moves from b's position, and the final FEN
            # must match pushing that reply through the engine
            new_bk = int(np.asarray(new_state.bk)[i])
            captured = int(np.asarray(new_state.pc)[i]) < 0
            reply = "K" + ("x" if captured else "") + sq_name(new_bk)
            assert b.push_san(reply), (prev_fens[i], san, reply)
            assert new_fens[i] == b.fen, (prev_fens[i], san, reply)
            gs2 = b.game_state()
            done_i = bool(np.asarray(new_state.done)[i])
            if gs2 == ONGOING:
                assert r == 0.0
                # kernel may still be done via its own max_steps
                if done_i:
                    assert int(np.asarray(new_state.n_steps)[i]) >= 30
            else:
                assert gs2 in (DRAW_50, DRAW_MATERIAL, STALEMATE)
                assert done_i and r == 0.0
        state = new_state


def test_black_reply_sets_match_engine():
    """After a legal white move the kernel's reply mask must equal the
    engine's legal-move list for black."""
    env = ChessEndgameVectorEnv()
    B = 32
    key = jax.random.PRNGKey(7)
    state = env.reset(key, B)
    fens = env.fen_strings(state)
    key, ak = jax.random.split(key)
    act = env.random_legal_action(state, ak)
    act_np = np.asarray(jax.device_get(act))

    # recompute the kernel's post-white-move internals
    piece_ch, dst, ok = jax.device_get(
        _parse_san_frame(act, ord("Q"))
    )
    wk1 = np.where(piece_ch == ord("K"), dst, np.asarray(state.wk))
    pc1 = np.where(piece_ch == ord("Q"), dst, np.asarray(state.pc))
    replies, tgts = jax.device_get(
        env._black_replies(
            jnp.asarray(wk1), jnp.asarray(pc1), state.bk
        )
    )
    for i in range(B):
        san = (
            bytes(act_np[i].astype(np.uint8)).decode().split("\n")[0]
            .replace(" ", "")
        )
        b = Board(fens[i])
        assert b.push_san(san)
        if b.game_state() != ONGOING:
            continue
        engine_replies = set()
        for s in b.legal_moves_san():
            s = s.rstrip("+#").replace("x", "")
            assert s[0] == "K"
            engine_replies.add(
                (ord(s[2]) - ord("1")) * 8 + (ord(s[1]) - ord("a"))
            )
        kernel_replies = {
            int(t) for t, ok_ in zip(tgts[i], replies[i]) if ok_
        }
        assert kernel_replies == engine_replies, fens[i]


def test_batched_episodes_terminate():
    env = ChessEndgameVectorEnv(max_steps=60)
    B = 128
    key = jax.random.PRNGKey(11)
    state = env.reset(key, B)
    for _ in range(60):
        key, ak, sk = jax.random.split(key, 3)
        act = env.random_legal_action(state, ak)
        state = env.step(state, act, sk)
        if bool(state.done.all()):
            break
    assert bool(state.done.all())


def test_grid_obs_matches_fen_board():
    """obs_mode='grid' renders the same board the FEN describes, with
    square<->token-position correspondence (rank 8 first, 9 tokens/rank)."""
    import jax
    import numpy as np

    from lmrl_gym_tpu.envs.chess.vector import ChessEndgameVectorEnv

    env = ChessEndgameVectorEnv(max_steps=4, obs_mode="grid")
    fen_env = ChessEndgameVectorEnv(max_steps=4, obs_mode="fen")
    assert env.OBS_LEN == 72
    state = env.reset(jax.random.PRNGKey(3), 16)
    obs = np.asarray(env.obs_tokens(state))
    fens = fen_env.fen_strings(state)
    for b in range(16):
        grid = obs[b].reshape(8, 9)
        assert (grid[:, 8] == 10).all()  # newline per rank
        # expand the FEN board field into 64 chars
        board_field = fens[b].split()[0]
        chars = []
        for row in board_field.split("/"):
            for c in row:
                if c.isdigit():
                    chars.extend(["."] * int(c))
                else:
                    chars.append(c)
        want = np.asarray([ord(c) for c in chars]).reshape(8, 8)
        np.testing.assert_array_equal(grid[:, :8], want)
