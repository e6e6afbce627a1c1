"""Vectorized chess endgames: FEN/SAN legality as pure-jnp state machines.

The BASELINE north star names "FEN/SAN chess move legality as pure jnp
state machines" and config #4 "Chess Endgames (KQ-vs-K): FEN/SAN legality
kernel + ILQL". This module is that kernel for the reference's endgame
piece sets kQK / kRK (llm_rl_scripts/chess/env/env.py:246-260): the agent
(white) has king + one major piece, the opponent a lone king. With three
pieces the full rules collapse to precomputed 64x64(x64) adjacency /
alignment / between tables, so batched reset/step run entirely on device
— no host callback, unlike the general-chess path (envs/chess/engine.py).

Semantics mirror the host ChessGame (envs/chess/env.py:77-103, itself
reference env.py:91-140):
  illegal SAN        -> reward -1, episode continues, board unchanged
  agent checkmates   -> +1, done
  stalemate / queen captured (insufficient material) / 75-move rule
                     -> 0, done
  opponent           -> uniform-random legal king move (the reference's
                        random-opponent mode, env.py:172-184)
Divergences from the host env (documented, asserted in tests where
checkable): no fivefold-repetition draw (needs unbounded history; the
75-move rule bounds episodes anyway), and reset() samples uniformly over
VALID positions via fixed-attempt rejection inside jit rather than
unbounded host-side rejection — both are uniform over the same support.

Token protocol (fused-actor frames, tests/test_chess_vector.py):
  obs  = FEN spelled char-by-char, space-separated (host preprocess_state,
         env.py:42-44), space-padded to a static width, '\n' terminated
  act  = SAN spelled char-by-char space-separated ("Q f 7\n"), in a
         static ACT_LEN field; parsing reads even slots up to '\n'
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# ---------------------------------------------------------------- tables
# square 0..63 = a1..h8 (sq = rank*8 + file)


def _build_tables() -> dict:
    adj = np.zeros((64, 64), bool)
    r_aligned = np.zeros((64, 64), bool)
    b_aligned = np.zeros((64, 64), bool)
    between = np.zeros((64, 64, 64), bool)
    for a in range(64):
        ra, fa = divmod(a, 8)
        for b in range(64):
            if a == b:
                continue
            rb, fb = divmod(b, 8)
            if max(abs(ra - rb), abs(fa - fb)) == 1:
                adj[a, b] = True
            dr, df = rb - ra, fb - fa
            if dr == 0 or df == 0:
                r_aligned[a, b] = True
            elif abs(dr) == abs(df):
                b_aligned[a, b] = True
            else:
                continue
            sr = (dr > 0) - (dr < 0)
            sf = (df > 0) - (df < 0)
            r, f = ra + sr, fa + sf
            while (r, f) != (rb, fb):
                between[a, b, r * 8 + f] = True
                r, f = r + sr, f + sf
    # 8 king move targets per square (self = invalid slot marker)
    king_tgt = np.full((64, 8), -1, np.int32)
    for a in range(64):
        ra, fa = divmod(a, 8)
        k = 0
        for dr in (-1, 0, 1):
            for df in (-1, 0, 1):
                if dr == df == 0:
                    continue
                r, f = ra + dr, fa + df
                if 0 <= r < 8 and 0 <= f < 8:
                    king_tgt[a, k] = r * 8 + f
                k += 1
    return dict(
        adj=adj, r_aligned=r_aligned, b_aligned=b_aligned,
        q_aligned=r_aligned | b_aligned, between=between, king_tgt=king_tgt,
    )


_T = _build_tables()
ADJ = jnp.asarray(_T["adj"])
R_ALIGNED = jnp.asarray(_T["r_aligned"])
Q_ALIGNED = jnp.asarray(_T["q_aligned"])
BETWEEN = jnp.asarray(_T["between"])
KING_TGT = jnp.asarray(_T["king_tgt"])

_NL, _SP = 10, 32
ACT_LEN = 8  # "Q f 7 #\n" worst case: 4 SAN chars spelled
FEN_MAX = 48  # 3-piece board field <=33 chars + " w - - HHH FFF"
OBS_LEN = 2 * FEN_MAX  # spelled chars + separators, '\n' in the last slot


class ChessVecState(struct.PyTreeNode):
    wk: jax.Array  # [B] int32 white king square
    pc: jax.Array  # [B] int32 white major piece square, -1 if captured
    bk: jax.Array  # [B] int32 black king square
    halfmove: jax.Array  # [B] int32 FEN halfmove clock
    fullmove: jax.Array  # [B] int32 FEN fullmove number
    n_steps: jax.Array  # [B] int32 agent actions taken (incl. illegal)
    done: jax.Array  # [B] bool
    reward: jax.Array  # [B] float32 — last step's reward
    illegal: jax.Array  # [B] bool — last step was an illegal action


def _piece_attacks(pc, target, blocker, aligned):
    """Does the major piece on `pc` attack `target` with one `blocker`
    square occupied? ([B] int32 args; pc may be -1 = captured.)"""
    pcc = jnp.clip(pc, 0, 63)
    att = aligned[pcc, target] & ~BETWEEN[pcc, target, blocker]
    return att & (pc >= 0) & (pc != target)


class ChessEndgameVectorEnv:
    """Batched KQ-K / KR-K endgame with a random-mover opponent."""

    OBS_LEN = OBS_LEN
    ACT_LEN = ACT_LEN

    def __init__(self, piece: str = "Q", max_steps: int = 50,
                 obs_mode: str = "fen"):
        """obs_mode: 'fen' — the reference protocol, FEN spelled
        char-by-char (chess/env/env.py:13-26); 'grid' — an 8x8 board
        rendering ('.', 'K', 'Q'/'R', 'k' per square, rank 8 first, one
        rank per line). The grid exists because the reference's policy
        reads FEN with PRETRAINED GPT-2 weights; a from-scratch small
        trunk must internally reconstruct board geometry from FEN
        run-length strings, which measurably caps value learning (r4
        chess gate, PERF_NOTES). Square<->token-position correspondence
        makes the geometry positionally local."""
        assert piece in ("Q", "R")
        assert obs_mode in ("fen", "grid")
        self.piece = piece
        self.piece_byte = ord(piece)
        self.aligned = Q_ALIGNED if piece == "Q" else R_ALIGNED
        self.max_steps = max_steps
        self.obs_mode = obs_mode
        if obs_mode == "grid":
            self.OBS_LEN = 8 * 9  # 8 squares + '\n' per rank, 8 ranks

    # ------------------------------------------------------------ reset

    @partial(jax.jit, static_argnums=(0, 2))
    def reset(self, key: jax.Array, batch: int) -> ChessVecState:
        """Uniform over valid (wk, pc, bk) placements: white to move,
        kings apart, black not in check (reference env.py:246-260
        validity), via 8-attempt rejection per slot (miss prob < 1e-6,
        deterministic fallback position after that)."""
        K = 8
        sq = jax.random.randint(key, (3, K, batch), 0, 64)
        wk, pc, bk = sq[0], sq[1], sq[2]
        distinct = (wk != pc) & (wk != bk) & (pc != bk)
        apart = ~ADJ[wk, bk]
        no_check = ~_piece_attacks(pc, bk, wk, self.aligned)
        ok = distinct & apart & no_check  # [K, B]
        pick = jnp.argmax(ok, axis=0)  # first valid attempt
        any_ok = jnp.any(ok, axis=0)
        take = lambda a: a[pick, jnp.arange(a.shape[1])]
        B = batch
        return ChessVecState(
            wk=jnp.where(any_ok, take(wk), 0),
            pc=jnp.where(any_ok, take(pc), 8),
            bk=jnp.where(any_ok, take(bk), 63),
            halfmove=jnp.zeros((B,), jnp.int32),
            fullmove=jnp.ones((B,), jnp.int32),
            n_steps=jnp.zeros((B,), jnp.int32),
            done=jnp.zeros((B,), bool),
            reward=jnp.zeros((B,), jnp.float32),
            illegal=jnp.zeros((B,), bool),
        )

    # --------------------------------------------------- move legality

    def agent_legal_moves(self, state: ChessVecState):
        """([B,64] king-move mask, [B,64] piece-move mask) of legal
        destination squares for the side to move (white)."""
        wk, pc, bk = state.wk, state.pc, state.bk
        dst = jnp.arange(64)[None, :]
        wk_, pc_, bk_ = wk[:, None], pc[:, None], bk[:, None]
        k_legal = (
            ADJ[wk_, dst]
            & (dst != pc_)
            & (dst != bk_)
            & ~ADJ[dst, bk_]
        )
        p_legal = (
            (pc_ >= 0)
            & self.aligned[jnp.clip(pc_, 0), dst]
            & (dst != wk_)
            & (dst != bk_)
            & ~BETWEEN[jnp.clip(pc_, 0), dst, wk_]
            & ~BETWEEN[jnp.clip(pc_, 0), dst, bk_]
        )
        return k_legal, p_legal

    def _black_replies(self, wk, pc, bk):
        """[B,8] legal-reply mask for the lone king on `bk` against
        {wk, pc}: target on board, not the white king's square, not
        white-attacked with the black king REMOVED from its old square
        (a king stepping back along the ray stays attacked), and the
        piece square only by undefended capture."""
        tgt = KING_TGT[bk]  # [B,8]
        on_board = tgt >= 0
        t = jnp.clip(tgt, 0)
        wk_, pc_ = wk[:, None], pc[:, None]
        is_cap = t == pc_
        attacked = ADJ[wk_, t] | _piece_attacks(
            jnp.broadcast_to(pc_, t.shape), t, jnp.broadcast_to(wk_, t.shape),
            self.aligned,
        )
        cap_ok = is_cap & ~ADJ[wk_, t]  # capturing the piece: only king defends
        legal = on_board & (t != wk_) & jnp.where(is_cap, cap_ok, ~attacked)
        return legal, t

    def black_in_check(self, state: ChessVecState) -> jax.Array:
        return _piece_attacks(state.pc, state.bk, state.wk, self.aligned)

    # ------------------------------------------------------------- step

    @partial(jax.jit, static_argnums=(0,))
    def step(
        self, state: ChessVecState, act_tokens: jax.Array, key: jax.Array
    ) -> ChessVecState:
        """act_tokens: [B, ACT_LEN] int32 byte tokens of a spelled SAN
        field ("Q f 7\n" + junk). Applies the full reference step:
        parse -> legality -> apply -> terminal checks -> random black
        reply -> terminal checks."""
        B = act_tokens.shape[0]
        piece_ch, dst, parse_ok = _parse_san_frame(act_tokens, self.piece_byte)

        k_legal, p_legal = self.agent_legal_moves(state)
        is_king = piece_ch == ord("K")
        is_piece = piece_ch == self.piece_byte
        dmask = jax.nn.one_hot(dst, 64, dtype=bool)
        legal = parse_ok & (
            (is_king & jnp.any(k_legal & dmask, axis=1))
            | (is_piece & jnp.any(p_legal & dmask, axis=1))
        )

        # apply white's move
        wk1 = jnp.where(legal & is_king, dst, state.wk)
        pc1 = jnp.where(legal & is_piece, dst, state.pc)
        half1 = jnp.where(legal, state.halfmove + 1, state.halfmove)

        # black status after white's move
        in_check = _piece_attacks(pc1, state.bk, wk1, self.aligned)
        replies, tgts = self._black_replies(wk1, pc1, state.bk)
        no_reply = ~jnp.any(replies, axis=1)
        mate = legal & in_check & no_reply
        stalemate = legal & ~in_check & no_reply
        draw75_w = legal & (half1 >= 150)

        over_after_white = mate | stalemate | draw75_w

        # random legal black reply (for games still running)
        logits = jnp.where(replies, 0.0, -jnp.inf)
        safe_logits = jnp.where(
            jnp.any(replies, axis=1, keepdims=True), logits, 0.0
        )
        choice = jax.random.categorical(key, safe_logits, axis=1)  # [B]
        bk1 = tgts[jnp.arange(B), choice]
        captured = bk1 == pc1
        do_reply = legal & ~over_after_white
        bk2 = jnp.where(do_reply, bk1, state.bk)
        pc2 = jnp.where(do_reply & captured, -1, pc1)
        half2 = jnp.where(
            do_reply, jnp.where(captured, 0, half1 + 1), half1
        )
        full2 = jnp.where(do_reply, state.fullmove + 1, state.fullmove)

        # terminal checks after black's reply
        material_draw = do_reply & (pc2 < 0)
        draw75_b = do_reply & (half2 >= 150)

        n_steps = state.n_steps + 1
        timeout = n_steps >= self.max_steps

        done = over_after_white | material_draw | draw75_b | timeout
        reward = jnp.where(
            mate, 1.0, jnp.where(legal, 0.0, -1.0)
        ).astype(jnp.float32)

        frozen = state.done
        keep = lambda old, new: jnp.where(frozen, old, new)
        return ChessVecState(
            wk=keep(state.wk, wk1),
            pc=keep(state.pc, pc2),
            bk=keep(state.bk, bk2),
            halfmove=keep(state.halfmove, half2),
            fullmove=keep(state.fullmove, full2),
            n_steps=keep(state.n_steps, n_steps),
            done=keep(state.done, done),
            reward=jnp.where(frozen, 0.0, reward),
            illegal=jnp.where(frozen, False, ~legal),
        )

    # ------------------------------------------------- token rendering

    @partial(jax.jit, static_argnums=(0,))
    def obs_tokens(self, state: ChessVecState) -> jax.Array:
        """[B, OBS_LEN] int32. 'fen': FEN spelled char-by-char with space
        separators (host preprocess_state), space-padded, '\n' last.
        'grid': 72 tokens — squares a8..h8\\n ... a1..h1\\n."""
        if self.obs_mode == "grid":
            return self._grid_tokens(state)
        chars, length = self._fen_chars(state)
        B = chars.shape[0]
        out = jnp.full((B, OBS_LEN), _SP, jnp.int32)
        idx = jnp.arange(FEN_MAX)[None, :]
        out = out.at[:, 0::2].set(
            jnp.where(idx < length[:, None], chars, _SP)
        )
        return out.at[:, OBS_LEN - 1].set(_NL)

    def _grid_tokens(self, state: ChessVecState) -> jax.Array:
        B = state.wk.shape[0]
        board = jnp.full((B, 64), ord("."), jnp.int32)
        rows = jnp.arange(B)
        board = board.at[rows, state.wk].set(ord("K"))
        # pc == -1 once captured: write a no-op value at a clamped index
        pc_safe = jnp.clip(state.pc, 0, 63)
        board = board.at[rows, pc_safe].set(
            jnp.where(state.pc >= 0, self.piece_byte, board[rows, pc_safe])
        )
        board = board.at[rows, state.bk].set(ord("k"))
        # square index = rank*8+file; render rank 8 (index 56..63) first
        grid = board.reshape(B, 8, 8)[:, ::-1, :]
        out = jnp.full((B, 8, 9), _NL, jnp.int32)
        out = out.at[:, :, :8].set(grid)
        return out.reshape(B, 72)

    def _fen_chars(self, state: ChessVecState) -> Tuple[jax.Array, jax.Array]:
        """([B, FEN_MAX] char codes, [B] length): run-length-encoded board
        + ' w - - H F' suffix, assembled with one compaction scatter."""
        B = state.wk.shape[0]
        sq = jnp.arange(64)
        board = jnp.zeros((B, 64), jnp.int32)
        board = jnp.where(sq[None, :] == state.wk[:, None], ord("K"), board)
        board = jnp.where(
            (sq[None, :] == state.pc[:, None]) & (state.pc[:, None] >= 0),
            self.piece_byte, board,
        )
        board = jnp.where(sq[None, :] == state.bk[:, None], ord("k"), board)
        # FEN ranks go 8->1: rank r emits files 0..7 of board rank (7-r)
        b8 = board.reshape(B, 8, 8)[:, ::-1, :]  # [B, rank-from-top, file]
        occ = b8 > 0

        # per (rank, file): run of empties since the last piece
        file_idx = jnp.arange(8)
        occ_files = jnp.where(occ, file_idx[None, None, :], -1)
        prev = jax.lax.associative_scan(
            jnp.maximum, occ_files, axis=2
        )  # last occupied file <= f
        prev_before = jnp.concatenate(
            [jnp.full((B, 8, 1), -1), prev[:, :, :-1]], axis=2
        )
        run_before = file_idx[None, None, :] - prev_before - 1  # empties before piece
        run_tail = 7 - prev[:, :, 7]  # empties after the last piece (8 if none)
        run_tail = jnp.where(prev[:, :, 7] < 0, 8, run_tail)

        # slot grid per rank: (digit?, piece?) x 8 files + tail digit + '/'
        dig = lambda n: ord("0") + n
        slot_chars = jnp.zeros((B, 8, 18), jnp.int32)
        slot_valid = jnp.zeros((B, 8, 18), bool)
        slot_chars = slot_chars.at[:, :, 0:16:2].set(dig(run_before))
        slot_valid = slot_valid.at[:, :, 0:16:2].set(occ & (run_before > 0))
        slot_chars = slot_chars.at[:, :, 1:16:2].set(b8)
        slot_valid = slot_valid.at[:, :, 1:16:2].set(occ)
        slot_chars = slot_chars.at[:, :, 16].set(dig(run_tail))
        slot_valid = slot_valid.at[:, :, 16].set(run_tail > 0)
        slot_chars = slot_chars.at[:, :, 17].set(ord("/"))
        slot_valid = slot_valid.at[:, :, 17].set(True)
        slot_valid = slot_valid.at[:, 7, 17].set(False)  # no trailing '/'

        # suffix " w - - <half> <full>" (numbers: up to 3 digits each);
        # clamp to 999 so the 3-digit invariant holds even under future
        # long-horizon configs (d2 > 9 would emit a non-digit byte)
        def num_slots(n):
            n = jnp.minimum(n, 999)
            d2, d1, d0 = n // 100, (n // 10) % 10, n % 10
            chars = jnp.stack([dig(d2), dig(d1), dig(d0)], axis=-1)
            valid = jnp.stack([d2 > 0, (d2 > 0) | (d1 > 0), jnp.ones_like(d0, bool)], axis=-1)
            return chars, valid

        hc, hv = num_slots(state.halfmove)
        fc, fv = num_slots(state.fullmove)
        fixed = jnp.asarray([ord(c) for c in " w - - "], jnp.int32)
        suf_chars = jnp.concatenate(
            [
                jnp.broadcast_to(fixed, (B, 7)), hc,
                jnp.full((B, 1), _SP, jnp.int32), fc,
            ],
            axis=1,
        )
        suf_valid = jnp.concatenate(
            [jnp.ones((B, 7), bool), hv, jnp.ones((B, 1), bool), fv], axis=1
        )

        chars = jnp.concatenate([slot_chars.reshape(B, -1), suf_chars], axis=1)
        valid = jnp.concatenate([slot_valid.reshape(B, -1), suf_valid], axis=1)
        pos = jnp.cumsum(valid, axis=1) - 1
        pos = jnp.where(valid, pos, FEN_MAX + 7)  # dropped
        out = jnp.full((B, FEN_MAX + 8), _SP, jnp.int32)
        out = jax.vmap(lambda o, p, c: o.at[p].set(c, mode="drop"))(out, pos, chars)
        return out[:, :FEN_MAX], valid.sum(axis=1).astype(jnp.int32)

    # ------------------------------------------------- helper policies

    @partial(jax.jit, static_argnums=(0,))
    def random_legal_action(
        self, state: ChessVecState, key: jax.Array
    ) -> jax.Array:
        """[B, ACT_LEN] token frame of a uniformly random legal move —
        the scripted behavior policy for offline data generation and the
        cross-check harness."""
        k_legal, p_legal = self.agent_legal_moves(state)
        both = jnp.concatenate([k_legal, p_legal], axis=1)  # [B,128]
        logits = jnp.where(both, 0.0, -jnp.inf)
        safe = jnp.where(jnp.any(both, axis=1, keepdims=True), logits, 0.0)
        choice = jax.random.categorical(key, safe, axis=1)
        is_king = choice < 64
        dst = choice % 64
        return self.render_san(is_king, dst)

    def render_san(self, is_king: jax.Array, dst: jax.Array) -> jax.Array:
        """[B, ACT_LEN] frame "K e 4\n" / "Q f 7\n" (no check suffixes —
        the native SAN parser accepts them as optional)."""
        B = dst.shape[0]
        piece = jnp.where(is_king, ord("K"), self.piece_byte)
        file_c = ord("a") + dst % 8
        rank_c = ord("1") + dst // 8
        out = jnp.full((B, ACT_LEN), _SP, jnp.int32)
        out = out.at[:, 0].set(piece)
        out = out.at[:, 2].set(file_c)
        out = out.at[:, 4].set(rank_c)
        return out.at[:, 5].set(_NL)

    def fen_strings(self, state: ChessVecState):
        """Host-side decode of obs FENs (tests / golden generation)."""
        chars, length = jax.device_get(self._fen_chars(state))
        return [
            bytes(c[: int(n)].astype(np.uint8)).decode()
            for c, n in zip(np.asarray(chars), np.asarray(length))
        ]


def _parse_san_frame(act_tokens: jax.Array, piece_byte: int):
    """Parse a spelled SAN field: chars at even slots, spaces at odd
    slots, '\n' terminates (host preprocess_move layout). Returns
    (piece_char [B], dst square [B], parse_ok [B]).

    Accepted grammar for these piece sets: [KQR][a-h][1-8] with an
    optional trailing '+' or '#' (suffix tolerated, not validated —
    matching the native SAN parser). Anything else (captures 'x',
    pawn moves, castling, bad separators) parses as invalid -> the env
    scores it illegal, reward -1 (reference env.py:91-103)."""
    B, L = act_tokens.shape
    toks = act_tokens
    is_nl = toks == _NL
    has_nl = jnp.any(is_nl, axis=1)
    nl_pos = jnp.argmax(is_nl, axis=1)  # first '\n'

    # chars occupy even slots strictly before nl_pos; separators odd slots
    idx = jnp.arange(L)[None, :]
    before = idx < nl_pos[:, None]
    sep_ok = jnp.all(
        jnp.where(before & (idx % 2 == 1), toks == _SP, True), axis=1
    )
    n_chars = (nl_pos + 1) // 2  # '\n' sits at odd slot 2k-1 for k chars
    nl_odd = nl_pos % 2 == 1

    c = lambda k: toks[:, 2 * k] if 2 * k < L else jnp.zeros((B,), jnp.int32)
    c0, c1, c2, c3 = c(0), c(1), c(2), c(3)
    piece_ok = (c0 == ord("K")) | (c0 == piece_byte)
    file_ok = (c1 >= ord("a")) & (c1 <= ord("h"))
    rank_ok = (c2 >= ord("1")) & (c2 <= ord("8"))
    suffix_ok = (n_chars == 3) | (
        (n_chars == 4) & ((c3 == ord("+")) | (c3 == ord("#")))
    )
    parse_ok = (
        has_nl & nl_odd & sep_ok & piece_ok & file_ok & rank_ok & suffix_ok
    )
    dst = jnp.clip((c2 - ord("1")) * 8 + (c1 - ord("a")), 0, 63)
    return c0, dst, parse_ok
