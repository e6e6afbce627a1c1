"""Vectorized Wordle: the letter-knowledge game as a pure-jnp state machine.

Replaces the reference's object-graph implementation
(llm_rl_scripts/wordle/env/game.py:17-296) with a batched, jit-compiled
kernel stepping B environments in lockstep on TPU.

Semantics preserved exactly (property-tested against a host-side port in
tests/test_wordle.py):

- Not a fixed-hidden-word game: state is per-letter/position knowledge
  (CharKnowledge ∈ {NOT_HERE, POSSIBLE, HERE} × 26 letters × 5 positions,
  game.py:17-74). Each guess samples a *random knowledge-consistent word*
  as the feedback target (game.py:213-222) — adversarial/lazy Wordle.
- A word is consistent with the knowledge state iff for every letter c
  (game.py:53-65):
    * all-POSSIBLE row: no constraint;
    * all-NOT_HERE row: word must not contain c;
    * otherwise: every HERE cell matches, no NOT_HERE cell matches, and
      the word contains c.
- Knowledge update from (guess, target) is sequential over positions
  (game.py:82-92): green sets [c,i]=HERE; yellow sets [c,i]=NOT_HERE;
  gray *overwrites the whole row* with NOT_HERE (CharState.not_used()),
  clobbering earlier writes — order matters for repeated letters.
- Reward (game.py:290-293): bad_word_reward for malformed/OOV guesses
  (which still consume a try); else `win - 1` where win = the filtered
  vocab is a singleton already guessed. Terminal at 6 tries or win
  (game.py:295-296).

State layout (per env): knowledge [26,5] int8, guess history [6,5] int8
(-1 padded, valid guesses only), guess count, done flag. Consistency of
the whole vocab against the knowledge state is one [B,26,5] × [V,5]
broadcasted reduction — the hot op — kept in int8/bool so the VPU streams
it; no MXU needed at these sizes.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

N_CHARS = 5
N_TRIES = 6
ALPHA = 26

NOT_HERE, POSSIBLE, HERE = 0, 1, 2

# feedback codes
GRAY, YELLOW, GREEN = 0, 1, 2

_DEFAULT_VOCAB = os.path.join(
    os.path.dirname(__file__), "vocab", "wordle_official_400.txt"
)


def encode_word(word: str) -> np.ndarray:
    return np.asarray([ord(c) - ord("a") for c in word], dtype=np.int8)


def decode_word(chars) -> str:
    return "".join(chr(int(c) + ord("a")) for c in chars)


@dataclass(frozen=True)
class WordleVocab:
    """Static vocab tables: chars [V,5] int8, has_char [V,26] bool."""

    words: Tuple[str, ...]
    chars: np.ndarray
    has_char: np.ndarray

    @classmethod
    def from_words(cls, words: List[str]) -> "WordleVocab":
        words = [w for w in words if len(w) == N_CHARS]
        chars = np.stack([encode_word(w) for w in words])
        has_char = np.zeros((len(words), ALPHA), dtype=bool)
        for i, w in enumerate(words):
            for c in w:
                has_char[i, ord(c) - ord("a")] = True
        return cls(tuple(words), chars, has_char)

    @classmethod
    def from_file(cls, path: str = _DEFAULT_VOCAB) -> "WordleVocab":
        with open(path) as f:
            return cls.from_words([line.strip() for line in f])

    def __len__(self) -> int:
        return len(self.words)


class WordleState(struct.PyTreeNode):
    """Batched env state; all arrays have a leading batch dim B."""

    knowledge: jax.Array  # [B, 26, 5] int8 ∈ {NOT_HERE, POSSIBLE, HERE}
    guess_hist: jax.Array  # [B, 6, 5] int8, -1 where unused/invalid
    n_guesses: jax.Array  # [B] int32 (counts every try, incl. invalid)
    last_invalid: jax.Array  # [B] bool — last guess was malformed/OOV
    done: jax.Array  # [B] bool
    reward: jax.Array  # [B] float32 — reward of the last step


def initial_state(batch: int) -> WordleState:
    return WordleState(
        knowledge=jnp.full((batch, ALPHA, N_CHARS), POSSIBLE, dtype=jnp.int8),
        guess_hist=jnp.full((batch, N_TRIES, N_CHARS), -1, dtype=jnp.int8),
        n_guesses=jnp.zeros((batch,), dtype=jnp.int32),
        last_invalid=jnp.zeros((batch,), dtype=bool),
        done=jnp.zeros((batch,), dtype=bool),
        reward=jnp.zeros((batch,), dtype=jnp.float32),
    )


def consistent_mask(
    knowledge: jax.Array,  # [..., 26, 5] int8
    vocab_chars: jax.Array,  # [V, 5] int8
    vocab_has: jax.Array,  # [V, 26] bool
) -> jax.Array:
    """[..., V] bool: which vocab words satisfy the knowledge state.

    Vectorization of WordleState.word_in_state / CharState.word_satisfies
    (game.py:53-80)."""
    # [..., 26] row summaries
    all_possible = jnp.all(knowledge == POSSIBLE, axis=-1)
    all_not_here = jnp.all(knowledge == NOT_HERE, axis=-1)

    # word char identity: [V, 5, 26] one-hot of vocab_chars
    w_onehot = jax.nn.one_hot(vocab_chars, ALPHA, dtype=bool)  # [V,5,26]

    # here_viol[..., v, c] = ∃p: knowledge[c,p]==HERE and word v's char at p != c
    here = knowledge == HERE  # [...,26,5]
    nothere = knowledge == NOT_HERE  # [...,26,5]
    # match[v,p,c] → transpose to [V,26,5]
    w_match = jnp.transpose(w_onehot, (0, 2, 1))  # [V,26,5]

    # broadcast [...,1,26,5] vs [V,26,5]
    here_b = here[..., None, :, :]
    nothere_b = nothere[..., None, :, :]
    here_viol = jnp.any(here_b & ~w_match, axis=-1)  # [...,V,26]
    nothere_viol = jnp.any(nothere_b & w_match, axis=-1)  # [...,V,26]

    has = vocab_has  # [V,26]
    mixed_ok = ~here_viol & ~nothere_viol & has

    ap = all_possible[..., None, :]  # [...,1,26]
    anh = all_not_here[..., None, :]
    ok = jnp.where(ap, True, jnp.where(anh, ~has, mixed_ok))
    return jnp.all(ok, axis=-1)  # [..., V]


def transition_knowledge(
    knowledge: jax.Array,  # [26,5] int8
    guess: jax.Array,  # [5] int
    target: jax.Array,  # [5] int
) -> jax.Array:
    """Single-env knowledge update; sequential over the 5 positions exactly
    as game.py:82-92 (gray overwrites the whole row; order matters)."""
    target_has = jnp.zeros((ALPHA,), dtype=bool).at[target].set(True)

    green = guess == target  # [5]
    inword = target_has[guess]  # [5]

    def body(i, know):
        c = guess[i]
        row = know[c]
        row_green = row.at[i].set(HERE)
        row_yellow = row.at[i].set(NOT_HERE)
        row_gray = jnp.full((N_CHARS,), NOT_HERE, dtype=know.dtype)
        new_row = jnp.where(
            green[i], row_green, jnp.where(inword[i], row_yellow, row_gray)
        )
        return know.at[c].set(new_row)

    return jax.lax.fori_loop(0, N_CHARS, body, knowledge)


def render_feedback(knowledge: jax.Array, guess: jax.Array) -> jax.Array:
    """Feedback codes the *agent observes*, rendered from the post-update
    knowledge state (game.py:273-288 transition_sequence): GREEN if the
    cell is HERE; GRAY if the letter's whole row is NOT_HERE; else YELLOW
    if the cell is NOT_HERE. Differs from raw guess-vs-target codes when a
    letter repeats within one guess."""
    rows = knowledge[guess]  # [5,5] — row per guessed char
    cell = rows[jnp.arange(N_CHARS), jnp.arange(N_CHARS)]  # [5]
    row_all_nothere = jnp.all(rows == NOT_HERE, axis=-1)  # [5]
    return jnp.where(
        cell == HERE,
        GREEN,
        jnp.where(row_all_nothere, GRAY, jnp.where(cell == NOT_HERE, YELLOW, GRAY)),
    ).astype(jnp.int8)


class WordleVectorEnv:
    """B Wordle games stepped in lockstep under jit.

    `step(state, guess, valid, key)` consumes [B,5] char-index guesses and
    returns (new_state, feedback [B,5] ∈ {GRAY,YELLOW,GREEN}).
    """

    def __init__(self, vocab: WordleVocab, bad_word_reward: float = -1.0):
        self.vocab = vocab
        self.bad_word_reward = bad_word_reward
        self.vocab_chars = jnp.asarray(vocab.chars)
        self.vocab_has = jnp.asarray(vocab.has_char)

    def reset(self, batch: int) -> WordleState:
        return initial_state(batch)

    @partial(jax.jit, static_argnums=(0,))
    def step(
        self,
        state: WordleState,
        guess: jax.Array,  # [B,5] int8 char indices
        valid: jax.Array,  # [B] bool — parseable 5-letter guess
        key: jax.Array,
    ) -> Tuple[WordleState, jax.Array]:
        """Directly batched step (no per-env vmap): the knowledge update is
        5 unrolled batched scatters, the consistency reduction broadcasts
        over the batch — one flat XLA graph that compiles fast and keeps
        the VPU busy."""
        B = state.done.shape[0]
        guess = guess.astype(jnp.int32)
        knowledge = state.knowledge

        # vocab membership of each guess (game.py:214)
        in_vocab = valid & jnp.any(
            jnp.all(self.vocab_chars[None, :, :] == guess[:, None, :].astype(jnp.int8), axis=-1),
            axis=-1,
        )

        # sample feedback targets from the CURRENT consistent set (game.py:219)
        pre_mask = consistent_mask(knowledge, self.vocab_chars, self.vocab_has)  # [B,V]
        logits = jnp.where(pre_mask, 0.0, -jnp.inf)
        target_idx = jax.random.categorical(key, logits, axis=-1)  # [B]
        target = self.vocab_chars[target_idx].astype(jnp.int32)  # [B,5]

        # batched sequential knowledge update (game.py:82-92 semantics)
        target_onehot = jax.nn.one_hot(target, ALPHA, dtype=bool).any(axis=1)  # [B,26]
        rows_b = jnp.arange(B)
        green = guess == target  # [B,5]
        inword = jnp.take_along_axis(target_onehot, guess, axis=1)  # [B,5]
        new_knowledge = knowledge
        for i in range(N_CHARS):
            c = guess[:, i]
            row = new_knowledge[rows_b, c]  # [B,5]
            row_green = row.at[:, i].set(HERE)
            row_yellow = row.at[:, i].set(NOT_HERE)
            row_gray = jnp.full_like(row, NOT_HERE)
            new_row = jnp.where(
                green[:, i : i + 1],
                row_green,
                jnp.where(inword[:, i : i + 1], row_yellow, row_gray),
            )
            new_knowledge = new_knowledge.at[rows_b, c].set(new_row)

        # invalid guesses leave knowledge unchanged (game.py:214-216)
        new_knowledge = jnp.where(in_vocab[:, None, None], new_knowledge, knowledge)

        # observed feedback rendered from the post-update state (batched
        # render_feedback)
        rows = new_knowledge[rows_b[:, None], guess]  # [B,5,5]
        pos = jnp.arange(N_CHARS)
        cell = rows[:, pos, pos]  # [B,5]
        row_all_nothere = jnp.all(rows == NOT_HERE, axis=-1)  # [B,5]
        feedback = jnp.where(
            cell == HERE,
            GREEN,
            jnp.where(row_all_nothere, GRAY, jnp.where(cell == NOT_HERE, YELLOW, GRAY)),
        ).astype(jnp.int8)
        feedback = jnp.where(in_vocab[:, None], feedback, GRAY)

        # history: every try consumes a slot; valid guesses stored
        slot = jnp.clip(state.n_guesses, 0, N_TRIES - 1)
        stored = jnp.where(
            in_vocab[:, None], guess.astype(jnp.int8), jnp.int8(-1)
        )
        new_hist = state.guess_hist.at[rows_b, slot].set(stored)
        new_n = state.n_guesses + 1

        # win check (game.py:293): post-update filtered set is a singleton
        # already guessed
        post_mask = consistent_mask(new_knowledge, self.vocab_chars, self.vocab_has)
        n_consistent = post_mask.sum(axis=-1)  # [B]
        only_idx = jnp.argmax(post_mask, axis=-1)
        only_word = self.vocab_chars[only_idx]  # [B,5]
        guessed = jnp.any(
            jnp.all(new_hist == only_word[:, None, :], axis=-1), axis=-1
        )
        win = (n_consistent == 1) & guessed

        reward = jnp.where(
            in_vocab, win.astype(jnp.float32) - 1.0, jnp.float32(self.bad_word_reward)
        )
        new_done = (new_n >= N_TRIES) | (reward == 0.0)

        frozen = state.done
        new_state = WordleState(
            knowledge=jnp.where(frozen[:, None, None], knowledge, new_knowledge),
            guess_hist=jnp.where(frozen[:, None, None], state.guess_hist, new_hist),
            n_guesses=jnp.where(frozen, state.n_guesses, new_n),
            last_invalid=jnp.where(frozen, False, ~in_vocab),
            done=jnp.where(frozen, state.done, new_done),
            reward=jnp.where(frozen, 0.0, reward),
        )
        return new_state, feedback

    @partial(jax.jit, static_argnums=(0,))
    def auto_reset(self, state: WordleState) -> WordleState:
        """Reset done slots to fresh games (for continuous batched rollout)."""
        fresh = initial_state(state.done.shape[0])
        d = state.done

        def sel(a, b):
            shape = (-1,) + (1,) * (a.ndim - 1)
            return jnp.where(d.reshape(shape), b, a)

        return jax.tree.map(sel, state, fresh)

    @partial(jax.jit, static_argnums=(0,))
    def rollout_episodes(self, key: jax.Array, batch_holder: WordleState):
        """Full 6-turn episodes for B envs as ONE compiled lax.scan with the
        random-consistent-guess policy: the bench kernel (no per-turn host
        dispatch). Returns (final_state, total_reward [B], wins [B])."""
        state = initial_state(batch_holder.done.shape[0])

        def turn(carry, turn_key):
            state, total = carry
            gkey, skey = jax.random.split(turn_key)
            guess = self.random_consistent_guess(state, gkey)
            state, _ = self.step(
                state, guess, jnp.ones_like(state.done), skey
            )
            return (state, total + state.reward), None

        keys = jax.random.split(key, N_TRIES)
        (state, total), _ = jax.lax.scan(turn, (state, jnp.zeros_like(state.reward)), keys)
        return state, total, state.reward == 0.0

    @partial(jax.jit, static_argnums=(0,))
    def random_consistent_guess(
        self, state: WordleState, key: jax.Array
    ) -> jax.Array:
        """[B,5] guesses sampled uniformly from each env's consistent set —
        the on-device analogue of the reference's scripted rollout policies."""
        mask = consistent_mask(
            state.knowledge, self.vocab_chars, self.vocab_has
        )  # [B,V]
        logits = jnp.where(mask, 0.0, -jnp.inf)
        idx = jax.random.categorical(key, logits, axis=-1)  # [B]
        return self.vocab_chars[idx]
