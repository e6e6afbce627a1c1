"""Fused on-device actor: LM decoding and vectorized env stepping under
one jit — no host round-trips inside an episode.

This is the TPU-native redesign of the reference's rollout driver
(`interact_environment`, LLM_RL/environment.py:154-207), which ping-pongs
between host env logic and device generation every turn. Here the policy
decode loop and the env transition are one compiled program: SURVEY.md §7
"fused decode-while-stepping actor loop" (hard part #3).

Wordle makes this exact: under the byte tokenizer, the reformatted text
protocol (envs/wordle/env.py reformat_history) is fixed-width —

    "Wordle:\n"                      8 obs tokens (header)
    per turn t<6:
      "c o p s e\n"                 10 action tokens (letters at 0,2,4,6,8)
      "b y g b b\n"                 10 obs tokens (feedback letters)

so a full episode is exactly 128 tokens, statically laid out, and the
whole rollout is shape-static: a 6-turn scan, each turn = a 10-step decode
scan + one vector-env step + one 10-token observation forward. The token
stream matches the host-side ReformatWordleEnv byte-for-byte, so models
BC-trained on host-rendered data drive this actor unchanged (golden test
in tests/test_actor.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lmrl_gym_tpu.envs.wordle.vector import (
    N_CHARS,
    N_TRIES,
    WordleVectorEnv,
    initial_state,
)
from lmrl_gym_tpu.models.interface import LMCore
from lmrl_gym_tpu.models.transformer import KVCache, mask_pad_logits

# Byte-tokenizer constants (token id == byte value)
_SP, _NL = 32, 10
_A = 97  # ord('a')
HEADER = tuple("Wordle:\n".encode())  # 8 tokens
TURN_LEN = 2 * (2 * N_CHARS)  # action 10 + obs 10
EPISODE_LEN = len(HEADER) + N_TRIES * TURN_LEN  # 128
_FEEDBACK_BYTES = (98, 121, 103)  # GRAY->'b', YELLOW->'y', GREEN->'g'


def episode_is_action_mask() -> np.ndarray:
    """Static [EPISODE_LEN] bool: which slots are action tokens."""
    m = np.zeros(EPISODE_LEN, bool)
    for t in range(N_TRIES):
        off = len(HEADER) + t * TURN_LEN
        m[off : off + 2 * N_CHARS] = True
    return m


def action_end_positions() -> np.ndarray:
    """[N_TRIES] token index of each turn's final action token (the '\\n'),
    where per-turn rewards sit for ILQL/MC data (environment.py:361-380
    reward-on-last-token convention)."""
    return np.asarray(
        [len(HEADER) + t * TURN_LEN + 2 * N_CHARS - 1 for t in range(N_TRIES)]
    )


class WordleRollout(NamedTuple):
    tokens: jax.Array  # [B, EPISODE_LEN] int32 — full episode token stream
    turn_reward: jax.Array  # [B, N_TRIES] float32 (0 for turns after done)
    turn_live: jax.Array  # [B, N_TRIES] bool — env was not done going in
    win: jax.Array  # [B] bool
    n_turns: jax.Array  # [B] int32

    def token_rewards(self) -> jax.Array:
        """[B, EPISODE_LEN]: turn rewards scattered onto action-final tokens."""
        B = self.tokens.shape[0]
        out = jnp.zeros((B, EPISODE_LEN), jnp.float32)
        pos = jnp.asarray(action_end_positions())
        return out.at[:, pos].set(self.turn_reward * self.turn_live)

    def token_action_mask(self) -> jax.Array:
        """[B, EPISODE_LEN] bool: action tokens of live turns (loss mask)."""
        is_action = jnp.asarray(episode_is_action_mask())
        live_by_slot = jnp.zeros(
            (self.turn_live.shape[0], EPISODE_LEN), bool
        )
        for t in range(N_TRIES):
            off = len(HEADER) + t * TURN_LEN
            live_by_slot = live_by_slot.at[:, off : off + TURN_LEN].set(
                self.turn_live[:, t : t + 1]
            )
        return live_by_slot & is_action[None, :]


# step_fn(params, tokens [B,T], carry) -> (logits [B,T,V] f32, carry).
# `params` is a traced argument (NOT a closure capture — closed-over
# weights would be baked into the compiled module as constants, bloating
# the executable and forcing a recompile per refresh). Positions are
# implicit (dense layout: cache.index + arange(T)), mask all-ones.
StepFn = Callable[[Any, jax.Array, Any], Tuple[jax.Array, Any]]


def make_lm_step_fn(
    core: LMCore, batch: int, total_len: int = EPISODE_LEN
) -> Tuple[StepFn, Any]:
    """Plain-LM policy trunk for the actor (BC/filtered-BC checkpoints).
    total_len sizes the KV cache: the full episode for conversation envs
    (Wordle), one OBS+ACT turn for Markov envs (rollout_markov)."""
    config = core.config

    def step_fn(params, tokens, cache):
        logits, _, cache = core.module.apply(
            {"params": params},
            tokens,
            attention_mask=jnp.ones((batch, cache.max_len), jnp.int32),
            position_ids=cache.index + jnp.arange(tokens.shape[1])[None, :],
            cache=cache,
            deterministic=True,
        )
        return mask_pad_logits(logits.astype(jnp.float32), config.vocab_size), cache

    return step_fn, KVCache.init(config, batch, total_len)


def make_value_guided_step_fn(
    core: LMCore,
    q_head,
    batch: int,
    two_trunks: bool,
    twin_q: bool,
    beta: float = 8.0,
    total_len: int = EPISODE_LEN,
) -> Tuple[StepFn, Any]:
    """β-perturbed decoding trunk: logits = π_β + β·min(q1,q2) (the
    reference's GPT2ValueRLGeneration, value_rl_base/gpt2/generation.py:36-121)
    as an actor step_fn.

    `params` at call time is a dict {pi_beta?, base, q1, q2?}. With
    two_trunks=False the value base doubles as π_β (shared trunk, one
    forward per step)."""
    config = core.config

    def trunk(p, tokens, cache):
        logits, hidden, cache = core.module.apply(
            {"params": p},
            tokens,
            attention_mask=jnp.ones((batch, cache.max_len), jnp.int32),
            position_ids=cache.index + jnp.arange(tokens.shape[1])[None, :],
            cache=cache,
            deterministic=True,
        )
        return logits, hidden, cache

    def step_fn(params, tokens, carry):
        base_cache, pi_cache = carry
        base_logits, hidden, base_cache = trunk(params["base"], tokens, base_cache)
        q1 = q_head.apply({"params": params["q1"]}, hidden)
        q = q1
        if twin_q:
            q = jnp.minimum(q1, q_head.apply({"params": params["q2"]}, hidden))
        if two_trunks:
            pi_logits, _, pi_cache = trunk(params["pi_beta"], tokens, pi_cache)
        else:
            pi_logits = base_logits
        logits = pi_logits.astype(jnp.float32) + beta * q.astype(jnp.float32)
        return (
            mask_pad_logits(logits, config.vocab_size),
            (base_cache, pi_cache),
        )

    base_cache = KVCache.init(config, batch, total_len)
    pi_cache = (
        KVCache.init(config, batch, total_len) if two_trunks else base_cache
    )
    return step_fn, (base_cache, pi_cache)


@partial(jax.jit, static_argnums=(0, 1, 6, 7, 8))
def rollout_wordle(
    env: WordleVectorEnv,
    step_fn: StepFn,
    params: Any,
    init_carry: Any,
    key: jax.Array,
    batch_holder: jax.Array,  # [B] anything with the batch dim (shape carrier)
    temperature: float = 1.0,
    greedy: bool = False,
    constrain_vocab: bool = False,
) -> WordleRollout:
    """One fused compiled program: 6 turns of (10-token decode scan →
    env.step → 10-token feedback forward). Everything stays on device.

    constrain_vocab masks each decode step to the wordle vocab trie
    (separator slots forced, letter slots restricted to letters that
    extend some vocab word matching the sampled prefix) — the serving-
    side composition of the env's legal-guess set, the same legality
    masking the maze/chess gates use (VERDICT r4 item 4; the reference's
    GPT-2 emits valid words because it is pretrained — a from-scratch
    byte LM needs the mask or ~all sampled guesses fall outside the
    vocab and every rollout scores -6)."""
    B = batch_holder.shape[0]
    header = jnp.broadcast_to(jnp.asarray(HEADER, jnp.int32), (B, len(HEADER)))

    # prefill the header; last logits condition the first action token
    logits, carry = step_fn(params, header, init_carry)
    last_logits = logits[:, -1, :]

    tokens0 = jnp.zeros((B, EPISODE_LEN), jnp.int32).at[:, : len(HEADER)].set(header)
    state0 = initial_state(B)
    fb_bytes = jnp.asarray(_FEEDBACK_BYTES, jnp.int32)
    if constrain_vocab:
        # [V,5] letter indices and [5,V,26] per-position one-hots for the
        # alive-word → allowed-letter contraction
        vchars = jnp.asarray(env.vocab.chars, jnp.int32)
        vonehot = jax.nn.one_hot(vchars.T, 26, dtype=jnp.float32)  # [5,V,26]

    def decode_action(carry, last_logits, key):
        """10-step decode scan → ([B,10] tokens, carry, key)."""

        def sample(logits, k):
            if greedy:
                return jnp.argmax(logits, axis=-1)
            return jax.random.categorical(
                k, logits / jnp.maximum(temperature, 1e-6), axis=-1
            )

        if not constrain_vocab:

            def dstep(sc, k):
                carry, logits = sc
                tok = sample(logits, k)
                new_logits, carry = step_fn(params, tok[:, None], carry)
                return (carry, new_logits[:, -1, :]), tok

            keys = jax.random.split(key, 2 * N_CHARS)
            (carry, last), toks = jax.lax.scan(dstep, (carry, last_logits), keys)
            return toks.T.astype(jnp.int32), carry, last  # [B,10]

        def dstep(sc, inp):
            carry, logits, alive = sc
            k, slot = inp
            j = slot // 2  # letter position for even slots
            # allowed letters: any alive vocab word has letter l at j
            allowed = (
                jnp.einsum(
                    "bv,vc->bc", alive.astype(jnp.float32),
                    jax.lax.dynamic_index_in_dim(vonehot, j, 0, keepdims=False),
                ) > 0.0
            )  # [B,26]
            lmask = jnp.full(logits.shape, -1e9, logits.dtype)
            lmask = lmask.at[:, _A : _A + 26].set(
                jnp.where(allowed, 0.0, -1e9)
            )
            letter_tok = sample(logits + lmask, k)
            sep_tok = jnp.where(slot == 2 * N_CHARS - 1, _NL, _SP)
            is_letter_slot = slot % 2 == 0
            tok = jnp.where(
                is_letter_slot, letter_tok, jnp.full((B,), sep_tok, jnp.int32)
            )
            chars_j = jnp.take(vchars, j, axis=1)  # [V]
            match = chars_j[None, :] == (letter_tok - _A)[:, None]  # [B,V]
            alive = jnp.where(is_letter_slot, alive & match, alive)
            new_logits, carry = step_fn(params, tok[:, None], carry)
            return (carry, new_logits[:, -1, :], alive), tok

        keys = jax.random.split(key, 2 * N_CHARS)
        alive0 = jnp.ones((B, vchars.shape[0]), bool)
        (carry, last, _), toks = jax.lax.scan(
            dstep, (carry, last_logits, alive0),
            (keys, jnp.arange(2 * N_CHARS)),
        )
        return toks.T.astype(jnp.int32), carry, last  # [B,10]

    def turn(scan_carry, turn_in):
        state, carry, last_logits, tokens = scan_carry
        t, turn_key = turn_in
        kd, ke = jax.random.split(turn_key)

        live = ~state.done
        act, carry, last_logits = decode_action(carry, last_logits, kd)

        # parse "c o p s e\n": letters at even slots, separators between
        letters = act[:, 0 : 2 * N_CHARS : 2]  # [B,5]
        is_letter = jnp.all((letters >= _A) & (letters < _A + 26), axis=-1)
        seps_ok = jnp.all(act[:, 1 : 2 * N_CHARS - 1 : 2] == _SP, axis=-1) & (
            act[:, 2 * N_CHARS - 1] == _NL
        )
        valid = is_letter & seps_ok
        guess = jnp.clip(letters - _A, 0, 25).astype(jnp.int8)

        new_state, feedback = env.step(state, guess, valid, ke)

        # feedback "b y g b b\n" as 10 obs tokens
        fb = fb_bytes[feedback.astype(jnp.int32)]  # [B,5]
        obs = jnp.full((B, 2 * N_CHARS), _SP, jnp.int32)
        obs = obs.at[:, 0 : 2 * N_CHARS : 2].set(fb)
        obs = obs.at[:, 2 * N_CHARS - 1].set(_NL)

        off = len(HEADER) + t * TURN_LEN
        tokens = jax.lax.dynamic_update_slice(tokens, act, (0, off))
        tokens = jax.lax.dynamic_update_slice(tokens, obs, (0, off + 2 * N_CHARS))

        # advance the cache over the observation; its last logits start the
        # next turn's action
        logits, carry = step_fn(params, obs, carry)
        last_logits = logits[:, -1, :]

        out = (new_state.reward * live, live)
        return (new_state, carry, last_logits, tokens), out

    keys = jax.random.split(key, N_TRIES)
    ts = jnp.arange(N_TRIES)
    (state, _, _, tokens), (turn_reward, turn_live) = jax.lax.scan(
        turn, (state0, carry, last_logits, tokens0), (ts, keys)
    )
    turn_reward = turn_reward.T  # [B, N_TRIES]
    turn_live = turn_live.T
    win = jnp.any((turn_reward == 0.0) & turn_live, axis=-1)
    return WordleRollout(
        tokens=tokens,
        turn_reward=turn_reward,
        turn_live=turn_live,
        win=win,
        n_turns=turn_live.sum(axis=-1).astype(jnp.int32),
    )


@partial(jax.jit, static_argnums=(0,))
def rollout_wordle_scripted(
    env: WordleVectorEnv,
    key: jax.Array,
    batch_holder: jax.Array,  # [B] shape carrier
    p_smart: float = 1.0,
    p_repeat: float = 0.0,
) -> WordleRollout:
    """Device-side behavior generator: each turn's guess is the env's
    random-CONSISTENT guess w.p. p_smart, a REPEAT of the previous valid
    guess w.p. p_repeat (the reference's RepeatPolicy,
    wordle/env/scripted_policies.py:42-174 — a concentrated, systematically
    bad action: given the context it is DETERMINISTIC, so greedy imitation
    locks onto it wherever its mixture mass beats any single consistent
    word's), else a uniform random vocab word (valid but feedback-blind).
    A per-TURN quality mixture, so identical contexts carry both good and
    bad actions — the adversarial-mixture design the maze/car-dealer gates
    use; episode-level filtering (%BC) cannot isolate turn quality but
    per-token values can. Token stream is byte-identical to
    rollout_wordle's, so the rollouts feed BC/ILQL training directly at
    vector-env rates instead of host-scripted episode collection."""
    B = batch_holder.shape[0]
    header = jnp.broadcast_to(jnp.asarray(HEADER, jnp.int32), (B, len(HEADER)))
    tokens0 = jnp.zeros((B, EPISODE_LEN), jnp.int32).at[:, : len(HEADER)].set(header)
    state0 = initial_state(B)
    fb_bytes = jnp.asarray(_FEEDBACK_BYTES, jnp.int32)
    vchars = jnp.asarray(env.vocab_chars, jnp.int32)

    def turn(scan_carry, turn_in):
        state, tokens = scan_carry
        t, tk = turn_in
        kg, kr, km, ke = jax.random.split(tk, 4)

        live = ~state.done
        g_smart = env.random_consistent_guess(state, kg)
        g_rand = vchars[jax.random.randint(kr, (B,), 0, vchars.shape[0])]
        # previous valid guess (guess_hist stores -1 for none/invalid)
        last_slot = jnp.clip(state.n_guesses - 1, 0, N_TRIES - 1)
        g_last = state.guess_hist[jnp.arange(B), last_slot].astype(jnp.int32)
        has_last = g_last[:, 0] >= 0
        g_repeat = jnp.where(has_last[:, None], g_last, g_rand)
        u = jax.random.uniform(km, (B,))
        smart = u < p_smart
        repeat = (~smart) & (u < p_smart + p_repeat)
        guess = jnp.where(
            smart[:, None], g_smart, jnp.where(repeat[:, None], g_repeat, g_rand)
        ).astype(jnp.int8)

        new_state, feedback = env.step(state, guess, jnp.ones((B,), bool), ke)

        act = jnp.full((B, 2 * N_CHARS), _SP, jnp.int32)
        act = act.at[:, 0 : 2 * N_CHARS : 2].set(_A + guess.astype(jnp.int32))
        act = act.at[:, 2 * N_CHARS - 1].set(_NL)
        fb = fb_bytes[feedback.astype(jnp.int32)]
        obs = jnp.full((B, 2 * N_CHARS), _SP, jnp.int32)
        obs = obs.at[:, 0 : 2 * N_CHARS : 2].set(fb)
        obs = obs.at[:, 2 * N_CHARS - 1].set(_NL)

        off = len(HEADER) + t * TURN_LEN
        tokens = jax.lax.dynamic_update_slice(tokens, act, (0, off))
        tokens = jax.lax.dynamic_update_slice(tokens, obs, (0, off + 2 * N_CHARS))
        return (new_state, tokens), (new_state.reward * live, live)

    keys = jax.random.split(key, N_TRIES)
    ts = jnp.arange(N_TRIES)
    (state, tokens), (turn_reward, turn_live) = jax.lax.scan(
        turn, (state0, tokens0), (ts, keys)
    )
    turn_reward = turn_reward.T
    turn_live = turn_live.T
    win = jnp.any((turn_reward == 0.0) & turn_live, axis=-1)
    return WordleRollout(
        tokens=tokens,
        turn_reward=turn_reward,
        turn_live=turn_live,
        win=win,
        n_turns=turn_live.sum(axis=-1).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Generic fused actor for Markov turn-based token envs (chess endgames,
# maze): each turn is an independent (obs, action) window — the model sees
# only the current observation (the reference's FenChessHistoryEnv shape,
# chess/env/env.py:218-244), so the KV cache RESETS every turn and the
# cache is sized to one OBS_LEN + ACT_LEN window, not the whole episode.
# ---------------------------------------------------------------------------


class MarkovRollout(NamedTuple):
    obs_tokens: jax.Array  # [B, N_TURNS, OBS_LEN] int32
    act_tokens: jax.Array  # [B, N_TURNS, ACT_LEN] int32
    turn_reward: jax.Array  # [B, N_TURNS] float32 (0 after done)
    turn_live: jax.Array  # [B, N_TURNS] bool
    final_obs: jax.Array  # [B, OBS_LEN] observation after the last turn
    turn_illegal: Optional[jax.Array] = None  # [B, N_TURNS] bool (env flag)

    def window_tokens(self) -> jax.Array:
        """[B, N, OBS+ACT]: per-turn training windows."""
        return jnp.concatenate([self.obs_tokens, self.act_tokens], axis=-1)


@partial(jax.jit, static_argnums=(0, 1, 2, 7, 8))
def rollout_markov(
    env,  # TokenVecEnv: obs_tokens(state), step(state, act_tokens, key)
    n_turns: int,
    step_fn: StepFn,
    params: Any,
    init_carry: Any,  # fresh (zeroed) cache carry, reused every turn
    state0: Any,  # env state from env.reset(...)
    key: jax.Array,
    temperature: float = 1.0,
    greedy: bool = False,
):
    """One compiled program: n_turns of (obs forward -> ACT_LEN-token
    decode scan -> env.step), cache reset per turn. Returns
    (MarkovRollout, final env state)."""
    act_len = env.ACT_LEN

    def turn(state, turn_key):
        kd, ke = jax.random.split(turn_key)
        live = ~state.done
        obs = env.obs_tokens(state)
        logits, carry = step_fn(params, obs, init_carry)
        last = logits[:, -1, :]

        def dstep(sc, k):
            carry, logits = sc
            if greedy:
                tok = jnp.argmax(logits, axis=-1)
            else:
                tok = jax.random.categorical(
                    k, logits / jnp.maximum(temperature, 1e-6), axis=-1
                )
            new_logits, carry = step_fn(params, tok[:, None], carry)
            return (carry, new_logits[:, -1, :]), tok

        keys = jax.random.split(kd, act_len)
        (_, _), toks = jax.lax.scan(dstep, (carry, last), keys)
        act = toks.T.astype(jnp.int32)  # [B, ACT_LEN]

        new_state = env.step(state, act, ke)
        illegal = new_state.illegal & live
        return new_state, (obs, act, new_state.reward * live, live, illegal)

    keys = jax.random.split(key, n_turns)
    final_state, (obs_t, act_t, rew, live, ill) = jax.lax.scan(
        turn, state0, keys
    )
    return (
        MarkovRollout(
            obs_tokens=obs_t.transpose(1, 0, 2),
            act_tokens=act_t.transpose(1, 0, 2),
            turn_reward=rew.T,
            turn_live=live.T,
            final_obs=env.obs_tokens(final_state),
            turn_illegal=ill.T,
        ),
        final_state,
    )


@partial(jax.jit, static_argnums=(0, 1, 6, 7))
def rollout_wordle_segmented(
    env: WordleVectorEnv,
    step_fn: StepFn,
    params: Any,
    init_carry: Any,
    key: jax.Array,
    batch_holder: jax.Array,
    temperature: float = 1.0,
    greedy: bool = False,
) -> WordleRollout:
    """rollout_wordle with TURN-SIZED caches: decode attention reads the
    whole static cache every step, so turn t runs against a cache of
    exactly len(HEADER) + (t+1)*TURN_LEN slots (28, 48, ... 128) instead
    of a full 128-slot cache from turn 0 — sum(L_t)/(6*128) = 0.61x the
    cache read traffic, which is what bounds the actor post r3 cache fix
    (PERF_NOTES.md). The 6 turns are Python-unrolled (one executable per
    cache length inside one jit), so this variant compiles ~6x more
    program than the scan version; prefer it for long-running serving,
    and rollout_wordle when compile latency matters."""
    B = batch_holder.shape[0]
    header = jnp.broadcast_to(jnp.asarray(HEADER, jnp.int32), (B, len(HEADER)))
    fb_bytes = jnp.asarray(_FEEDBACK_BYTES, jnp.int32)

    def cache_view(c, L, grow):
        def f(x):
            if getattr(x, "ndim", 0) == 4:  # [B, H, T, Dh] layer buffer
                if grow:
                    return jnp.pad(x, ((0, 0), (0, 0), (0, L - x.shape[2]), (0, 0)))
                return x[:, :, :L, :]
            return x
        return jax.tree.map(f, c)

    carry = cache_view(init_carry, len(HEADER) + TURN_LEN, grow=False)
    logits, carry = step_fn(params, header, carry)
    last_logits = logits[:, -1, :]

    tokens = jnp.zeros((B, EPISODE_LEN), jnp.int32).at[:, : len(HEADER)].set(header)
    state = initial_state(B)
    rewards, lives = [], []

    keys = jax.random.split(key, N_TRIES)
    for t in range(N_TRIES):
        kd, ke = jax.random.split(keys[t])
        live = ~state.done

        def dstep(sc, k):
            carry, logits = sc
            if greedy:
                tok = jnp.argmax(logits, axis=-1)
            else:
                tok = jax.random.categorical(
                    k, logits / jnp.maximum(temperature, 1e-6), axis=-1
                )
            new_logits, carry = step_fn(params, tok[:, None], carry)
            return (carry, new_logits[:, -1, :]), tok

        dkeys = jax.random.split(kd, 2 * N_CHARS)
        (carry, last_logits), toks = jax.lax.scan(
            dstep, (carry, last_logits), dkeys
        )
        act = toks.T.astype(jnp.int32)

        letters = act[:, 0 : 2 * N_CHARS : 2]
        is_letter = jnp.all((letters >= _A) & (letters < _A + 26), axis=-1)
        seps_ok = jnp.all(act[:, 1 : 2 * N_CHARS - 1 : 2] == _SP, axis=-1) & (
            act[:, 2 * N_CHARS - 1] == _NL
        )
        valid = is_letter & seps_ok
        guess = jnp.clip(letters - _A, 0, 25).astype(jnp.int8)
        state, feedback = env.step(state, guess, valid, ke)

        fb = fb_bytes[feedback.astype(jnp.int32)]
        obs = jnp.full((B, 2 * N_CHARS), _SP, jnp.int32)
        obs = obs.at[:, 0 : 2 * N_CHARS : 2].set(fb)
        obs = obs.at[:, 2 * N_CHARS - 1].set(_NL)

        off = len(HEADER) + t * TURN_LEN
        tokens = jax.lax.dynamic_update_slice(tokens, act, (0, off))
        tokens = jax.lax.dynamic_update_slice(tokens, obs, (0, off + 2 * N_CHARS))

        logits, carry = step_fn(params, obs, carry)
        last_logits = logits[:, -1, :]
        rewards.append(state.reward * live)
        lives.append(live)

        if t + 1 < N_TRIES:
            carry = cache_view(
                carry, len(HEADER) + (t + 2) * TURN_LEN, grow=True
            )

    turn_reward = jnp.stack(rewards, axis=1)
    turn_live = jnp.stack(lives, axis=1)
    win = jnp.any((turn_reward == 0.0) & turn_live, axis=-1)
    return WordleRollout(
        tokens=tokens,
        turn_reward=turn_reward,
        turn_live=turn_live,
        win=win,
        n_turns=turn_live.sum(axis=-1).astype(jnp.int32),
    )
