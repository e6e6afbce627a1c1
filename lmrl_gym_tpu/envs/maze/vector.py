"""Vectorized maze: batched grid navigation as a pure-jnp state machine.

Device-resident equivalent of MazeEnv (llm_rl_scripts/maze/env/env.py:
104-184 semantics): action ids index (up, down, left, right); the agent
moves iff the target cell is open; standard reward 0-at-goal / -4-illegal /
-1-step; `max_steps` exceeded → reward -1 and done. An action id of
INVALID_ACTION models un-parseable text actions (stay + illegal penalty).

The grid is a shared [H,W] uint8 wall map; per-env state is just
(position, goal, step count, done) so millions of instances fit on chip.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# action ids match grids.ACTION_STRS order: up, down, left, right
DELTAS = np.asarray([(-1, 0), (1, 0), (0, -1), (0, 1)], dtype=np.int32)
INVALID_ACTION = 4  # out-of-vocabulary text action


class MazeVecState(struct.PyTreeNode):
    pos: jax.Array  # [B,2] int32 (y,x)
    goal: jax.Array  # [B,2] int32
    n_steps: jax.Array  # [B] int32
    done: jax.Array  # [B] bool
    reward: jax.Array  # [B] float32 — last step's reward
    illegal: jax.Array  # [B] bool — last step was an illegal/invalid action


class MazeVectorEnv:
    def __init__(
        self,
        maze: np.ndarray,
        valid_goals: np.ndarray,
        max_steps: Optional[int] = None,
        illegal_penalty: float = -4.0,
        step_penalty: float = -1.0,
        goal_reward: float = 0.0,
    ):
        self.maze = jnp.asarray(maze, dtype=jnp.uint8)
        self.valid_goals = jnp.asarray(valid_goals, dtype=jnp.int32)
        open_cells = np.argwhere(np.asarray(maze) == 0).astype(np.int32)
        self.open_cells = jnp.asarray(open_cells)
        self.max_steps = max_steps
        self.illegal_penalty = illegal_penalty
        self.step_penalty = step_penalty
        self.goal_reward = goal_reward
        # deltas with an extra zero row for INVALID_ACTION
        self.deltas = jnp.concatenate(
            [jnp.asarray(DELTAS), jnp.zeros((1, 2), dtype=jnp.int32)], axis=0
        )

    @partial(jax.jit, static_argnums=(0, 2))
    def reset(self, key: jax.Array, batch: int) -> MazeVecState:
        """Uniform random goal from valid_goals; uniform start from open
        cells excluding the goal (env.py:186-202 semantics, jax PRNG)."""
        goal_key, pos_key = jax.random.split(key)
        goal_idx = jax.random.randint(
            goal_key, (batch,), 0, self.valid_goals.shape[0]
        )
        goal = self.valid_goals[goal_idx]  # [B,2]

        # sample start uniformly among open cells != goal via masked categorical
        cells = self.open_cells  # [C,2]
        is_goal = jnp.all(cells[None, :, :] == goal[:, None, :], axis=-1)  # [B,C]
        logits = jnp.where(is_goal, -jnp.inf, 0.0)
        pos_idx = jax.random.categorical(pos_key, logits, axis=-1)  # [B]
        pos = cells[pos_idx]
        return MazeVecState(
            pos=pos,
            goal=goal,
            n_steps=jnp.zeros((batch,), jnp.int32),
            done=jnp.zeros((batch,), bool),
            reward=jnp.zeros((batch,), jnp.float32),
            illegal=jnp.zeros((batch,), bool),
        )

    @partial(jax.jit, static_argnums=(0,))
    def step(self, state: MazeVecState, action: jax.Array) -> MazeVecState:
        """action: [B] int32 ∈ [0,4]; 4 = invalid/unparseable. Out-of-range
        ids are clamped to INVALID_ACTION (negative ids would otherwise
        silently clamp to action 0 in the gather)."""
        action = jnp.clip(action, 0, INVALID_ACTION)
        # max-steps timeout fires before the move (env.py:164-165)
        timeout = (
            (state.n_steps >= self.max_steps)
            if self.max_steps is not None
            else jnp.zeros_like(state.done)
        )

        delta = self.deltas[action]  # [B,2]
        target = state.pos + delta
        open_cell = self.maze[target[:, 0], target[:, 1]] == 0
        legal = (action < INVALID_ACTION) & open_cell
        new_pos = jnp.where(legal[:, None], target, state.pos)

        at_goal = jnp.all(new_pos == state.goal, axis=-1)
        reward = jnp.where(
            at_goal,
            self.goal_reward,
            jnp.where(
                action >= INVALID_ACTION, self.illegal_penalty, self.step_penalty
            ),
        )
        reward = jnp.where(timeout, -1.0, reward)
        new_done = at_goal | timeout

        frozen = state.done
        return MazeVecState(
            pos=jnp.where(frozen[:, None], state.pos, new_pos),
            goal=state.goal,
            n_steps=jnp.where(frozen, state.n_steps, state.n_steps + 1),
            done=jnp.where(frozen, state.done, new_done),
            reward=jnp.where(frozen, 0.0, reward),
            illegal=jnp.where(frozen, False, action >= INVALID_ACTION),
        )

    @partial(jax.jit, static_argnums=(0,))
    def auto_reset(self, state: MazeVecState, key: jax.Array) -> MazeVecState:
        fresh = self.reset(key, state.done.shape[0])
        d = state.done

        def sel(a, b):
            shape = (-1,) + (1,) * (a.ndim - 1)
            return jnp.where(d.reshape(shape), b, a)

        return jax.tree.map(sel, state, fresh)

    def optimal_action_table(self, goal: Tuple[int, int]) -> jax.Array:
        """[H,W] int32 table of BFS-optimal action ids (-1 = wall/goal);
        device-side analogue of the reference's optimal-directions oracle
        (maze/env/mazes.py:20-48)."""
        from lmrl_gym_tpu.envs.maze.grids import ACTION_STRS, maze_solver

        maze_np = np.asarray(self.maze)
        table = np.full(maze_np.shape, -1, dtype=np.int32)
        for (y, x), action in maze_solver(maze_np, goal).items():
            table[y, x] = ACTION_STRS.index(action)
        return jnp.asarray(table)


# ---------------------------------------------------------------------------
# Token-frame adapter: MazeVectorEnv as a Markov TokenVecEnv for the fused
# actor (loops/actor.rollout_markov). The on-device protocol is a compact
# fixed-width rendering — "g <yy> <xx> p <yy> <xx>\n" with zero-padded
# 2-digit coordinates spelled digit-by-digit (the reference spells
# coordinates digit-by-digit too, maze/env/env.py:15-81; the wall
# sentences of the host renderer are static text and omitted here). The
# action field holds one of grids.ACTION_STRS verbatim in a fixed
# ACT_LEN=11 slot ("move right\n" is exactly 11 bytes; shorter actions
# are '\n'-terminated early and the tail ignored by the parser).
# ---------------------------------------------------------------------------

_NL, _SP = 10, 32


def _action_templates() -> np.ndarray:
    from lmrl_gym_tpu.envs.maze.grids import ACTION_STRS

    out = np.full((len(ACTION_STRS), MazeTokenVecEnv.ACT_LEN), _SP, np.int32)
    for i, s in enumerate(ACTION_STRS):
        b = s.encode()
        out[i, : len(b)] = np.frombuffer(b, np.uint8)
    return out


class MazeTokenVecEnv:
    """Markov token-frame wrapper over MazeVectorEnv."""

    OBS_LEN = 20  # "g Y Y X X p Y Y X X" spelled (10 chars, 9 seps) + '\n'
    ACT_LEN = 11

    def __init__(self, inner: MazeVectorEnv):
        self.inner = inner
        self.templates = jnp.asarray(_action_templates())  # [4, ACT_LEN]
        # per-template compare length: through its '\n'
        tl = np.asarray(_action_templates())
        self.template_len = jnp.asarray(
            [int(np.argmax(row == _NL)) + 1 for row in tl], jnp.int32
        )

    def reset(self, key: jax.Array, batch: int) -> MazeVecState:
        return self.inner.reset(key, batch)

    @partial(jax.jit, static_argnums=(0,))
    def obs_tokens(self, state: MazeVecState) -> jax.Array:
        B = state.pos.shape[0]
        d = lambda v, p: ord("0") + (v // p) % 10
        cols = [
            jnp.full((B,), ord("g"), jnp.int32),
            d(state.goal[:, 0], 10), d(state.goal[:, 0], 1),
            d(state.goal[:, 1], 10), d(state.goal[:, 1], 1),
            jnp.full((B,), ord("p"), jnp.int32),
            d(state.pos[:, 0], 10), d(state.pos[:, 0], 1),
            d(state.pos[:, 1], 10), d(state.pos[:, 1], 1),
        ]
        out = jnp.full((B, self.OBS_LEN), _SP, jnp.int32)
        for i, c in enumerate(cols):
            out = out.at[:, 2 * i].set(c)
        return out.at[:, self.OBS_LEN - 1].set(_NL)

    @partial(jax.jit, static_argnums=(0,))
    def parse_action(self, act_tokens: jax.Array) -> jax.Array:
        """[B, ACT_LEN] frame -> [B] action id (4 = INVALID)."""
        idx = jnp.arange(self.ACT_LEN)[None, None, :]
        within = idx < self.template_len[None, :, None]
        eq = act_tokens[:, None, :] == self.templates[None, :, :]
        match = jnp.all(eq | ~within, axis=-1)  # [B, 4]
        return jnp.where(
            jnp.any(match, axis=1),
            jnp.argmax(match, axis=1),
            INVALID_ACTION,
        ).astype(jnp.int32)

    @partial(jax.jit, static_argnums=(0,))
    def step(
        self, state: MazeVecState, act_tokens: jax.Array, key: jax.Array
    ) -> MazeVecState:
        del key  # maze transitions are deterministic
        return self.inner.step(state, self.parse_action(act_tokens))

    @partial(jax.jit, static_argnums=(0,))
    def render_action(self, action: jax.Array) -> jax.Array:
        """[B] action id -> [B, ACT_LEN] frame (scripted/optimal policies)."""
        safe = jnp.clip(action, 0, self.templates.shape[0] - 1)
        return self.templates[safe]

    @partial(jax.jit, static_argnums=(0,))
    def optimal_action(self, state: MazeVecState, table: jax.Array) -> jax.Array:
        """BFS-optimal action ids for the single-goal table (see
        MazeVectorEnv.optimal_action_table)."""
        return table[state.pos[:, 0], state.pos[:, 1]]
