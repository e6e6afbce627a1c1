"""lmrl_gym_tpu — a TPU-native rebuild of LMRL-Gym.

A benchmark of 8 multi-turn text-game environments (Maze, Text-Nav, Wordle,
Chess, Chess-Endgames, Twenty-Questions, Guess-My-City, Car-Dealer) plus
RL-for-LLMs algorithms (BC, filtered BC, MC-returns, ILQL, CQL, PPO) that
fine-tune decoder-only LM policies against those environments.

Unlike the reference (abdulhaim/LMRL-Gym, host-Python envs + external JaxSeq),
this package is designed TPU-first:

- rule-based environments are vectorized token-level state machines in pure
  jnp, stepping thousands of instances in lockstep under jit
  (`lmrl_gym_tpu.envs.*.vector`);
- models are flax modules with explicit partition rules over a
  ('dp','fsdp','mp') `jax.sharding.Mesh`, decode via `lax.scan` KV caches
  (`lmrl_gym_tpu.models`);
- algorithms are pure-function losses + jit train steps with donated states
  (`lmrl_gym_tpu.algos`);
- all collectives are GSPMD-generated from shardings — no explicit
  communication code outside optional pallas kernels (`lmrl_gym_tpu.ops`).

Reference parity: behavioral semantics are kept identical to the reference
(file:line citations in docstrings point into /root/reference).
"""

__version__ = "0.1.0"
