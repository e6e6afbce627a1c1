"""Serving path: value-guided decoding, text policies, rerankers.

Rebuild of the reference's value_rl_base stack (SURVEY §2.5):

- `ValueGuidedServer.generate`: decode with logits = π_β + β·min(q1,q2)
  (value_rl_base/gpt2/generation.py:36-121). The reference threads two HF
  KV caches through a FlaxGenerationMixin; here both trunks run inside one
  scan-based decode loop (models/generation.py) with a (π_β cache, value
  cache) carry. Setting share_trunk=True runs ONE trunk and applies the Q
  heads to its hidden states — half the decode FLOPs when π_β and the
  value base were initialized from the same checkpoint and only the heads
  differ (a TPU-first option the reference lacks).
- `ValuePolicy`: BatchedTextPolicy — histories → strings → left-pad →
  generate → strip prompt → Text(out, True); done slots return None
  (value_rl_base/gpt2/interface.py:254-330).
- Rerankers: score a proposal set and argmax / softmax-sample
  (ppo/reranker_policy.py:5-32); score fns: ILQL Σ value_weight·(Q−V) +
  logit_weight·logπ_β (ilql/gpt2/score_fn.py:11-68), MC Σ Q
  (mc_returns/score_fn.py:10-60), BC/PPO action log-prob
  (ppo/score_fn.py:10-126).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lmrl_gym_tpu.core.blocking import (
    BlockingStrategy,
    Padding,
    Truncation,
    block_sequences,
    strip_prompt_from_completion,
)
from lmrl_gym_tpu.envs.base import BatchedTextPolicy
from lmrl_gym_tpu.models.generation import (
    SamplingConfig,
    generate,
    generate_constrained,
)
from lmrl_gym_tpu.models.interface import LMCore, initialize_attn_mask_pos_ids
from lmrl_gym_tpu.models.transformer import KVCache, mask_pad_logits
from lmrl_gym_tpu.text.frames import Text, TextHistory, text_history_to_str


def _bucket_batch(ids: np.ndarray) -> Tuple[jnp.ndarray, int]:
    """Pad the batch dim up to the next power of two by repeating row 0.

    The jitted generate scans specialize on (B, T); during env rollouts
    the live-prompt count shrinks as episodes finish, and without
    bucketing every distinct B compiles a fresh decode program (20-40s
    each on the remote-compile TPU backend). Bucketing bounds the shape
    family to log2(B_max) programs; callers slice outputs back to B."""
    B = ids.shape[0]
    Bp = 1 << max(0, B - 1).bit_length()
    if Bp == B:
        return jnp.asarray(ids), B
    reps = np.broadcast_to(ids[:1], (Bp - B,) + ids.shape[1:])
    return jnp.asarray(np.concatenate([ids, reps], axis=0)), B


class ValueRLParams(NamedTuple):
    """Parameter bundle (cf. ValueRLInference, value_rl_base/base_interface.py:26-66)."""

    pi_beta: Optional[Any]  # frozen BC prior (None → pure β·Q decoding)
    base: Any  # value trunk
    q1_head: Any
    q2_head: Optional[Any]
    v_head: Optional[Any]


class ValueGuidedServer:
    """Decode-time policy for ILQL/CQL/MC-class checkpoints."""

    def __init__(
        self,
        core: LMCore,
        q_head: nn.Module,
        v_head: Optional[nn.Module],
        tokenizer,
        beta: float = 8.0,
        share_trunk: bool = False,
    ):
        self.core = core
        self.q_head = q_head
        self.v_head = v_head
        self.tokenizer = tokenizer
        self.beta = beta
        self.share_trunk = share_trunk

    def _make_guided_logits_fn(self, params: ValueRLParams, total_len: int, batch: int):
        config = self.core.config
        module = self.core.module
        run_pi_beta = params.pi_beta is not None and not self.share_trunk

        def trunk(p, tokens, attn_mask, position_ids, cache):
            logits, hidden, cache = module.apply(
                {"params": p},
                tokens,
                attention_mask=attn_mask,
                position_ids=position_ids,
                cache=cache,
                deterministic=True,
            )
            return logits, hidden, cache

        def logits_fn(tokens, attn_mask, carry):
            pi_cache, base_cache, next_pos = carry
            T = tokens.shape[1]
            cache_len = base_cache.max_len
            if attn_mask.shape[1] < cache_len:
                attn_mask = jnp.pad(
                    attn_mask, ((0, 0), (0, cache_len - attn_mask.shape[1]))
                )
            if T > 1:
                prefix = attn_mask[:, :T]
                position_ids = jnp.clip(jnp.cumsum(prefix, axis=1) - 1, 0, None)
                next_pos = prefix.sum(axis=1)
            else:
                position_ids = next_pos[:, None]
                next_pos = next_pos + 1

            base_logits, hidden, base_cache = trunk(
                params.base, tokens, attn_mask, position_ids, base_cache
            )
            q1 = self.q_head.apply({"params": params.q1_head}, hidden)
            if params.q2_head is not None:
                q2 = self.q_head.apply({"params": params.q2_head}, hidden)
                q = jnp.minimum(q1, q2)
            else:
                q = q1

            if run_pi_beta:
                pi_logits, _, pi_cache = trunk(
                    params.pi_beta, tokens, attn_mask, position_ids, pi_cache
                )
                logits = pi_logits.astype(jnp.float32) + self.beta * q.astype(jnp.float32)
            elif self.share_trunk and params.pi_beta is None:
                # shared trunk: base logits ARE π_β's (same params)
                logits = base_logits.astype(jnp.float32) + self.beta * q.astype(jnp.float32)
            elif self.share_trunk:
                logits = base_logits.astype(jnp.float32) + self.beta * q.astype(jnp.float32)
            else:
                logits = self.beta * q.astype(jnp.float32)

            logits = mask_pad_logits(logits, config.vocab_size)
            return logits, (pi_cache, base_cache, next_pos)

        base_cache = KVCache.init(config, batch, total_len)
        pi_cache = KVCache.init(config, batch, total_len) if run_pi_beta else base_cache
        return logits_fn, (pi_cache, base_cache, jnp.zeros((batch,), jnp.int32))

    @partial(jax.jit, static_argnums=(0, 4))
    def generate(
        self,
        params: ValueRLParams,
        prompt_ids: jax.Array,  # [B, T] LEFT-padded
        prompt_mask: jax.Array,
        sampling: SamplingConfig,
        key: jax.Array = None,
    ) -> Tuple[jax.Array, jax.Array]:
        B, T = prompt_ids.shape
        logits_fn, carry = self._make_guided_logits_fn(
            params, T + sampling.max_new_tokens, B
        )
        return generate(logits_fn, carry, prompt_ids, prompt_mask, key, sampling)

    def generate_from_strs(
        self,
        params: ValueRLParams,
        prompts: Sequence[str],
        max_input_length: int,
        sampling: SamplingConfig,
        key: jax.Array,
    ) -> List[str]:
        tok = self.tokenizer
        ids = block_sequences(
            [tok.encode(p) for p in prompts],
            tok.pad_token_id,
            np.int32,
            BlockingStrategy(Padding.LEFT, Truncation.LEFT, max_input_length),
        )
        ids, B = _bucket_batch(ids)
        mask = (ids != tok.pad_token_id).astype(jnp.int32)
        tokens, token_mask = self.generate(params, ids, mask, sampling, key)
        outs = []
        for row, mrow in zip(np.asarray(tokens)[:B], np.asarray(token_mask)[:B]):
            outs.append(tok.decode([int(t) for t, m in zip(row, mrow) if m]))
        return outs

    @partial(jax.jit, static_argnums=(0, 4))
    def generate_legal(
        self,
        params: ValueRLParams,
        prompt_ids: jax.Array,
        prompt_mask: jax.Array,
        sampling: SamplingConfig,
        key: jax.Array,
        candidates: jax.Array,  # [B, P, L]
        candidate_mask: jax.Array,  # [B, P]
    ) -> Tuple[jax.Array, jax.Array]:
        """Guided decode constrained to a per-row legal proposal set
        (models/generation.py::generate_constrained)."""
        B, T = prompt_ids.shape
        logits_fn, carry = self._make_guided_logits_fn(
            params, T + sampling.max_new_tokens, B
        )
        return generate_constrained(
            logits_fn, carry, prompt_ids, prompt_mask, key, sampling,
            candidates, candidate_mask,
        )

    def generate_from_strs_legal(
        self,
        params: ValueRLParams,
        prompts: Sequence[str],
        proposals: Sequence[Sequence[str]],  # legal action strings per prompt
        max_input_length: int,
        sampling: SamplingConfig,
        key: jax.Array,
        max_proposals: Optional[int] = None,
        max_proposal_len: Optional[int] = None,
    ) -> List[str]:
        """generate_from_strs with decoding masked to each prompt's legal
        action set. Proposal strings should end with the protocol
        terminator (e.g. '\\n') so a completed action emits eos.

        max_proposals/max_proposal_len pin the padded (P, L) shapes so the
        jitted decode specializes once per shape family instead of per
        position pool (legal-move counts vary per chess position)."""
        tok = self.tokenizer
        ids = block_sequences(
            [tok.encode(p) for p in prompts],
            tok.pad_token_id,
            np.int32,
            BlockingStrategy(Padding.LEFT, Truncation.LEFT, max_input_length),
        )
        ids, B = _bucket_batch(ids)
        Bp = ids.shape[0]
        tokenized = [
            [tok.encode(a) for a in props] for props in proposals
        ]
        P = max_proposals or max(1, max(len(p) for p in tokenized))
        L = max_proposal_len or max(
            1, max((len(a) for p in tokenized for a in p), default=1)
        )
        cands = np.full((Bp, P, L), tok.pad_token_id, np.int32)
        cmask = np.zeros((Bp, P), bool)
        for i, props in enumerate(tokenized):
            for j, a in enumerate(props[:P]):
                a = a[:L]
                cands[i, j, : len(a)] = a
                cmask[i, j] = True
        tokens, token_mask = self.generate_legal(
            params, ids, (ids != tok.pad_token_id).astype(jnp.int32),
            sampling, key, jnp.asarray(cands), jnp.asarray(cmask),
        )
        return [
            tok.decode([int(t) for t, m in zip(row, mrow) if m])
            for row, mrow in zip(np.asarray(tokens)[:B], np.asarray(token_mask)[:B])
        ]


class LMServer:
    """Plain-LM serving (BC policies, oracle LMs)."""

    def __init__(self, core: LMCore, tokenizer):
        self.core = core
        self.tokenizer = tokenizer

    @partial(jax.jit, static_argnums=(0, 4))
    def generate(self, params, prompt_ids, prompt_mask, sampling: SamplingConfig, key):
        B, T = prompt_ids.shape
        logits_fn, carry = self.core.make_lm_logits_fn(
            params, T + sampling.max_new_tokens, B
        )
        return generate(logits_fn, carry, prompt_ids, prompt_mask, key, sampling)

    def generate_from_strs(
        self,
        params,
        prompts: Sequence[str],
        max_input_length: int,
        sampling: SamplingConfig,
        key: jax.Array,
    ) -> List[str]:
        tok = self.tokenizer
        ids = block_sequences(
            [tok.encode(p) for p in prompts],
            tok.pad_token_id,
            np.int32,
            BlockingStrategy(Padding.LEFT, Truncation.LEFT, max_input_length),
        )
        ids, B = _bucket_batch(ids)
        mask = (ids != tok.pad_token_id).astype(jnp.int32)
        tokens, token_mask = self.generate(params, ids, mask, sampling, key)
        return [
            tok.decode([int(t) for t, m in zip(row, mrow) if m])
            for row, mrow in zip(np.asarray(tokens)[:B], np.asarray(token_mask)[:B])
        ]


class Seq2SeqServer:
    """Encoder-decoder (T5) serving — the reference's T5Inference oracle
    role (twenty_questions/env/oracle.py:8-9). Same generate_from_strs
    surface as LMServer, so LMOracle/LMGuessCityOracle take it directly;
    the prompt goes to the encoder and decoding starts from
    decoder_start_token_id."""

    def __init__(self, core, tokenizer):
        self.core = core  # models.encdec.EncDecCore
        self.tokenizer = tokenizer

    @partial(jax.jit, static_argnums=(0, 4))
    def generate(self, params, enc_ids, enc_mask, sampling: SamplingConfig, key):
        B = enc_ids.shape[0]
        cfg = self.core.config
        logits_fn, carry = self.core.make_seq2seq_logits_fn(
            params, enc_ids, enc_mask, 1 + sampling.max_new_tokens
        )
        start = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
        return generate(
            logits_fn, carry, start, jnp.ones((B, 1), jnp.int32), key, sampling
        )

    def generate_from_strs(
        self,
        params,
        prompts: Sequence[str],
        max_input_length: int,
        sampling: SamplingConfig,
        key: jax.Array,
    ) -> List[str]:
        tok = self.tokenizer
        # encoder input: RIGHT padding keeps real tokens contiguous from
        # position 0 (relative-position buckets unaffected by pad slots)
        ids = block_sequences(
            [tok.encode(p) for p in prompts],
            tok.pad_token_id,
            np.int32,
            BlockingStrategy(Padding.RIGHT, Truncation.LEFT, max_input_length),
        )
        ids, B = _bucket_batch(ids)
        mask = (ids != tok.pad_token_id).astype(jnp.int32)
        tokens, token_mask = self.generate(params, ids, mask, sampling, key)
        return [
            tok.decode([int(t) for t, m in zip(row, mrow) if m])
            for row, mrow in zip(np.asarray(tokens)[:B], np.asarray(token_mask)[:B])
        ]


@dataclass
class GenerationPolicy(BatchedTextPolicy):
    """histories → generate → append Text(output, True)
    (value_rl_base/gpt2/interface.py:281-330). `generate_batch(prompts,
    key) -> outputs` abstracts over LM vs value-guided serving."""

    generate_batch: Callable[[List[str], jax.Array], List[str]]
    key: jax.Array
    in_str_process: Optional[Callable[[str], str]] = None
    out_str_process: Optional[Callable[[str], str]] = None

    def act(
        self,
        text_history: List[Optional[TextHistory]],
        done: Optional[List[bool]] = None,
    ) -> List[Optional[TextHistory]]:
        if done is None:
            done = [False] * len(text_history)
        live_idx = [i for i, d in enumerate(done) if not d]
        if not live_idx:
            return [None] * len(text_history)
        proc_in = self.in_str_process or (lambda s: s)
        proc_out = self.out_str_process or (lambda s: s)
        prompts = [proc_in(text_history_to_str(text_history[i])) for i in live_idx]
        self.key, step_key = jax.random.split(self.key)
        outputs = self.generate_batch(prompts, step_key)
        results: List[Optional[TextHistory]] = [None] * len(text_history)
        for i, raw_out, prompt in zip(live_idx, outputs, prompts):
            out = proc_out(strip_prompt_from_completion(prompt, raw_out))
            results[i] = text_history[i] + (Text(out, True),)
        return results


# ---------------- rerankers ----------------

# Jitted score programs, memoized per (core, heads, weights): each
# factory call used to create a fresh jax.jit, so gates that rebuild the
# score fn every eval (chess rerank_mate_rate, maze reranker_acc)
# retraced the full trunk forward per evaluation. Values hold strong
# refs to the keyed modules so ids are never recycled while cached.
_SCORE_JIT_CACHE: dict = {}


def _memoized_score_jit(kind, modules, extra_key, build):
    key = (kind, tuple(id(m) for m in modules), extra_key)
    hit = _SCORE_JIT_CACHE.get(key)
    if hit is None:
        hit = (build(), modules)
        _SCORE_JIT_CACHE[key] = hit
    return hit[0]


def score_action_tokens(
    values: jax.Array,  # [b, t-1] per-token scores at positions x[:-1]
    should_take_action: jax.Array,  # [b, t-1]
    attention_mask: jax.Array,  # [b, t-1]
) -> jax.Array:
    """Σ over action tokens → [b]."""
    mask = should_take_action.astype(jnp.float32) * attention_mask
    return (values * mask).sum(axis=1)


def make_ilql_score_fn(
    core: LMCore,
    q_head: nn.Module,
    v_head: nn.Module,
    params: ValueRLParams,
    pad_token_id: int,
    value_weight: float = 1.0,
    logit_weight: Optional[float] = None,
    length_normalize: bool = False,
):
    """score = Σ_action value_weight·(min(Q1,Q2)−V) + logit_weight·logπ_β
    (ilql/gpt2/score_fn.py:11-68).

    length_normalize divides by the action-token count (mean advantage).
    The reference's raw Σ is length-fair only when every candidate spans
    the same token count; in dialog tasks candidates vary widely and with
    per-token advantages slightly negative the Σ systematically favors
    SHORT candidates (the 20Q rerank regression diagnosed in PERF_NOTES
    r5) — mean advantage is the length-independent analogue, mirroring
    make_mc_score_fn.

    Params are jit ARGUMENTS, not closure captures: captured params embed
    as HLO constants, and at GPT-2-small scale (~1.6GB of weights) that
    blows the remote-compile request size limit (HTTP 413). The jitted
    program is memoized per (core, heads, weights) so repeated factory
    calls reuse the compiled step."""
    has_pi = params.pi_beta is not None
    has_q2 = params.q2_head is not None

    def build():
        @jax.jit
        def _score(p: ValueRLParams, input_ids: jax.Array, action_mask: jax.Array) -> jax.Array:
            attention_mask, position_ids = initialize_attn_mask_pos_ids(input_ids, pad_token_id)
            _, hidden = core.forward(p.base, input_ids, attention_mask, position_ids)
            nxt = input_ids[:, 1:][..., None]
            q1 = jnp.take_along_axis(
                q_head.apply({"params": p.q1_head}, hidden)[:, :-1], nxt, axis=2
            ).squeeze(2)
            if p.q2_head is not None:
                q2 = jnp.take_along_axis(
                    q_head.apply({"params": p.q2_head}, hidden)[:, :-1], nxt, axis=2
                ).squeeze(2)
                q = jnp.minimum(q1, q2)
            else:
                q = q1
            v = v_head.apply({"params": p.v_head}, hidden)[:, :-1].squeeze(2)
            total = value_weight * (q - v)
            if logit_weight is not None and p.pi_beta is not None:
                logits, _ = core.forward(
                    p.pi_beta, input_ids, attention_mask, position_ids
                )
                logprobs = jax.nn.log_softmax(
                    mask_pad_logits(logits[:, :-1].astype(jnp.float32), core.config.vocab_size),
                    axis=-1,
                )
                logpi = jnp.take_along_axis(logprobs, nxt, axis=2).squeeze(2)
                total = total + logit_weight * logpi
            out = score_action_tokens(
                total, action_mask[:, 1:], attention_mask[:, 1:].astype(jnp.float32)
            )
            if length_normalize:
                n = (
                    action_mask[:, 1:].astype(jnp.float32)
                    * attention_mask[:, 1:].astype(jnp.float32)
                ).sum(axis=1)
                out = out / jnp.maximum(n, 1.0)
            return out

        return _score

    _score = _memoized_score_jit(
        "ilql", (core, q_head, v_head),
        (pad_token_id, value_weight, logit_weight, has_pi, has_q2,
         length_normalize), build,
    )

    def score(input_ids: jax.Array, action_mask: jax.Array) -> jax.Array:
        return _score(params, input_ids, action_mask)

    return score


def make_mc_score_fn(
    core: LMCore,
    q_head: nn.Module,
    params: ValueRLParams,
    pad_token_id: int,
    length_normalize: bool = False,
):
    """score = Σ_action Q (mc_returns/score_fn.py:10-60). With a twin-Q
    bundle (q2_head set — the CQL case, ILQL-minus-V) scores Σ min(Q1,Q2).

    length_normalize divides by the action-token count (mean-Q). The
    reference's Σ is unbiased only because its GPT-2 BPE gives every maze
    proposal the same token count; under the byte tokenizer proposals
    range 8-11 tokens and with Q<0 the raw Σ systematically favors SHORT
    proposals (measured: rerank acc 0.04 vs guided 1.0 on the maze MC
    gate) — mean-Q is the tokenizer-independent analogue."""
    has_q2 = params.q2_head is not None

    def build():
        @jax.jit
        def _score(p: ValueRLParams, input_ids: jax.Array, action_mask: jax.Array) -> jax.Array:
            attention_mask, position_ids = initialize_attn_mask_pos_ids(input_ids, pad_token_id)
            _, hidden = core.forward(p.base, input_ids, attention_mask, position_ids)
            nxt = input_ids[:, 1:][..., None]
            q = jnp.take_along_axis(
                q_head.apply({"params": p.q1_head}, hidden)[:, :-1], nxt, axis=2
            ).squeeze(2)
            if p.q2_head is not None:
                q2 = jnp.take_along_axis(
                    q_head.apply({"params": p.q2_head}, hidden)[:, :-1], nxt, axis=2
                ).squeeze(2)
                q = jnp.minimum(q, q2)
            total = score_action_tokens(
                q, action_mask[:, 1:], attention_mask[:, 1:].astype(jnp.float32)
            )
            if length_normalize:
                n = (
                    action_mask[:, 1:].astype(jnp.float32)
                    * attention_mask[:, 1:].astype(jnp.float32)
                ).sum(axis=1)
                total = total / jnp.maximum(n, 1.0)
            return total

        return _score

    _score = _memoized_score_jit(
        "mc", (core, q_head), (pad_token_id, has_q2, length_normalize), build
    )

    def score(input_ids: jax.Array, action_mask: jax.Array) -> jax.Array:
        return _score(params, input_ids, action_mask)

    return score


def make_logprob_score_fn(core: LMCore, params, pad_token_id: int):
    """score = Σ_action logπ (BC/PPO reranker, ppo/score_fn.py:10-126)."""

    def build():
        @jax.jit
        def _score(p, input_ids: jax.Array, action_mask: jax.Array) -> jax.Array:
            attention_mask, position_ids = initialize_attn_mask_pos_ids(input_ids, pad_token_id)
            logits, _ = core.forward(p, input_ids, attention_mask, position_ids)
            logprobs = jax.nn.log_softmax(
                mask_pad_logits(logits[:, :-1].astype(jnp.float32), core.config.vocab_size),
                axis=-1,
            )
            logpi = jnp.take_along_axis(
                logprobs, input_ids[:, 1:][..., None], axis=2
            ).squeeze(2)
            return score_action_tokens(
                logpi, action_mask[:, 1:], attention_mask[:, 1:].astype(jnp.float32)
            )

        return _score

    _score = _memoized_score_jit("logprob", (core,), (pad_token_id,), build)

    def score(input_ids: jax.Array, action_mask: jax.Array) -> jax.Array:
        return _score(params, input_ids, action_mask)

    return score


@dataclass
class ReRankerPolicy(BatchedTextPolicy):
    """Score a fixed proposal set per history and pick argmax
    (ppo/reranker_policy.py:5-18). `proposal_fn(history) -> [history+action]`;
    `score_batch(histories) -> scores`."""

    proposal_fn: Callable[[TextHistory], List[TextHistory]]
    score_batch: Callable[[List[TextHistory]], np.ndarray]
    sample: bool = False
    temperature: float = 1.0
    rng: Optional[np.random.Generator] = None

    def act(self, text_history, done=None):
        if done is None:
            done = [False] * len(text_history)
        results: List[Optional[TextHistory]] = [None] * len(text_history)
        live = [i for i, d in enumerate(done) if not d]
        if not live:
            return results
        all_proposals: List[TextHistory] = []
        spans = []
        for i in live:
            props = self.proposal_fn(text_history[i])
            spans.append((len(all_proposals), len(all_proposals) + len(props)))
            all_proposals.extend(props)
        scores = np.asarray(self.score_batch(all_proposals))
        for i, (s, e) in zip(live, spans):
            sub = scores[s:e]
            if self.sample:
                rng = self.rng or np.random.default_rng()
                z = sub / self.temperature
                p = np.exp(z - z.max())
                p /= p.sum()
                choice = rng.choice(len(sub), p=p)
            else:
                choice = int(np.argmax(sub))
            results[i] = all_proposals[s + choice]
        return results


def tokenize_histories_for_scoring(
    histories: List[TextHistory],
    tokenizer,
    max_length: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (input_ids [b,t], action_mask [b,t]); padded RIGHT, truncated LEFT."""
    from lmrl_gym_tpu.text.frames import TokenHistory

    token_histories = [
        TokenHistory.from_text_history(h, tokenizer) for h in histories
    ]
    strategy = BlockingStrategy(Padding.RIGHT, Truncation.LEFT, max_length)
    ids = block_sequences(
        [th.tokens for th in token_histories], tokenizer.pad_token_id, np.int32, strategy
    )
    am = block_sequences(
        [th.is_action for th in token_histories], False, np.bool_, strategy
    )
    return jnp.asarray(ids), jnp.asarray(am)
