"""Pure loss functions for all algorithms.

Semantics identical to the reference (file:line cited per function); the
mechanics differ where the reference is TPU-hostile: its "query indicator"
selection builds an [N, N+1] one-hot matrix and contracts it against the
flat values (ilql/base_interface.py:22-27) — an O(N²) matmul per selected
tensor. Here the same selection is a fill-gather (`jnp.take` with an
argwhere index vector), O(N), identical output.

Shift conventions (shared by every loss; reference docstrings
ilql/base_interface.py:30-41): values q/v are model outputs at positions
x[:-1]; token_ids / should_take_action / rewards are shifted x[1:]; all
arrays are [batch, time-1].
"""
from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
import optax

from lmrl_gym_tpu.core.logs import get_tensor_stats

Scalar = Union[float, jax.Array]


def select_at_mask(values_flat: jax.Array, mask_flat: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Gather `values_flat` at True positions of `mask_flat`, in order,
    zero-padded to full length. Returns (selected [N], sel_mask [N]).

    Replaces get_query_indicators (ilql/base_interface.py:22-27): identical
    output, O(N) gather instead of an O(N²) one-hot contraction.
    """
    N = mask_flat.shape[0]
    idxs = jnp.argwhere(mask_flat, size=N, fill_value=N)[:, 0]
    selected = jnp.take(values_flat, idxs, mode="fill", fill_value=0)
    sel_mask = (idxs < N).astype(values_flat.dtype)
    return selected * sel_mask, sel_mask


def next_state_mask(should_take_action: jax.Array) -> jax.Array:
    """[b, t] next-state indicator from a [b, t-1] action mask: the action
    mask with each row's first action cleared, plus an endpoint column
    (True iff the row has ≥1 action) — ilql/base_interface.py:57-61."""
    b = should_take_action.shape[0]
    first_action = jnp.argmax(should_take_action.astype(jnp.int32), axis=1)
    cleared = should_take_action.at[jnp.arange(b), first_action].set(False)
    endpoint = (should_take_action.sum(axis=1) > 0)[:, None]
    return jnp.concatenate((cleared, endpoint), axis=1)


def ilql_loss(
    q1: jax.Array,
    q2: jax.Array,
    v: jax.Array,
    v_final: jax.Array,  # [batch]
    target_q1: jax.Array,
    target_q2: jax.Array,
    q1_logits: jax.Array,  # [b, t-1, vocab]
    q2_logits: jax.Array,
    token_ids: jax.Array,
    attention_mask: jax.Array,
    should_take_action: jax.Array,
    rewards: jax.Array,
    *,
    gamma: Scalar,
    tau: Scalar,
    cql_weight: Scalar,
) -> Tuple[jax.Array, Any]:
    """Per-token implicit Q-learning loss (ilql/base_interface.py:29-119):
    Bellman L2 on both Q heads vs r + γ·V(next state), expectile-weighted
    V regression vs min(target Q), plus CQL cross-entropy on Q logits."""
    mask = should_take_action.astype(jnp.float32) * attention_mask
    # clamp: an all-dead batch (e.g. online windows past episode end) must
    # yield loss 0, not 0/0 = NaN gradients that corrupt the train state
    n = jnp.maximum(mask.sum(), 1.0)

    sta_flat = should_take_action.reshape(-1)
    q1_sel, sa_mask = select_at_mask(q1.reshape(-1), sta_flat)
    q2_sel, _ = select_at_mask(q2.reshape(-1), sta_flat)
    v_sel, _ = select_at_mask(v.reshape(-1), sta_flat)
    tq1_sel, _ = select_at_mask(target_q1.reshape(-1), sta_flat)
    tq2_sel, _ = select_at_mask(target_q2.reshape(-1), sta_flat)
    r_sel, _ = select_at_mask(rewards.reshape(-1), sta_flat)

    # V(next state): V at token positions plus a bootstrap column v_final
    vns_flat = jnp.concatenate((v, v_final[:, None]), axis=1).reshape(-1)
    ns_flat = next_state_mask(should_take_action).reshape(-1)
    vns_sel, ns_mask = select_at_mask(vns_flat, ns_flat)
    vns_sel = vns_sel[: q1_sel.shape[0]]
    ns_mask = ns_mask[: q1_sel.shape[0]]

    target = jax.lax.stop_gradient(r_sel + gamma * vns_sel)
    q1_loss = (optax.l2_loss(q1_sel, target) * sa_mask).sum() / n
    q2_loss = (optax.l2_loss(q2_sel, target) * sa_mask).sum() / n

    target_q_sel = jnp.minimum(tq1_sel, tq2_sel)
    expectile_ind = (target_q_sel >= v_sel).astype(jnp.float32)
    expectile_w = expectile_ind * tau + (1 - expectile_ind) * (1 - tau)
    v_loss = (
        optax.l2_loss(v_sel, jax.lax.stop_gradient(target_q_sel))
        * jax.lax.stop_gradient(expectile_w)
        * sa_mask
    ).sum() / n

    q1_cql = (mask * optax.softmax_cross_entropy_with_integer_labels(q1_logits, token_ids)).sum() / n
    q2_cql = (mask * optax.softmax_cross_entropy_with_integer_labels(q2_logits, token_ids)).sum() / n

    loss = q1_loss + q2_loss + v_loss + cql_weight * (q1_cql + q2_cql)

    logs = dict(
        losses=dict(
            total_loss=loss,
            q1_loss=q1_loss,
            q2_loss=q2_loss,
            v_loss=v_loss,
            q1_cql_loss=q1_cql,
            q2_cql_loss=q2_cql,
        ),
        q1=get_tensor_stats(q1_sel, mask=sa_mask, n=n),
        q2=get_tensor_stats(q2_sel, mask=sa_mask, n=n),
        v=get_tensor_stats(v_sel, mask=sa_mask, n=n),
        target_q=get_tensor_stats(target_q_sel, mask=sa_mask, n=n),
        vns=get_tensor_stats(vns_sel, mask=ns_mask, n=n),
        v_final=get_tensor_stats(v_final, mask=jnp.ones_like(v_final), n=v_final.shape[0]),
        rewards=get_tensor_stats(rewards, mask=mask, n=n),
    )
    return loss, logs


def cql_loss(
    q1: jax.Array,
    q2: jax.Array,
    target_q1: jax.Array,
    target_q2: jax.Array,
    target_q1_final: jax.Array,  # [batch]
    target_q2_final: jax.Array,  # [batch]
    q1_logits: jax.Array,
    q2_logits: jax.Array,
    token_ids: jax.Array,
    attention_mask: jax.Array,
    should_take_action: jax.Array,
    rewards: jax.Array,
    *,
    gamma: Scalar,
    cql_weight: Scalar,
) -> Tuple[jax.Array, Any]:
    """SARSA-style CQL (cql/base_interface.py:29-120): ILQL minus the V
    head — Bellman target is min over the *target Q at the next action*."""
    mask = should_take_action.astype(jnp.float32) * attention_mask
    n = jnp.maximum(mask.sum(), 1.0)

    sta_flat = should_take_action.reshape(-1)
    q1_sel, a_mask = select_at_mask(q1.reshape(-1), sta_flat)
    q2_sel, _ = select_at_mask(q2.reshape(-1), sta_flat)
    r_sel, _ = select_at_mask(rewards.reshape(-1), sta_flat)

    tq1_flat = jnp.concatenate((target_q1, target_q1_final[:, None]), axis=1).reshape(-1)
    tq2_flat = jnp.concatenate((target_q2, target_q2_final[:, None]), axis=1).reshape(-1)
    ns_flat = next_state_mask(should_take_action).reshape(-1)
    tq1ns_sel, ans_mask = select_at_mask(tq1_flat, ns_flat)
    tq2ns_sel, _ = select_at_mask(tq2_flat, ns_flat)
    tq1ns_sel = tq1ns_sel[: q1_sel.shape[0]]
    tq2ns_sel = tq2ns_sel[: q1_sel.shape[0]]
    ans_mask = ans_mask[: q1_sel.shape[0]]

    target_qns = jnp.minimum(tq1ns_sel, tq2ns_sel)
    target = jax.lax.stop_gradient(r_sel + gamma * target_qns)
    q1_loss = (optax.l2_loss(q1_sel, target) * a_mask).sum() / n
    q2_loss = (optax.l2_loss(q2_sel, target) * a_mask).sum() / n

    q1_cql = (mask * optax.softmax_cross_entropy_with_integer_labels(q1_logits, token_ids)).sum() / n
    q2_cql = (mask * optax.softmax_cross_entropy_with_integer_labels(q2_logits, token_ids)).sum() / n

    loss = q1_loss + q2_loss + cql_weight * (q1_cql + q2_cql)
    logs = dict(
        losses=dict(
            total_loss=loss,
            q1_loss=q1_loss,
            q2_loss=q2_loss,
            q1_cql_loss=q1_cql,
            q2_cql_loss=q2_cql,
        ),
        q1=get_tensor_stats(q1_sel, mask=a_mask, n=n),
        q2=get_tensor_stats(q2_sel, mask=a_mask, n=n),
        target_qns=get_tensor_stats(target_qns, mask=ans_mask, n=n),
        rewards=get_tensor_stats(rewards, mask=mask, n=n),
    )
    return loss, logs


def mc_loss(
    q: jax.Array,
    q_logits: jax.Array,
    token_ids: jax.Array,
    attention_mask: jax.Array,
    should_take_action: jax.Array,
    returns: jax.Array,
    *,
    cql_weight: Scalar,
) -> Tuple[jax.Array, Any]:
    """Reward-to-go Q regression + CQL (mc_returns/base_interface.py:19-60)."""
    mask = should_take_action.astype(jnp.float32) * attention_mask
    n = jnp.maximum(mask.sum(), 1.0)

    sta_flat = should_take_action.reshape(-1)
    q_sel, a_mask = select_at_mask(q.reshape(-1), sta_flat)
    ret_sel, _ = select_at_mask(returns.reshape(-1), sta_flat)

    q_loss = (optax.l2_loss(q_sel, jax.lax.stop_gradient(ret_sel)) * a_mask).sum() / n
    q_cql = (mask * optax.softmax_cross_entropy_with_integer_labels(q_logits, token_ids)).sum() / n

    loss = q_loss + cql_weight * q_cql
    logs = dict(
        losses=dict(total_loss=loss, q_loss=q_loss, q_cql_loss=q_cql),
        q=get_tensor_stats(q_sel, mask=a_mask, n=n),
        returns=get_tensor_stats(ret_sel, mask=a_mask, n=n),
    )
    return loss, logs


def ppo_loss(
    attention_mask: jax.Array,
    logprobs: jax.Array,
    values: jax.Array,
    should_take_action: jax.Array,
    old_logprobs: jax.Array,
    old_values: jax.Array,
    old_advantages: jax.Array,
    old_returns: jax.Array,
    *,
    cliprange_value: Scalar,
    cliprange: Scalar,
    value_loss_coef: Scalar,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Clipped PPO objective over action tokens
    (ppo/base_interface.py:72-142; trlx-derived)."""
    mask = should_take_action.astype(jnp.float32) * attention_mask
    n = jnp.maximum(mask.sum(), 1.0)

    values_clipped = jnp.clip(values, old_values - cliprange_value, old_values + cliprange_value)
    vf_loss1 = (values - old_returns) ** 2
    vf_loss2 = (values_clipped - old_returns) ** 2
    vf_loss = 0.5 * jnp.sum(jnp.maximum(vf_loss1, vf_loss2) * mask) / n
    vf_clipfrac = jnp.sum((vf_loss2 > vf_loss1).astype(jnp.float32) * mask) / n

    log_ratio = (logprobs - old_logprobs) * mask
    ratio = jnp.exp(log_ratio)
    # k3 unbiased KL estimate (http://joschu.net/blog/kl-approx.html)
    approx_kl = jnp.sum((ratio - 1) - log_ratio) / n

    pg_loss1 = -old_advantages * ratio
    pg_loss2 = -old_advantages * jnp.clip(ratio, 1.0 - cliprange, 1.0 + cliprange)
    pg_loss = jnp.sum(jnp.maximum(pg_loss1, pg_loss2) * mask) / n
    pg_clipfrac = jnp.sum((pg_loss2 > pg_loss1).astype(jnp.float32) * mask) / n

    loss = pg_loss + value_loss_coef * vf_loss

    logs = dict(
        losses=dict(total_loss=loss, policy_loss=pg_loss, value_loss=vf_loss),
        values=dict(
            get_tensor_stats(values, mask, n),
            values_error=jnp.sum(((values - old_returns) * mask) ** 2) / n,
            clipfrac=vf_clipfrac,
        ),
        old_values=get_tensor_stats(old_values, mask, n),
        returns=get_tensor_stats(old_returns, mask, n),
        policy=dict(approx_kl=approx_kl, clipfrac=pg_clipfrac),
        ratio=(ratio * mask).sum() / n,
        padding_percentage=n / mask.size,
    )
    return loss, logs


def masked_lm_loss(
    logits: jax.Array,  # [b, t, vocab] (positions x[:-1])
    target_ids: jax.Array,  # [b, t] (x[1:])
    attention_mask: jax.Array,  # [b, t]
    training_mask: jax.Array,  # [b, t] — 1 on tokens that contribute fully
    *,
    non_train_weight: Scalar = 0.0,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """LM cross-entropy with down-weighted non-training tokens.

    With non_train_weight=0 this is JaxSeq's loss_fn_mask (BC on action
    tokens only, SURVEY §2.7); with a float it is bc_loss's
    non_action_weight (algorithms/bc/core.py:27-42)."""
    token_losses = (
        optax.softmax_cross_entropy_with_integer_labels(logits, target_ids)
        * attention_mask
    )
    weights = training_mask + (1 - training_mask) * non_train_weight
    loss = (token_losses * weights).sum() / jnp.maximum(attention_mask.sum(), 1)
    return loss, {"loss": loss}


def whiten(xs: jax.Array, mask: jax.Array = None, shift_mean: bool = True) -> jax.Array:
    """Normalize to unit variance (ppo/base_interface.py:245-251)."""
    if mask is None:
        mean, var = jnp.mean(xs), jnp.var(xs)
    else:
        n = jnp.maximum(mask.sum(), 1)
        mean = (xs * mask).sum() / n
        var = (((xs - mean) ** 2) * mask).sum() / n
    out = (xs - mean) * jax.lax.rsqrt(var + 1e-8)
    if not shift_mean:
        out = out + mean
    return out


def gae_advantages_and_returns(
    state_values: jax.Array,  # [b, n] per action position
    next_state_values: jax.Array,  # [b, n]
    action_rewards: jax.Array,  # [b, n]
    *,
    gamma: Scalar,
    lam: Scalar,
    use_whitening: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """GAE over action positions as a reverse lax.scan (identical math to
    the reference's Python loop, ppo/base_interface.py:253-293)."""

    def step(lastgaelam, xs):
        sv, nsv, r = xs
        delta = r + gamma * nsv - sv
        lastgaelam = delta + gamma * lam * lastgaelam
        return lastgaelam, lastgaelam

    xs = (state_values.T, next_state_values.T, action_rewards.T)  # [n, b]
    _, adv_rev = jax.lax.scan(
        step, jnp.zeros(state_values.shape[0]), xs, reverse=True
    )
    advantages = adv_rev.T
    returns = advantages + state_values
    if use_whitening:
        advantages = whiten(advantages)
    return advantages, returns


def reward_to_go(action_rewards: jax.Array, *, gamma: Scalar) -> jax.Array:
    """Discounted reward-to-go over action positions [b, n] → [b, n]
    (mc_returns/data.py:10-14's cumprod/triu matrix, as a reverse scan)."""

    def step(acc, r):
        acc = r + gamma * acc
        return acc, acc

    _, rtg_rev = jax.lax.scan(
        step, jnp.zeros(action_rewards.shape[0]), action_rewards.T, reverse=True
    )
    return rtg_rev.T
