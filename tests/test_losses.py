"""Loss functions vs independent naive implementations.

The naive references below recompute each loss with explicit Python
loops / the reference's one-hot-indicator mechanics, so the optimized
gather-based versions are cross-checked against a second implementation
of the same math (reference semantics: ilql/base_interface.py:29-119,
cql/base_interface.py:29-120, mc_returns/base_interface.py:19-60,
ppo/base_interface.py:72-142,253-293).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmrl_gym_tpu.algos.losses import (
    cql_loss,
    gae_advantages_and_returns,
    ilql_loss,
    masked_lm_loss,
    mc_loss,
    next_state_mask,
    ppo_loss,
    reward_to_go,
    select_at_mask,
    whiten,
)


def one_hot_select(values_flat, mask_flat):
    """The reference's query-indicator selection (O(N²) one-hot matmul)."""
    N = mask_flat.shape[0]
    idxs = jnp.argwhere(mask_flat, size=N, fill_value=N)[:, 0]
    ind = jax.nn.one_hot(idxs, N + 1, dtype=jnp.float32)[:, :-1]
    return (ind * values_flat).sum(axis=1), (ind.sum(axis=1) > 0).astype(jnp.float32)


@pytest.mark.parametrize("seed", range(5))
def test_select_at_mask_matches_one_hot(seed):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    values = jax.random.normal(k1, (24,))
    mask = jax.random.bernoulli(k2, 0.4, (24,))
    sel_a, m_a = select_at_mask(values, mask)
    sel_b, m_b = one_hot_select(values, mask)
    np.testing.assert_allclose(np.asarray(sel_a), np.asarray(sel_b), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))


def test_next_state_mask():
    sta = jnp.asarray(
        [
            [False, True, False, True, False],
            [False, False, False, False, False],
            [True, True, True, False, False],
        ]
    )
    ns = np.asarray(next_state_mask(sta))
    # row 0: first action (idx1) cleared, idx3 stays, endpoint True
    np.testing.assert_array_equal(ns[0], [False, False, False, True, False, True])
    # row 1: no actions → all False, endpoint False
    np.testing.assert_array_equal(ns[1], [False] * 6)
    # row 2: first action cleared, idx1/2 stay, endpoint True
    np.testing.assert_array_equal(ns[2], [False, True, True, False, False, True])


def _rand_batch(seed, b=3, t=8, vocab=11):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 12)
    sta = jax.random.bernoulli(ks[0], 0.45, (b, t))
    # ensure at least one action per row (reference data always has some)
    sta = sta.at[:, 1].set(True)
    return dict(
        q1=jax.random.normal(ks[1], (b, t)),
        q2=jax.random.normal(ks[2], (b, t)),
        v=jax.random.normal(ks[3], (b, t)),
        v_final=jax.random.normal(ks[4], (b,)),
        target_q1=jax.random.normal(ks[5], (b, t)),
        target_q2=jax.random.normal(ks[6], (b, t)),
        q1_logits=jax.random.normal(ks[7], (b, t, vocab)),
        q2_logits=jax.random.normal(ks[8], (b, t, vocab)),
        token_ids=jax.random.randint(ks[9], (b, t), 0, vocab),
        attention_mask=jnp.ones((b, t), jnp.float32),
        should_take_action=sta,
        rewards=jax.random.normal(ks[10], (b, t)) * sta,
    )


def naive_ilql(d, gamma, tau, cql_weight):
    """Explicit-loop ILQL loss (flattened-batch selection order, matching
    the reference's flat one-hot mechanics)."""
    b, t = d["q1"].shape
    sta = np.asarray(d["should_take_action"])
    q1, q2, v = map(np.asarray, (d["q1"], d["q2"], d["v"]))
    tq1, tq2 = np.asarray(d["target_q1"]), np.asarray(d["target_q2"])
    rewards = np.asarray(d["rewards"])
    v_final = np.asarray(d["v_final"])
    n = sta.sum()

    # flat selections across the whole batch
    flat_sel = [(i, j) for i in range(b) for j in range(t) if sta[i, j]]
    # next-state positions: per row, actions minus first + endpoint (col t)
    vns_full = np.concatenate([v, v_final[:, None]], axis=1)
    ns = np.asarray(next_state_mask(d["should_take_action"]))
    flat_ns = [(i, j) for i in range(b) for j in range(t + 1) if ns[i, j]]

    q_loss1 = q_loss2 = v_loss = 0.0
    for k, (i, j) in enumerate(flat_sel):
        vns = vns_full[flat_ns[k]]
        target = rewards[i, j] + gamma * vns
        q_loss1 += 0.5 * (q1[i, j] - target) ** 2
        q_loss2 += 0.5 * (q2[i, j] - target) ** 2
        tq = min(tq1[i, j], tq2[i, j])
        w = tau if tq >= v[i, j] else (1 - tau)
        v_loss += w * 0.5 * (v[i, j] - tq) ** 2
    q_loss1, q_loss2, v_loss = q_loss1 / n, q_loss2 / n, v_loss / n

    def xent(logits, labels):
        logits = np.asarray(logits, np.float64)
        logz = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1, keepdims=True)[..., 0]
        return logz - np.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]

    cql1 = (sta * xent(d["q1_logits"], np.asarray(d["token_ids"]))).sum() / n
    cql2 = (sta * xent(d["q2_logits"], np.asarray(d["token_ids"]))).sum() / n
    return q_loss1 + q_loss2 + v_loss + cql_weight * (cql1 + cql2)


@pytest.mark.parametrize("seed", range(4))
def test_ilql_loss_matches_naive(seed):
    d = _rand_batch(seed)
    loss, logs = ilql_loss(
        **d, gamma=0.99, tau=0.7, cql_weight=0.01
    )
    expected = naive_ilql(d, 0.99, 0.7, 0.01)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    assert np.isfinite(float(logs["losses"]["v_loss"]))


@pytest.mark.parametrize("seed", range(3))
def test_cql_loss_matches_naive(seed):
    d = _rand_batch(seed + 50)
    tq1f = jax.random.normal(jax.random.PRNGKey(seed), (3,))
    tq2f = jax.random.normal(jax.random.PRNGKey(seed + 1), (3,))
    loss, _ = cql_loss(
        q1=d["q1"],
        q2=d["q2"],
        target_q1=d["target_q1"],
        target_q2=d["target_q2"],
        target_q1_final=tq1f,
        target_q2_final=tq2f,
        q1_logits=d["q1_logits"],
        q2_logits=d["q2_logits"],
        token_ids=d["token_ids"],
        attention_mask=d["attention_mask"],
        should_take_action=d["should_take_action"],
        rewards=d["rewards"],
        gamma=0.95,
        cql_weight=0.05,
    )
    # naive: same structure as ilql but Bellman target = min target-Q at
    # next action position
    b, t = d["q1"].shape
    sta = np.asarray(d["should_take_action"])
    n = sta.sum()
    tq1 = np.concatenate([np.asarray(d["target_q1"]), np.asarray(tq1f)[:, None]], axis=1)
    tq2 = np.concatenate([np.asarray(d["target_q2"]), np.asarray(tq2f)[:, None]], axis=1)
    ns = np.asarray(next_state_mask(d["should_take_action"]))
    flat_sel = [(i, j) for i in range(b) for j in range(t) if sta[i, j]]
    flat_ns = [(i, j) for i in range(b) for j in range(t + 1) if ns[i, j]]
    q1n, q2n, rew = np.asarray(d["q1"]), np.asarray(d["q2"]), np.asarray(d["rewards"])
    ql1 = ql2 = 0.0
    for k, (i, j) in enumerate(flat_sel):
        tqns = min(tq1[flat_ns[k]], tq2[flat_ns[k]])
        target = rew[i, j] + 0.95 * tqns
        ql1 += 0.5 * (q1n[i, j] - target) ** 2
        ql2 += 0.5 * (q2n[i, j] - target) ** 2

    def xent(logits, labels):
        logits = np.asarray(logits, np.float64)
        m = logits.max(-1, keepdims=True)
        logz = np.log(np.exp(logits - m).sum(-1)) + m[..., 0]
        return logz - np.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]

    cql1 = (sta * xent(d["q1_logits"], np.asarray(d["token_ids"]))).sum() / n
    cql2 = (sta * xent(d["q2_logits"], np.asarray(d["token_ids"]))).sum() / n
    expected = ql1 / n + ql2 / n + 0.05 * (cql1 + cql2)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_mc_loss():
    d = _rand_batch(7)
    returns = jax.random.normal(jax.random.PRNGKey(9), d["q1"].shape) * d["should_take_action"]
    loss, _ = mc_loss(
        q=d["q1"],
        q_logits=d["q1_logits"],
        token_ids=d["token_ids"],
        attention_mask=d["attention_mask"],
        should_take_action=d["should_take_action"],
        returns=returns,
        cql_weight=0.0,
    )
    sta = np.asarray(d["should_take_action"])
    n = sta.sum()
    expected = (0.5 * ((np.asarray(d["q1"]) - np.asarray(returns)) ** 2) * sta).sum() / n
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_ppo_loss_unclipped_region():
    """With old==new, ratio=1: pg_loss=-mean(adv), vf=0.5*mse."""
    b, t = 2, 6
    key = jax.random.PRNGKey(0)
    sta = jnp.ones((b, t))
    logprobs = jax.random.normal(key, (b, t))
    values = jax.random.normal(jax.random.PRNGKey(1), (b, t))
    adv = jax.random.normal(jax.random.PRNGKey(2), (b, t))
    ret = jax.random.normal(jax.random.PRNGKey(3), (b, t))
    loss, logs = ppo_loss(
        attention_mask=jnp.ones((b, t)),
        logprobs=logprobs,
        values=values,
        should_take_action=sta,
        old_logprobs=logprobs,
        old_values=values,
        old_advantages=adv,
        old_returns=ret,
        cliprange_value=0.2,
        cliprange=0.2,
        value_loss_coef=1.0,
    )
    expected_pg = -float(adv.mean())
    expected_vf = 0.5 * float(((values - ret) ** 2).mean())
    np.testing.assert_allclose(float(logs["losses"]["policy_loss"]), expected_pg, rtol=1e-5)
    np.testing.assert_allclose(float(logs["losses"]["value_loss"]), expected_vf, rtol=1e-5)
    np.testing.assert_allclose(float(logs["policy"]["approx_kl"]), 0.0, atol=1e-6)


def test_gae_matches_python_loop():
    b, n = 3, 7
    sv = np.random.RandomState(0).randn(b, n).astype(np.float32)
    nsv = np.random.RandomState(1).randn(b, n).astype(np.float32)
    r = np.random.RandomState(2).randn(b, n).astype(np.float32)
    gamma, lam = 0.99, 0.95

    lastgaelam = 0
    adv_rev = []
    for t in reversed(range(n)):
        delta = r[:, t] + gamma * nsv[:, t] - sv[:, t]
        lastgaelam = delta + gamma * lam * lastgaelam
        adv_rev.append(lastgaelam)
    expected_adv = np.stack(adv_rev[::-1], axis=1)
    expected_ret = expected_adv + sv

    adv, ret = gae_advantages_and_returns(
        jnp.asarray(sv), jnp.asarray(nsv), jnp.asarray(r),
        gamma=gamma, lam=lam, use_whitening=False,
    )
    np.testing.assert_allclose(np.asarray(adv), expected_adv, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), expected_ret, rtol=1e-5)


def test_reward_to_go():
    r = jnp.asarray([[1.0, 0.0, 2.0], [0.0, 1.0, 0.0]])
    rtg = reward_to_go(r, gamma=0.5)
    np.testing.assert_allclose(
        np.asarray(rtg), [[1 + 0.5 * 0.5 * 2, 0.5 * 2, 2.0], [0.5, 1.0, 0.0]], rtol=1e-6
    )


def test_whiten():
    x = jax.random.normal(jax.random.PRNGKey(0), (100,)) * 5 + 3
    w = whiten(x)
    assert abs(float(w.mean())) < 1e-4
    assert abs(float(w.std()) - 1.0) < 1e-2


def test_masked_lm_loss():
    vocab = 7
    logits = jnp.zeros((1, 4, vocab))
    targets = jnp.asarray([[1, 2, 3, 4]])
    mask = jnp.ones((1, 4))
    train_mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    loss, _ = masked_lm_loss(logits, targets, mask, train_mask, non_train_weight=0.0)
    np.testing.assert_allclose(float(loss), 2 * np.log(vocab) / 4, rtol=1e-5)
    loss_w, _ = masked_lm_loss(logits, targets, mask, train_mask, non_train_weight=1.0)
    np.testing.assert_allclose(float(loss_w), np.log(vocab), rtol=1e-5)
