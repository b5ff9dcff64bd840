"""Exact-value unit tests for the CL loss terms (SURVEY.md §4: each CL loss
gets exact-value tests in JAX)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lifelong_nnunet_tpu.ops.cl_losses import (
    accumulate_entropy_histogram, entropy, ewc_penalty, local_pod_loss,
    lwf_distill_loss, median_entropy_thresholds, mib_loss, normalize_scores,
    plop_pseudo_targets, pod_embedding, quadratic_penalty, rw_online_update,
    rw_penalty, unbiased_cross_entropy, unbiased_kd_loss)


def test_ewc_penalty_exact():
    params = {"a": jnp.array([1.0, 2.0]), "b": jnp.array([3.0])}
    state = {"task1": {"fisher": {"a": jnp.array([2.0, 1.0]), "b": jnp.array([4.0])},
                       "params": {"a": jnp.array([0.0, 0.0]), "b": jnp.array([1.0])}}}
    # λ/2 * (2*1 + 1*4 + 4*4) = 0.4/2 * 22 = 4.4
    val = float(ewc_penalty(params, state, lam=0.4))
    np.testing.assert_allclose(val, 4.4, rtol=1e-6)


def test_ewc_penalty_mask():
    params = {"a": jnp.array([1.0]), "vit/n": jnp.array([2.0])}
    state = {"t": {"fisher": {"a": jnp.array([1.0]), "vit/n": jnp.array([1.0])},
                   "params": {"a": jnp.array([0.0]), "vit/n": jnp.array([0.0])}}}
    mask = {"a": False, "vit/n": True}
    # only vit/n: 0.5 * 1 * 4 = 2
    np.testing.assert_allclose(float(ewc_penalty(params, state, 1.0, mask)), 2.0)


def test_ewc_multiple_tasks_sum():
    params = {"a": jnp.array([2.0])}
    t = {"fisher": {"a": jnp.array([1.0])}, "params": {"a": jnp.array([0.0])}}
    one = float(ewc_penalty(params, {"t1": t}, 1.0))
    two = float(ewc_penalty(params, {"t1": t, "t2": t}, 1.0))
    np.testing.assert_allclose(two, 2 * one)


def test_rw_penalty_no_half():
    params = {"a": jnp.array([1.0])}
    # λ (F+S)(θ-θ*)^2 = 0.4 * (2+1) * 1 = 1.2 (no 1/2 factor, unlike EWC)
    val = rw_penalty(params, {"a": jnp.array([2.0])}, {"a": jnp.array([1.0])},
                     {"a": jnp.array([0.0])}, lam=0.4)
    np.testing.assert_allclose(float(val), 1.2, rtol=1e-6)


def test_rw_online_update():
    fisher = {"a": jnp.array([1.0])}
    scores = {"a": jnp.array([0.0])}
    grads = {"a": jnp.array([2.0])}
    prev_p = {"a": jnp.array([0.0])}
    curr_p = {"a": jnp.array([1.0])}
    f2, s2 = rw_online_update(fisher, scores, grads, prev_p, curr_p,
                              loss_prev=2.0, loss_curr=1.0, alpha=0.9)
    # F = 0.9*4 + 0.1*1 = 3.7
    np.testing.assert_allclose(np.asarray(f2["a"]), [3.7], rtol=1e-6)
    # S += (2-1)/(0.5*3.7*1 + eps) = 0.5405
    np.testing.assert_allclose(np.asarray(s2["a"]), [1.0 / 1.85], rtol=1e-4)
    # negative Δloss clamps to 0
    _, s3 = rw_online_update(fisher, scores, grads, prev_p, curr_p, 1.0, 2.0)
    np.testing.assert_allclose(np.asarray(s3["a"]), [0.0])


def test_normalize_scores():
    s = normalize_scores({"a": jnp.array([0.0, 5.0]), "b": jnp.array([10.0])})
    np.testing.assert_allclose(np.asarray(s["a"]), [0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s["b"]), [1.0], atol=1e-6)


def test_lwf_zero_when_equal():
    logits = jnp.asarray(np.random.RandomState(0).normal(size=(2, 4, 4, 3)))
    assert float(lwf_distill_loss([logits], [logits])) < 1e-6
    other = logits + 1.0 * jnp.asarray(np.random.RandomState(1).normal(size=logits.shape))
    assert float(lwf_distill_loss([logits], [other])) > 1e-3


def test_unbiased_ce_reduces_to_ce_with_old_eq_1():
    """With old_num_classes == 1 only the background absorbs itself, so the
    unbiased CE must equal plain CE (reference crossentropy.py:25-45)."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 3, size=(2, 4, 4)))
    from lifelong_nnunet_tpu.ops.losses import cross_entropy_loss
    ub = float(unbiased_cross_entropy(logits, target, old_num_classes=1))
    ce = float(cross_entropy_loss(logits, target))
    np.testing.assert_allclose(ub, ce, rtol=1e-5)


def test_unbiased_ce_folds_old_classes():
    """Background target must not be punished for mass on OLD classes —
    old structures are annotated background on a new task (MiB)."""
    logits = jnp.array([[[-10.0, 100.0, -10.0]]])  # all mass on OLD class 1
    target = jnp.array([[0]])
    v = float(unbiased_cross_entropy(logits, target, old_num_classes=2))
    assert v < 1e-3  # p(bg ∪ old) ≈ 1
    # mass on a NEW class where the label says background IS punished
    logits_new = jnp.array([[[-10.0, -10.0, 100.0]]])
    assert float(unbiased_cross_entropy(logits_new, target, old_num_classes=2)) > 10


def test_unbiased_kd_perfect_match():
    rng = np.random.RandomState(0)
    t = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    teacher = jnp.asarray(t)
    # student that reproduces teacher's old-class distribution exactly
    v_same = float(unbiased_kd_loss(teacher, teacher, old_num_classes=3, alpha=1.0))
    v_diff = float(unbiased_kd_loss(teacher + 5 * jnp.asarray(rng.normal(size=t.shape).astype(np.float32)),
                                    teacher, old_num_classes=3, alpha=1.0))
    # matching student attains the entropy lower bound (scaled by the
    # reference's 1/teacher-channel-count); mismatching is higher
    probs = jax.nn.softmax(teacher, axis=-1)
    ent = float(-jnp.mean(jnp.sum(probs * jax.nn.log_softmax(teacher, -1), axis=-1))) / 3
    np.testing.assert_allclose(v_same, ent, rtol=1e-5)
    assert v_diff > v_same


def test_mib_loss_runs():
    rng = np.random.RandomState(0)
    out = [jnp.asarray(rng.normal(size=(1, 8, 8, 8, 3)).astype(np.float32))]
    tout = [jnp.asarray(rng.normal(size=(1, 8, 8, 8, 3)).astype(np.float32))]
    tgt = [jnp.asarray(rng.randint(0, 3, size=(1, 8, 8, 8)))]
    v = float(mib_loss(out, tout, tgt[0], np.array([1.0]), tgt, old_num_classes=3))
    assert np.isfinite(v) and v > 0


def test_entropy_bounds():
    # the reference's entropy takes the channel MEAN, so uniform -> 1/C
    uniform = jnp.ones((1, 4)) / 4
    peaked = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(entropy(uniform)[0]), 0.25, rtol=1e-4)
    assert float(entropy(peaked)[0]) < 1e-4


def test_pod_embedding_shapes_and_sensitivity():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    e = pod_embedding(a, scales=2)
    assert e.shape[0] == 2 and e.ndim == 2
    # scale-0 embedding = global per-axis means -> identical for equal inputs
    assert float(jnp.abs(pod_embedding(a) - pod_embedding(a)).max()) == 0
    b = a + 1.0
    assert float(jnp.abs(pod_embedding(a) - pod_embedding(b)).max()) > 0.5


def test_local_pod_loss():
    rng = np.random.RandomState(0)
    taps = {"enc0": jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))}
    assert float(local_pod_loss(taps, taps)) == 0.0
    taps2 = {"enc0": taps["enc0"] + 2.0}
    assert float(local_pod_loss(taps, taps2)) > 0.0
    assert float(local_pod_loss(taps, {})) == 0.0  # no common taps


def test_plop_pseudo_targets():
    # teacher confidently predicts class 1 everywhere
    tl = jnp.zeros((1, 2, 2, 3)).at[..., 1].set(50.0)
    target = jnp.array([[[0, 0], [2, 0]]])
    # confidence statistic range is [0, 1/(C·log C)] ≈ [0, 0.303] for C=3:
    # a peaked teacher sits near 0, a uniform one at the top of the range
    thr = jnp.array([0.15, 0.15, 0.15])
    pseudo, factor = plop_pseudo_targets(target, tl, thr, 3)
    # bg voxels adopt teacher label 1; non-bg target kept
    assert pseudo[0, 0, 0] == 1 and pseudo[0, 1, 0] == 2
    np.testing.assert_allclose(float(factor), 1.0)
    # high-entropy teacher -> bg becomes ignore
    tl_unif = jnp.zeros((1, 2, 2, 3))
    pseudo2, factor2 = plop_pseudo_targets(target, tl_unif, thr, 3)
    assert pseudo2[0, 0, 0] == -1
    np.testing.assert_allclose(float(factor2), 0.0)


def test_entropy_histogram_and_median():
    rng = np.random.RandomState(0)
    hist = jnp.zeros((3, 100))
    tl = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32) * 3)
    tgt = jnp.zeros((2, 8, 8), jnp.int32)
    hist = accumulate_entropy_histogram(hist, tl, tgt, 3)
    assert float(hist.sum()) == 2 * 8 * 8
    thr = median_entropy_thresholds(hist, jnp.ones(3))
    assert thr.shape == (3,)
    assert float(thr.min()) >= 0 and float(thr.max()) <= 1.0
