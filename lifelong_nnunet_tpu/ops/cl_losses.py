"""Continual-learning loss terms — the mathematical core of every CL method.

Pure-JAX counterparts of the reference's loss classes (SURVEY.md §2.3,
``nnunet_ext/training/loss_functions/``):

  * EWC        (deep_supervision.py:15-83):   λ/2 Σ_t Σ_i F_i (θ_i − θ*_{t,i})²
  * RW         (deep_supervision.py:86-135):  λ Σ (F_i + S_i)(θ_i − θ*_i)²
  * LwF        (deep_supervision.py:138-214): T²·KL over previous heads' logits
  * MiB        (deep_supervision.py:383-416, knowledge_distillation.py:3-60,
                crossentropy.py): unbiased CE + unbiased KD
  * PLOP/POD   (deep_supervision.py:217-380, embeddings.py:3-42): entropy-
                thresholded pseudo-labels + multi-scale local POD distillation
  * Own1/Own2  (deep_supervision.py:419-621): hybrid combinations

Design: every term is a pure function of (params, cl_state, activations);
state (fisher, stored params, thresholds, teacher params) lives in a pytree
that never leaves HBM.  Parameters are flat ``{path: array}`` dicts so the
name-filtered EWC variants (ewc_ln / ewc_vit / ewc_unet) are boolean masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------- EWC/RW

def quadratic_penalty(params_flat: dict, anchors: list, lam: float,
                      mask: dict | None = None, use_half: bool = True):
    """Σ over anchors of lam(/2) Σ_i w_i (θ_i − θ*_i)².  ``anchors`` is a list
    of {"weight": flat dict (fisher or fisher+score), "params": flat dict}.
    ``mask``: optional flat {path: bool} restricting regularized params."""
    total = 0.0
    factor = lam / 2.0 if use_half else lam
    for anchor in anchors:
        for k, theta in params_flat.items():
            if mask is not None and not mask.get(k, True):
                continue
            if k not in anchor["params"]:
                continue
            w = anchor["weight"][k]
            diff = theta.astype(jnp.float32) - anchor["params"][k].astype(jnp.float32)
            total = total + jnp.sum(w * diff * diff)
    return factor * total


def ewc_penalty(params_flat: dict, ewc_state: dict, lam: float,
                mask: dict | None = None):
    """EWC over all previous tasks (reference formula at
    deep_supervision.py:80)."""
    anchors = [{"weight": t["fisher"], "params": t["params"]}
               for t in ewc_state.values()]
    return quadratic_penalty(params_flat, anchors, lam, mask, use_half=True)


def rw_penalty(params_flat: dict, fisher: dict, scores: dict, anchor_params: dict,
               lam: float, mask: dict | None = None):
    """Riemannian-Walk penalty: λ Σ (F + S)(θ − θ*)² (reference
    deep_supervision.py:132; the running fisher of the CURRENT task is
    excluded by the caller, :107)."""
    weight = {k: fisher[k] + scores[k] for k in fisher}
    return quadratic_penalty(params_flat, [{"weight": weight, "params": anchor_params}],
                             lam, mask, use_half=False)


def rw_online_update(fisher: dict, scores: dict, grads_flat: dict,
                     prev_params: dict, curr_params: dict,
                     loss_prev, loss_curr, alpha: float = 0.9, eps: float = 1e-8):
    """EWC++ online fisher EMA ``F ← α g² + (1−α) F`` and RW importance
    ``S += Δloss / (½ F Δθ² + ε)`` clamped ≥ 0 (reference rw/…:238-262)."""
    new_fisher, new_scores = {}, {}
    dl = loss_prev - loss_curr
    for k in fisher:
        g2 = grads_flat[k].astype(jnp.float32) ** 2
        f = alpha * g2 + (1 - alpha) * fisher[k]
        dtheta = curr_params[k].astype(jnp.float32) - prev_params[k].astype(jnp.float32)
        s = dl / (0.5 * f * dtheta * dtheta + eps)
        new_scores[k] = scores[k] + jnp.maximum(s, 0.0)
        new_fisher[k] = f
    return new_fisher, new_scores


def normalize_scores(scores: dict, eps: float = 1e-8) -> dict:
    """Min-max normalize scores over all leaves jointly (reference
    rw/…:180-200 normalizes then averages across tasks)."""
    mins = jnp.min(jnp.stack([jnp.min(v) for v in scores.values()]))
    maxs = jnp.max(jnp.stack([jnp.max(v) for v in scores.values()]))
    return {k: (v - mins) / (maxs - mins + eps) for k, v in scores.items()}


# ------------------------------------------------------------------------ LwF

def lwf_distill_loss(current_logits_per_head: list, target_logits_per_head: list,
                     temperature: float = 2.0):
    """Σ over previous heads of KL(teacher^T ‖ current^T) with 'batchmean'
    reduction — sum over voxels and classes divided by batch size, matching
    the reference's ``F.kl_div(..., reduction='batchmean', log_target=True)``
    (deep_supervision.py:194-196).  Logits are the full-resolution output
    only (the reference caches ``network(x)[0]``,
    helpful_functions.py:249-251)."""
    total = 0.0
    for cur, tgt in zip(current_logits_per_head, target_logits_per_head):
        logp = jax.nn.log_softmax(cur.astype(jnp.float32) / temperature, axis=-1)
        logq = jax.nn.log_softmax(tgt.astype(jnp.float32) / temperature, axis=-1)
        q = jnp.exp(logq)
        kl = jnp.sum(q * (logq - logp))
        total = total + kl / cur.shape[0]
    return total


# ------------------------------------------------------------------------ MiB

def unbiased_cross_entropy(logits, target, old_num_classes: int, ignore: int = -1):
    """MiB's unbiased CE (reference crossentropy.py): the background
    probability absorbs all NEW classes (>= old_num_classes), so old-model
    background predictions are not punished for containing new structures."""
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    den = jax.nn.logsumexp(logits, axis=-1)
    # log p(bg ∪ new classes)
    bg_new = jnp.concatenate([logits[..., :1], logits[..., old_num_classes:]], axis=-1)
    log_bg = jax.nn.logsumexp(bg_new, axis=-1) - den
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.clip(target, 0, num_classes - 1)
    picked = jnp.take_along_axis(log_probs, tgt[..., None], axis=-1)[..., 0]
    picked = jnp.where(target == 0, log_bg, picked)
    valid = (target != ignore).astype(jnp.float32)
    return -(picked * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def unbiased_kd_loss(logits, teacher_logits, old_num_classes: int, alpha: float = 1.0):
    """MiB's unbiased knowledge distillation (reference
    knowledge_distillation.py:3-60): teacher probs over OLD classes vs student
    log-probs where the background absorbs all NEW classes."""
    x = logits.astype(jnp.float32)
    t = teacher_logits.astype(jnp.float32) * alpha
    den = jax.nn.logsumexp(x, axis=-1, keepdims=True)
    new_cls = x[..., old_num_classes:]
    log_bg = jax.nn.logsumexp(
        jnp.concatenate([x[..., :1], new_cls], axis=-1), axis=-1, keepdims=True) - den
    log_old = x[..., 1:old_num_classes] - den
    student_log = jnp.concatenate([log_bg, log_old], axis=-1)
    q = jax.nn.softmax(t[..., :old_num_classes], axis=-1)
    return -jnp.mean(jnp.sum(q * student_log, axis=-1))


def mib_loss(outputs: list, teacher_outputs: list, target, ds_weights_arr,
             ds_targets_list, old_num_classes: int, lkd: float = 10.0,
             alpha: float = 0.9):
    """MiB total (reference deep_supervision.py:383-416): per DS output,
    unbiased CE + lkd × unbiased KD."""
    total = 0.0
    for i, (out, tout, tgt) in enumerate(zip(outputs, teacher_outputs, ds_targets_list)):
        w = ds_weights_arr[i]
        if w == 0.0:
            continue
        ce = unbiased_cross_entropy(out, tgt, old_num_classes)
        kd = unbiased_kd_loss(out, tout, old_num_classes, alpha)
        total = total + w * (ce + lkd * kd)
    return total


# ------------------------------------------------------------------ PLOP/POD

def entropy(probs, eps: float = 1e-8):
    """Normalized pixel entropy in [0,1] (reference crossentropy.py:6-16)."""
    num_classes = probs.shape[-1]
    h = -jnp.sum(probs * jnp.log(probs + eps), axis=-1)
    return h / jnp.log(jnp.asarray(float(num_classes)))


def pod_embedding(act, scales: int = 3):
    """Multi-scale local POD embedding (reference embeddings.py:3-42):
    at scale s the feature map is split into 2^s regions per spatial axis;
    within each region, mean-pool over every other spatial axis and
    concatenate.  act: [B, *spatial, C] -> [B, F] flattened embedding."""
    dims = act.ndim - 2
    feats = []
    actf = act.astype(jnp.float32)
    for s in range(scales):
        n = 2 ** s
        for ax in range(1, 1 + dims):
            size = act.shape[ax]
            region = max(1, size // n)
            usable = region * min(n, size)
            sl = [slice(None)] * act.ndim
            sl[ax] = slice(0, usable)
            a = actf[tuple(sl)]
            new_shape = (a.shape[:ax] + (min(n, size), region) + a.shape[ax + 1:])
            a = a.reshape(new_shape)
            other_axes = tuple(i for i in range(1, a.ndim - 1) if i != ax)
            emb = a.mean(axis=other_axes)          # [B, n_regions, C]
            feats.append(emb.reshape(a.shape[0], -1))
    return jnp.concatenate(feats, axis=-1)


def local_pod_loss(taps: dict, teacher_taps: dict, scales: int = 3,
                   pod_lambda: float = 1e-2):
    """Mean L2 distance between POD embeddings of matching taps
    (reference deep_supervision.py:287-332: λ=1e-2, per-layer /num_layers)."""
    keys = sorted(set(taps) & set(teacher_taps))
    if not keys:
        return jnp.asarray(0.0)
    total = 0.0
    for k in keys:
        e1 = pod_embedding(taps[k], scales)
        e2 = pod_embedding(teacher_taps[k], scales)
        total = total + jnp.sqrt(jnp.sum((e1 - e2) ** 2, axis=-1)).mean()
    return pod_lambda * total / len(keys)


def plop_pseudo_targets(target, teacher_logits, thresholds, num_classes: int):
    """PLOP pseudo-labeling (reference deep_supervision.py:287-332): where the
    ground truth is background, adopt the teacher's argmax IF the teacher's
    normalized entropy is below the per-(predicted-)class threshold; otherwise
    mark ignore (-1).  Returns (pseudo_target, adaptive_factor)."""
    probs = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    ent = entropy(probs)
    pred = jnp.argmax(probs, axis=-1)
    thr = thresholds[pred]                       # per-voxel threshold
    confident = ent < thr
    is_bg = target == 0
    pseudo = jnp.where(is_bg & confident, pred, target)
    pseudo = jnp.where(is_bg & ~confident, -1, pseudo)
    num = jnp.sum((is_bg & confident).astype(jnp.float32))
    den = jnp.maximum(jnp.sum(is_bg.astype(jnp.float32)), 1.0)
    return pseudo.astype(jnp.int32), num / den


def _ce_per_sample(logits, target, ignore: int = -1):
    """Mean CE per batch element, ignoring ``ignore`` voxels. [B]"""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(target, 0, num_classes - 1)
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    valid = (target != ignore).astype(jnp.float32)
    axes = tuple(range(1, target.ndim))
    return -(picked * valid).sum(axes) / jnp.maximum(valid.sum(axes), 1.0)


def plop_pseudo_label_loss(logits, teacher_logits, target, thresholds):
    """One DS output's PLOP objective (reference deep_supervision.py:289-332):
    with B = background mask and V = teacher-confident mask,
      pseudo CE  : only B∧V voxels, labeled by the teacher argmax
      not-pseudo CE: everything except B∧V, true labels
      weighted per-sample by the adaptive factor |B∧V|/|B|.
    """
    probs = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    ent = entropy(probs)
    pseudo = jnp.argmax(probs, axis=-1)
    confident = ent < thresholds[pseudo]
    is_bg = target == 0
    pv = is_bg & confident
    # not-pseudo: true labels with confident-bg voxels ignored
    lab_not = jnp.where(pv, -1, target)
    # pseudo: teacher labels on confident-bg voxels, everything else ignored
    lab_ps = jnp.where(pv, pseudo, -1)
    axes = tuple(range(1, target.ndim))
    num = pv.astype(jnp.float32).sum(axes)
    den = jnp.maximum(is_bg.astype(jnp.float32).sum(axes), 1.0)
    factor = num / den
    loss = factor * (_ce_per_sample(logits, lab_ps) + _ce_per_sample(logits, lab_not))
    return loss.mean()


def median_entropy_thresholds(entropy_sums, counts, max_entropy: float = 1.0):
    """Per-class thresholds from accumulated entropy statistics.  The
    reference computes a median over an epoch of teacher outputs
    (plop/…:113-182) via histograms; we accumulate per-class histograms in
    ``entropy_sums`` [C, BINS] and take the median bin, as close to the
    reference's mode as jit allows."""
    BINS = entropy_sums.shape[1]
    cum = jnp.cumsum(entropy_sums, axis=1)
    half = cum[:, -1:] / 2.0
    median_bin = jnp.argmax(cum >= half, axis=1)
    return (median_bin.astype(jnp.float32) + 0.5) / BINS * max_entropy


def accumulate_entropy_histogram(hist, teacher_logits, target, num_classes: int,
                                 bins: int = 100):
    """One batch's contribution to the per-class entropy histogram [C, bins]."""
    probs = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    ent = entropy(probs)
    pred = jnp.argmax(probs, axis=-1)
    idx = jnp.clip((ent * bins).astype(jnp.int32), 0, bins - 1)
    valid = (target >= 0)
    flat_cls = jnp.where(valid, pred, num_classes)  # invalid -> overflow row
    one = jnp.ones_like(idx, dtype=jnp.float32)
    h = jnp.zeros((num_classes + 1, bins), jnp.float32)
    h = h.at[flat_cls.reshape(-1), idx.reshape(-1)].add(one.reshape(-1))
    return hist + h[:num_classes]
