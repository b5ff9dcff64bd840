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
            # anchors may be stored bf16 (checkpoint diet) — upcast here
            w = anchor["weight"][k].astype(jnp.float32)
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
    """MiB's unbiased CE, exactly as the reference (crossentropy.py:25-45):
    the BACKGROUND log-probability absorbs all OLD classes
    (< old_num_classes) — on a new task, old structures are annotated as
    background, so predicting an old class there must not be punished.
    All target labels < old_num_classes collapse to 0 (reference :41)."""
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    den = jax.nn.logsumexp(logits, axis=-1)
    # log p(bg ∪ old classes) (reference :38)
    log_old_bg = jax.nn.logsumexp(logits[..., :old_num_classes], axis=-1) - den
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    labels = jnp.where((target >= 0) & (target < old_num_classes), 0, target)
    tgt = jnp.clip(labels, 0, num_classes - 1)
    picked = jnp.take_along_axis(log_probs, tgt[..., None], axis=-1)[..., 0]
    picked = jnp.where(labels == 0, log_old_bg, picked)
    valid = (target != ignore).astype(jnp.float32)
    return -(picked * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def unbiased_kd_loss(logits, teacher_logits, old_num_classes: int, alpha: float = 1.0):
    """MiB's unbiased knowledge distillation, exactly as the reference
    (knowledge_distillation.py:3-32): teacher probs over its
    ``old_num_classes`` channels vs student log-probs where the background
    absorbs all NEW classes; the per-voxel sum is divided by the teacher
    channel count (reference :23 ``/ targets.shape[1]``) before the mean."""
    x = logits.astype(jnp.float32)
    t = teacher_logits.astype(jnp.float32) * alpha
    den = jax.nn.logsumexp(x, axis=-1, keepdims=True)
    new_cls = x[..., old_num_classes:]
    log_bg = jax.nn.logsumexp(
        jnp.concatenate([x[..., :1], new_cls], axis=-1), axis=-1, keepdims=True) - den
    log_old = x[..., 1:old_num_classes] - den
    student_log = jnp.concatenate([log_bg, log_old], axis=-1)
    q = jax.nn.softmax(t[..., :old_num_classes], axis=-1)
    return -jnp.mean(jnp.sum(q * student_log, axis=-1) / old_num_classes)


def mib_loss(outputs: list, teacher_outputs: list, target, ds_weights_arr,
             ds_targets_list, old_num_classes: int, lkd: float = 10.0,
             alpha: float = 0.9):
    """MiB total (reference deep_supervision.py:383-416): per DS output,
    plain CE (the reference uses ``RobustCrossEntropyLoss``, not the unbiased
    CE — deep_supervision.py:393) + lkd × unbiased KD."""
    from .losses import cross_entropy_loss
    total = 0.0
    for i, (out, tout, tgt) in enumerate(zip(outputs, teacher_outputs, ds_targets_list)):
        w = ds_weights_arr[i]
        if w == 0.0:
            continue
        ce = cross_entropy_loss(out, tgt)
        kd = unbiased_kd_loss(out, tout, old_num_classes, alpha)
        total = total + w * (ce + lkd * kd)
    return total


# ------------------------------------------------------------------ PLOP/POD

def entropy(probs, eps: float = 1e-8):
    """Per-pixel entropy exactly as the reference (crossentropy.py:6-16):
    ``-(1/log(C+eps)) * mean_c p*log(p+eps)``.  NOTE the reference takes the
    channel MEAN (not sum), so values lie in [0, 1/C]; the PLOP pipeline
    additionally divides by max_entropy = log(C) before thresholding
    (plop/nnUNetTrainerPLOP.py:124,152,300) — see :func:`entropy_confidence`."""
    num_classes = probs.shape[-1]
    factor = 1.0 / jnp.log(num_classes + eps)
    return -factor * jnp.mean(probs * jnp.log(probs + eps), axis=-1)


def entropy_confidence(probs):
    """The statistic PLOP thresholds live in: entropy(p) / max_entropy with
    max_entropy = log(C) (reference plop/…:124; applied at :152 for the
    histogram and deep_supervision.py:300 for the mask)."""
    return entropy(probs) / jnp.log(jnp.asarray(float(probs.shape[-1])))


def pod_embed(act):
    """Reference ``pod_embed`` (embeddings.py:3-7), channels-last: mean-pool
    the last two spatial axes separately and concatenate over channels.
    act: [B, *lead, h, w, C] -> [B, *lead, h, 2C] (requires h == w, exactly
    like the reference's ``torch.cat`` over the channel axis)."""
    w_p = jnp.mean(act, axis=-2)   # over w (reference's dim -1)
    h_p = jnp.mean(act, axis=-3)   # over h (reference's dim -2)
    return jnp.concatenate([w_p, h_p], axis=-1)


def _pod_blocks(act, scales: int):
    """Region/scale sweep of reference ``local_POD`` (embeddings.py:9-37),
    channels-last, returning the width-pooled and height-pooled row blocks
    separately.  Faithful to the reference's loop semantics:
      * ``range(0, W-w, w)`` EXCLUDES the final region at every scale and
        makes scale 0 contribute nothing (w=W -> empty range);
      * the i index (derived from the last axis' size W) slices the
        second-to-last spatial axis and j the last one — the reference's
        axis swap, identical on the square maps POD is used with.
    Keeping the two pooled blocks separate is exactly equivalent to the
    reference's 2C-row concatenation when h == w (each row's L2 norm is
    taken independently) and stays well-defined for h != w."""
    W = act.shape[-2]
    H = act.shape[-3]
    actf = act.astype(jnp.float32)
    wvecs, hvecs = [], []
    for scale in range(scales):
        w = int(W / (2 ** scale))
        h = int(H / (2 ** scale))
        assert w > 0 and h > 0, (
            f"POD scales={scales} too large for spatial dims ({H},{W})")
        for i in range(0, W - w, w):
            for j in range(0, H - h, h):
                sl = actf[..., i:i + w, j:j + h, :]
                wvecs.append(jnp.mean(sl, axis=-2))   # [B,*lead, w, C]
                hvecs.append(jnp.mean(sl, axis=-3))   # [B,*lead, h, C]
    if not wvecs:
        return None, None
    return jnp.concatenate(wvecs, axis=-2), jnp.concatenate(hvecs, axis=-2)


def local_pod_distance(act, teacher_act, scales: int = 3):
    """Reference ``local_POD`` (embeddings.py:9-42): L2 distance between the
    concatenated per-region POD rows, one norm per (channel, pooled-axis) row
    over the region-concat axis, then the mean over all rows."""
    pw, ph = _pod_blocks(act, scales)
    ow, oh = _pod_blocks(teacher_act, scales)
    if pw is None:
        return jnp.asarray(0.0)
    dw = jnp.sqrt(jnp.sum((pw - ow) ** 2, axis=-2))   # [B,*lead, C]
    dh = jnp.sqrt(jnp.sum((ph - oh) ** 2, axis=-2))
    return (jnp.mean(dw) + jnp.mean(dh)) / 2.0


# Backwards-compatible alias used by older call sites/tests.
def pod_embedding(act, scales: int = 3):
    """Flattened multi-scale POD embedding [B, F] (both pooled blocks of
    :func:`_pod_blocks` concatenated); L2 distances between these are NOT the
    reference metric — use :func:`local_pod_distance` for that."""
    pw, ph = _pod_blocks(act, scales)
    if pw is None:  # scale sweep produced no regions (scales == 1)
        e = pod_embed(act.astype(jnp.float32))
        return e.reshape(e.shape[0], -1)
    b = pw.shape[0]
    return jnp.concatenate([pw.reshape(b, -1), ph.reshape(b, -1)], axis=-1)


def local_pod_loss(taps: dict, teacher_taps: dict, scales: int = 3,
                   pod_lambda: float = 1e-2):
    """POD distillation term exactly as the reference composes it
    (deep_supervision.py:270-278, 366-376): per layer, accumulate
    ``pod_lambda * local_POD`` and divide the RUNNING total by num_layers
    INSIDE the loop — so with L layers, layer k (in iteration order)
    effectively carries a 1/L^(L-k) weight.  We iterate sorted(keys), which
    matches the reference's insertion-ordered dict for the topologically
    named taps the trainers produce."""
    keys = sorted(set(taps) & set(teacher_taps))
    if not keys:
        return jnp.asarray(0.0)
    dist = jnp.asarray(0.0)
    for k in keys:
        # Deviation (documented): a map smaller than 2^(scales-1) on either
        # pooled axis makes the reference's region loop a zero-step range()
        # crash (embeddings.py:17-18 h or w == 0).  Clamp the scale sweep to
        # what the map supports instead — identical on every input the
        # reference survives.
        hw = min(int(taps[k].shape[-3]), int(taps[k].shape[-2]))
        eff = max(1, min(scales, hw.bit_length()))
        dist = dist + pod_lambda * local_pod_distance(taps[k], teacher_taps[k], eff)
        dist = dist / len(keys)
    return dist


def plop_pseudo_targets(target, teacher_logits, thresholds, num_classes: int):
    """PLOP pseudo-labeling (reference deep_supervision.py:287-311): where the
    ground truth is background, adopt the teacher's argmax IF the teacher's
    entropy confidence statistic (see :func:`entropy_confidence`) is below the
    per-(predicted-)class threshold; otherwise mark ignore (-1).
    Returns (pseudo_target, adaptive_factor)."""
    probs = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    ent = entropy_confidence(probs)
    pred = jnp.argmax(probs, axis=-1)
    thr = thresholds[pred]                       # per-voxel threshold
    confident = ent < thr
    is_bg = target == 0
    pseudo = jnp.where(is_bg & confident, pred, target)
    pseudo = jnp.where(is_bg & ~confident, -1, pseudo)
    num = jnp.sum((is_bg & confident).astype(jnp.float32))
    den = jnp.maximum(jnp.sum(is_bg.astype(jnp.float32)), 1.0)
    return pseudo.astype(jnp.int32), num / den


def _ce_mean(logits, target, ignore: int = -1):
    """Mean CE over all non-ignored voxels of the whole batch — torch's
    ``CrossEntropyLoss(ignore_index=…, reduction='mean')`` semantics, which
    the reference's ``RobustCrossEntropyLoss`` uses (deep_supervision.py:235,
    319, 328)."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(target, 0, num_classes - 1)
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    valid = (target != ignore).astype(jnp.float32)
    return -(picked * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def plop_pseudo_label_loss(logits, teacher_logits, target, thresholds):
    """One DS output's PLOP objective, exactly as the reference's
    ``_pseudo_label_loss`` (deep_supervision.py:287-332): with
    B = background mask and V = teacher-confident mask,
      pseudo CE   : only B∧V voxels, labeled by the teacher argmax
      not-pseudo CE: everything except B∧V, true labels
    both with batch-global 'mean' reduction, and the per-sample adaptive
    factor |B∧V|/|B| broadcast against the scalar CE sum before the final
    mean (reference :331-332) — i.e. mean(factor) × (CE_ps + CE_not)."""
    probs = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    ent = entropy_confidence(probs)
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
    factor = (num / den).mean()
    return factor * (_ce_mean(logits, lab_ps) + _ce_mean(logits, lab_not))


def median_entropy_thresholds(entropy_sums, counts=None,
                              base_threshold: float = 0.001):
    """Per-class thresholds from the accumulated confidence histogram
    [C, BINS] over [0, 1]: the median bin, floored at ``base_threshold``
    (reference plop/…:171-173).  The reference's own median loop
    (plop/…:163-170) accumulates bin INDICES instead of counts into its
    running sum — a bug we do not replicate; this is a true histogram
    median of the same statistic."""
    BINS = entropy_sums.shape[1]
    cum = jnp.cumsum(entropy_sums, axis=1)
    half = cum[:, -1:] / 2.0
    median_bin = jnp.argmax(cum >= half, axis=1)
    thr = (median_bin.astype(jnp.float32) + 0.5) / BINS
    return jnp.maximum(thr, base_threshold)


def accumulate_entropy_histogram(hist, teacher_logits, target, num_classes: int,
                                 bins: int = 100):
    """One batch's contribution to the per-class confidence histogram
    [C, bins]: over BACKGROUND voxels only (reference plop/…:150
    ``mask_bg = labels == 0``), binned by :func:`entropy_confidence` of the
    teacher, indexed by the teacher's argmax class (reference :152-155)."""
    probs = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    ent = entropy_confidence(probs)
    pred = jnp.argmax(probs, axis=-1)
    idx = jnp.clip((ent * bins).astype(jnp.int32), 0, bins - 1)
    is_bg = (target == 0)
    flat_cls = jnp.where(is_bg, pred, num_classes)  # non-bg -> overflow row
    one = jnp.ones_like(idx, dtype=jnp.float32)
    h = jnp.zeros((num_classes + 1, bins), jnp.float32)
    h = h.at[flat_cls.reshape(-1), idx.reshape(-1)].add(one.reshape(-1))
    return hist + h[:num_classes]
