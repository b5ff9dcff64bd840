"""A/B: class-major DS loss (working tree) vs the old channel-minor
one-hot implementation, on the chip. Interleaved timed passes, scalar
fetch only (relay discipline). Run on an IDLE host.

Usage: python tools/ab_loss_classmajor.py [hipp|ct]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lifelong_nnunet_tpu.ops import losses as new_losses


# ---- old implementation (pre class-major rewrite), for the A side ----
def _old_one_hot(target, num_classes):
    t = jnp.clip(target, 0, num_classes - 1)
    return jax.nn.one_hot(t, num_classes, dtype=jnp.float32)


def old_soft_dice_loss(logits, target, batch_dice=True, smooth=1e-5,
                       ignore_background=True):
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    valid = (target >= 0)[..., None].astype(jnp.float32)
    y = _old_one_hot(target, num_classes) * valid
    p = probs * valid
    axes = tuple(range(0, logits.ndim - 1)) if batch_dice else tuple(range(1, logits.ndim - 1))
    tp = jnp.sum(p * y, axis=axes)
    fp = jnp.sum(p * (1.0 - y), axis=axes)
    fn = jnp.sum((1.0 - p) * y, axis=axes)
    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth)
    if ignore_background:
        dc = dc[..., 1:] if batch_dice else dc[:, 1:]
    return 1.0 - jnp.mean(dc)


def old_cross_entropy_loss(logits, target, ignore_index=-1):
    num_classes = logits.shape[-1]
    valid = (target != ignore_index).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    y = _old_one_hot(target, num_classes)
    ce = -(y * logp).sum(axis=-1)
    return (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def old_dc_and_ce(logits, target):
    return old_soft_dice_loss(logits, target) + old_cross_entropy_loss(logits, target)


def new_dc_and_ce(logits, target):
    return new_losses.dc_and_ce_loss(logits, target)


def make_ds(loss_fn, shapes, num_classes):
    w = new_losses.ds_weights(len(shapes))

    def ds_loss(outputs, targets):
        total = 0.0
        for i, (o, t) in enumerate(zip(outputs, targets)):
            if w[i] == 0.0:
                continue
            total = total + float(w[i]) * loss_fn(o, t)
        return total

    return jax.jit(jax.grad(ds_loss))


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "hipp"
    if cfg == "hipp":
        shapes = [(9, 40, 56, 40), (9, 20, 28, 20), (9, 10, 14, 10)]
        C = 3
    else:  # ct-ish
        shapes = [(2, 128, 128, 128), (2, 64, 64, 64), (2, 32, 32, 32),
                  (2, 16, 16, 16)]
        C = 3
    rng = np.random.default_rng(0)
    outputs = [jnp.asarray(rng.standard_normal((*s, C)).astype(np.float32))
               for s in shapes]
    targets = [jnp.asarray(rng.integers(0, C, s).astype(np.int32))
               for s in shapes]

    grad_old = make_ds(old_dc_and_ce, shapes, C)
    grad_new = make_ds(new_dc_and_ce, shapes, C)

    # numeric agreement
    go = grad_old(outputs, targets)
    gn = grad_new(outputs, targets)
    diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(go, gn)]
    print("max |grad_old - grad_new| per output:", diffs)

    def timed(fn, n=60):
        fn(outputs, targets)  # warm
        s = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            g = fn(outputs, targets)
            s = s + g[0].ravel()[0]
        float(s)  # scalar fetch forces completion
        return (time.perf_counter() - t0) / n * 1e3

    for rep in range(4):
        a = timed(grad_old)
        b = timed(grad_new)
        print(f"pass {rep}: old {a:.2f} ms  new {b:.2f} ms  speedup {a/b:.2f}x")


if __name__ == "__main__":
    main()
