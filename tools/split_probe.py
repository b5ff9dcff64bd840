"""Component splits for the two train metrics: (a) CT train step fwd vs
fwd+bwd, (b) ViT step U-Net-conv vs transformer fraction."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fetch(r):
    # block_until_ready is NOT a real barrier on the axon relay — force a
    # value transfer instead.  One leaf suffices: an XLA program completes
    # as a whole, and per-leaf eager sums would each pay the ~30 ms
    # dispatch floor.
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))


def timeit(tag, f, p, x, *rest, reps=5):
    """f(p, x*s, *rest) with a fresh scalar per rep — the relay dedups
    identical (program, args) pairs, so repeats MUST vary the inputs."""
    _fetch(f(p, x, *rest))
    ts = []
    for i in range(reps):
        xs = x * jnp.asarray(1.0 + 0.0625 * (i + 1), x.dtype)
        _fetch(xs[..., :1])
        t0 = time.perf_counter()
        _fetch(f(p, xs, *rest))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"| {tag} | {dt*1e3:.1f} ms |", flush=True)
    return dt


print(f"backend={jax.default_backend()}", flush=True)

# ---- (a) CT train step: forward-only vs full step ------------------------
from bench import _make_model, CT  # noqa: E402
from lifelong_nnunet_tpu.models.unet import ds_scale_factors  # noqa: E402
from lifelong_nnunet_tpu.ops.losses import deep_supervision_loss  # noqa: E402

model = _make_model(CT["classes"], CT["pools"], jnp.bfloat16).clone(remat=True)
params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1,) + CT["patch"] + (1,)))["params"]
rng = np.random.RandomState(0)
data = jnp.asarray(rng.normal(size=(2,) + CT["patch"] + (1,)), jnp.float32)
seg = jnp.asarray(rng.randint(0, 3, (2,) + CT["patch"]), jnp.int32)
dsf = tuple(ds_scale_factors(((2, 2, 2),) * CT["pools"]))


@jax.jit
def fwd_loss(p, d, s):
    return deep_supervision_loss(model.apply({"params": p}, d), s, dsf, True)


@jax.jit
def fwd_bwd(p, d, s):
    return jax.grad(lambda pp: deep_supervision_loss(
        model.apply({"params": pp}, d), s, dsf, True))(p)


t_f = timeit("CT b2 fwd+loss (remat)", fwd_loss, params, data, seg)
t_fb = timeit("CT b2 fwd+bwd (remat)", fwd_bwd, params, data, seg)
print(f"| bwd/fwd ratio | {t_fb/t_f:.2f} |", flush=True)

# ---- (b) ViT V1 step: transformer-only timing ----------------------------
from lifelong_nnunet_tpu.models.vit import VisionTransformer  # noqa: E402

vt = VisionTransformer(out_features=(320,), embed_dim=768, depth=12,
                       num_heads=12, dtype=jnp.bfloat16)
xv = jnp.asarray(rng.normal(size=(4, 40, 56, 40, 32)), jnp.bfloat16)
pv = vt.init(jax.random.PRNGKey(1), xv)["params"]


@jax.jit
def vit_fwd(p, x):
    return vt.apply({"params": p}, x)


@jax.jit
def vit_fwd_bwd(p, x):
    return jax.grad(lambda pp: jnp.sum(
        vt.apply({"params": pp}, x).astype(jnp.float32)))(p)


timeit("ViT-base transformer fwd (b4 hippo skip0)", vit_fwd, pv, xv)
timeit("ViT-base transformer fwd+bwd", vit_fwd_bwd, pv, xv)
print("done", flush=True)
