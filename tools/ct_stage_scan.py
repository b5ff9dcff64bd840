"""True per-stage conv cost at CT scale, RPC-amortized (round 4).

Round-3's per-stage A/B (ab_ct_batch.py) timed ONE block per dispatch, and
the axon relay adds ~20-25 ms of per-dispatch overhead — visible in its s0
batch curve (36/44/62 ms for 1x/2x/4x the work), which therefore measured
RPC, not the kernel.  This tool chains the block inside ONE dispatch with a
carry-dependent ``lax.scan`` (the block output IS the next input — cin==cout
stages only; IN+LReLU keeps activations bounded so the chain is stable, and
the data dependence defeats both XLA CSE and the relay's dispatch dedup):

    per-iter = (t(scan N) - t(scan 1)) / (N - 1)

which cancels dispatch overhead, host transfer, AND the first-use warmup.

Modes:
  blocks  ConvNormAct (XLA vs Pallas) per (stage, batch)
  shapes  bare conv3d throughput at CONSTANT total voxels across
          (batch, spatial) splits — does folding spatial into batch lift
          the C=32 regime the way the hippocampus numbers suggest?

Usage:  python tools/ct_stage_scan.py [blocks|shapes|all] [--n 8]
Run on an IDLE host.
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    """Scalar host fetch: block_until_ready can return before remote
    execution completes on the axon relay."""
    return float(np.asarray(x))


def _time_scan(make_fn, x_shape, dtype, n, tag=""):
    """Median-of-3 per-iter seconds via the (N)-(1) scan difference.

    Each timed dispatch gets a DISTINCT input (relay dedup discipline)."""
    import jax
    import jax.numpy as jnp

    f1 = jax.jit(make_fn(1))
    fn = jax.jit(make_fn(n))
    rng = np.random.RandomState(17)
    # 4 distinct arrays suffice: the relay dedups (program, args) PAIRS, so
    # reusing x between f1 and fn is safe — and big-shape cases upload
    # hundreds of MB per array through the relay, so fewer is much faster
    xs = [jnp.asarray(rng.normal(size=x_shape), dtype) for _ in range(4)]
    _sync(f1(xs[0]))          # compile+warm (never timed)
    _sync(fn(xs[0]))
    t1s, tns = [], []
    for r in range(3):
        t0 = time.perf_counter()
        _sync(f1(xs[1 + r]))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(fn(xs[1 + r]))
        tns.append(time.perf_counter() - t0)
    t1 = float(np.median(t1s))
    tn = float(np.median(tns))
    return max(tn - t1, 1e-9) / (n - 1), t1, tn


def bench_block(spatial, c, b, pallas: bool, n: int):
    """ConvNormAct chained: per-iteration cost of one fused block."""
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.models.unet import ConvNormAct
    import jax

    m = ConvNormAct(features=c, kernel=(3, 3, 3), stride=(1, 1, 1),
                    dtype=jnp.bfloat16, pallas_conv=pallas)
    shape = (b,) + spatial + (c,)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros(shape, jnp.bfloat16))

    def make_fn(length):
        def run(x0):
            def body(x, _):
                return m.apply(params, x), None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def bench_bare_conv(spatial, c, b, n: int):
    """Bare SAME conv3d (no IN/act), chained via a cheap renorm (rsqrt of the
    running mean-square keeps the chain bounded; cost ~ one elementwise map,
    << conv)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=(1.0 / np.sqrt(27 * c)), size=(3, 3, 3, c, c)), jnp.bfloat16)
    shape = (b,) + spatial + (c,)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = lax.conv_general_dilated(
                    x, w, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                return (y * lax.rsqrt(ms + 1e-6).astype(y.dtype)), None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def split_conv_same(x, w, splits=(2, 2, 2)):
    """3x3x3 stride-1 SAME conv computed as a batch of halo'd sub-blocks.

    Splits the spatial volume into prod(splits) blocks with a 1-voxel halo,
    folds them into the batch dim, runs ONE VALID conv at batch
    B*prod(splits), and reassembles — numerically identical to the SAME conv
    (the halo supplies exactly the SAME zero/neighbor border each block
    needs).  Purpose: move the conv into the large-batch/small-spatial
    regime where XLA's TPU conv measured ~85%-of-lane-ceiling (hippocampus
    shapes) instead of the ~20% it reaches at [b<=8, 128^3]."""
    import jax.numpy as jnp
    from jax import lax

    B, D, H, W, C = x.shape
    sd, sh, sw = splits
    bd, bh, bw = D // sd, H // sh, W // sw
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # [B, sd, bd+2, sh, bh+2, sw, bw+2, C] via strided gather of overlapping
    # blocks: slice per split index (unrolled — splits is tiny and static)
    blocks = [xp[:, i * bd:i * bd + bd + 2, j * bh:j * bh + bh + 2,
                 k * bw:k * bw + bw + 2, :]
              for i in range(sd) for j in range(sh) for k in range(sw)]
    xb = jnp.concatenate(blocks, axis=0)        # [B*nb, bd+2, bh+2, bw+2, C]
    yb = lax.conv_general_dilated(
        xb, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    nb = sd * sh * sw
    yb = yb.reshape((nb, B, bd, bh, bw, -1))
    yb = yb.reshape((sd, sh, sw, B, bd, bh, bw, -1))
    y = jnp.moveaxis(yb, 3, 0)                  # [B, sd, sh, sw, bd, bh, bw, C]
    y = y.transpose((0, 1, 4, 2, 5, 3, 6, 7))
    return y.reshape((B, D, H, W, -1))


def bench_split_conv(spatial, c, b, n: int, splits=(2, 2, 2)):
    """Chained split-conv (renorm between iters, like bench_bare_conv)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=(1.0 / np.sqrt(27 * c)), size=(3, 3, 3, c, c)), jnp.bfloat16)
    shape = (b,) + spatial + (c,)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = split_conv_same(x, w, splits)
                ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                return (y * lax.rsqrt(ms + 1e-6).astype(y.dtype)), None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def check_split_correct():
    """split_conv_same == SAME conv (f32, CPU-checkable)."""
    import jax.numpy as jnp
    from jax import lax
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 8, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5, 7)), jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = split_conv_same(x, w, (2, 2, 2))
    err = float(jnp.max(jnp.abs(ref - got)))
    assert err < 1e-4, f"split conv mismatch: {err}"
    got2 = split_conv_same(x, w, (4, 3, 2))
    err2 = float(jnp.max(jnp.abs(ref - got2)))
    assert err2 < 1e-4, f"split conv mismatch (4,3,2): {err2}"
    print(f"split_conv_same correct (max err {max(err, err2):.2e})",
          flush=True)


def bench_blocked_conv(spatial, c, b, n: int, blocks):
    """Chained blocked SAME conv (ops/blocked_conv.blocked_conv_same):
    reshape+edge-concat pack, VALID conv at large batch, unpack."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.ops.blocked_conv import blocked_conv_same

    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=(1.0 / np.sqrt(27 * c)), size=(3, 3, 3, c, c)), jnp.bfloat16)
    shape = (b,) + spatial + (c,)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = blocked_conv_same(x, w, blocks=blocks)
                ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                return (y * lax.rsqrt(ms + 1e-6).astype(y.dtype)), None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def bench_blocked_stage(spatial, c, b, n: int, blocks):
    """Chained 2-conv stage: blocked_stage vs two fused ConvNormAct."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.ops.blocked_conv import blocked_stage

    rng = np.random.RandomState(3)
    w1 = jnp.asarray(rng.normal(scale=1 / np.sqrt(27 * c),
                                size=(3, 3, 3, c, c)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(scale=1 / np.sqrt(27 * c),
                                size=(3, 3, 3, c, c)), jnp.bfloat16)
    sc = jnp.ones((c,), jnp.float32)
    of = jnp.zeros((c,), jnp.float32)
    shape = (b,) + spatial + (c,)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = blocked_stage(x, w1, sc, of, w2, sc, of, blocks=blocks)
                return y, None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def bench_xla_stage(spatial, c, b, n: int, pallas=False):
    """Chained 2x fused ConvNormAct stage (the current production path)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.models.unet import ConvNormAct

    m = ConvNormAct(features=c, kernel=(3, 3, 3), stride=(1, 1, 1),
                    dtype=jnp.bfloat16, pallas_conv=pallas)
    shape = (b,) + spatial + (c,)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros(shape, jnp.bfloat16))

    def make_fn(length):
        def run(x0):
            def body(x, _):
                return m.apply(params, m.apply(params, x)), None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def bench_valid_conv(spatial, c, b, n: int):
    """Raw VALID conv rate at the blocked regime's exact shapes."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=(1.0 / np.sqrt(27 * c)), size=(3, 3, 3, c, c)), jnp.bfloat16)
    shape = (b,) + spatial + (c,)
    out_sp = tuple(s - 2 for s in spatial)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = lax.conv_general_dilated(
                    x, w, (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                y = y * lax.rsqrt(ms + 1e-6).astype(y.dtype)
                return jnp.pad(y, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), \
                    None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    flops = 2 * b * int(np.prod(out_sp)) * c * c * 27
    dt, t1, tn = _time_scan(make_fn, shape, jnp.bfloat16, n)
    return dt, flops


def bench_packed_conv_regime(bs: int, c: int, nb: int, n: int):
    """Conv rate ON the packed layout [nb, bs+2, bs+2, We, C] with the
    negative-W-pad config (ops/pallas/block_pack.conv_pads) — does XLA's
    fast small-cubic-window regime survive the junk columns + neg pad?
    The chain re-pads outputs to input geometry (cost counted; ~0.1 of the
    conv at the fast rate)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.ops.pallas.block_pack import conv_pads, _round8

    He = We = _round8(bs + 2)
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=(1.0 / np.sqrt(27 * c)), size=(3, 3, 3, c, c)), jnp.bfloat16)
    shape = (nb, bs + 2, He, We, c)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = lax.conv_general_dilated(
                    x, w, (1, 1, 1), conv_pads(bs),
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                y = y * lax.rsqrt(ms + 1e-6).astype(y.dtype)
                return jnp.pad(y, ((0, 0), (1, 1), (1, He - bs - 1),
                                   (1, We - bs - 1), (0, 0))), None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    flops = 2 * nb * bs ** 3 * c * c * 27
    dt, t1, tn = _time_scan(make_fn, shape, jnp.bfloat16, n)
    return dt, flops


def bench_pack_roundtrip(spatial, c, b, bs, n: int):
    """pack_blocks -> core-slice -> unpack_blocks chained: the DMA cost of
    one full pack/unpack cycle.  Returns (dt, bytes_moved_per_iter)."""
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.ops.pallas.block_pack import (
        pack_blocks, unpack_blocks)

    shape = (b,) + tuple(spatial) + (c,)
    grid = tuple(s // bs for s in spatial)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                xb = pack_blocks(x, bs)
                core = xb[:, 1:-1, 1:bs + 1, 1:bs + 1, :]
                return unpack_blocks(core, b, grid), None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    nbytes = int(np.prod(shape)) * 2  # bf16
    dt, t1, tn = _time_scan(make_fn, shape, jnp.bfloat16, n)
    return dt, nbytes


def bench_packed_stage(spatial, c, b, n: int, bs):
    """2-conv stage via block_pack.packed_stage (DMA pack, fast-regime
    convs) — the contender against stage-pallas/stage-xla."""
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.ops.pallas.block_pack import packed_stage

    rng = np.random.RandomState(3)
    w1 = jnp.asarray(rng.normal(scale=1.0 / np.sqrt(27 * c),
                                size=(3, 3, 3, c, c)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(scale=1.0 / np.sqrt(27 * c),
                                size=(3, 3, 3, c, c)), jnp.bfloat16)
    sc = jnp.ones((c,), jnp.float32)
    of = jnp.zeros((c,), jnp.float32)
    shape = (b,) + tuple(spatial) + (c,)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = packed_stage(x, w1, sc, of, w2, sc, of, bs=bs)
                return y, None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def bench_conv25d(spatial, c, b, n: int, stride=(1, 1, 1), cin=None):
    """Chained 2.5D conv (ops/conv25d.conv3d_slicewise) with renorm.

    For strided cases the chain upsamples back via repeat so the carry
    keeps the input shape (repeat is a cheap broadcast copy, counted)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.ops.conv25d import conv3d_slicewise

    cin = cin or c
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=(1.0 / np.sqrt(27 * cin)), size=(3, 3, 3, cin, c)),
        jnp.bfloat16)
    shape = (b,) + spatial + (cin,)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = conv3d_slicewise(x, w, stride)
                ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                y = y * lax.rsqrt(ms + 1e-6).astype(y.dtype)
                if stride != (1, 1, 1):
                    for ax, s in zip((1, 2, 3), stride):
                        y = jnp.repeat(y, s, axis=ax)
                if c < cin:
                    y = jnp.concatenate([y] * (cin // c), axis=-1)
                elif c > cin:
                    y = y[..., :cin]
                return y, None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def bench_conv25d_stage(spatial, c, b, n: int):
    """Chained 2-block fused stage via conv25d_in_lrelu (vs stage-xla/
    stage-pallas rows from the blocked mode)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.ops.conv25d import conv25d_in_lrelu

    rng = np.random.RandomState(3)
    w1 = jnp.asarray(rng.normal(scale=1 / np.sqrt(27 * c),
                                size=(3, 3, 3, c, c)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(scale=1 / np.sqrt(27 * c),
                                size=(3, 3, 3, c, c)), jnp.bfloat16)
    sc = jnp.ones((c,), jnp.float32)
    of = jnp.zeros((c,), jnp.float32)
    shape = (b,) + spatial + (c,)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = conv25d_in_lrelu(x, w1, sc, of)
                y = conv25d_in_lrelu(y, w2, sc, of)
                return y, None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def _bench_direct_cinout(spatial, cout, b, n: int, cin: int):
    """Chained direct SAME conv with Cin != Cout (channel-slice carry)."""
    import jax.numpy as jnp
    from jax import lax

    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=(1.0 / np.sqrt(27 * cin)), size=(3, 3, 3, cin, cout)),
        jnp.bfloat16)
    shape = (b,) + spatial + (cin,)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = lax.conv_general_dilated(
                    x, w, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                y = y * lax.rsqrt(ms + 1e-6).astype(y.dtype)
                if cout < cin:
                    y = jnp.concatenate([y] * (cin // cout), axis=-1)
                elif cout > cin:
                    y = y[..., :cin]
                return y, None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def _bench_convtranspose(sp_in, cin, cout, b, n: int):
    """Chained ConvTranspose k=s=2 (decoder upsampling); carry is folded
    back down by a stride-2 slice + channel tile (cheap)."""
    import jax.numpy as jnp
    from jax import lax

    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=(1.0 / np.sqrt(cin)), size=(2, 2, 2, cin, cout)), jnp.bfloat16)
    shape = (b,) + sp_in + (cin,)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = lax.conv_transpose(
                    x, w, (2, 2, 2), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                y = y * lax.rsqrt(ms + 1e-6).astype(y.dtype)
                y = y[:, ::2, ::2, ::2, :]
                y = jnp.concatenate([y] * (cin // cout), axis=-1)
                return y, None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def _bench_up_25d(sp_in, cin, cout, b, n: int):
    """Chained 2.5D transposed conv (ops/conv25d.conv_transpose3d_slicewise):
    per-D-tap conv_transpose2d at batch N*D + contiguous D-interleave."""
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.ops.conv25d import conv_transpose3d_slicewise

    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=(1.0 / np.sqrt(cin)), size=(2, 2, 2, cin, cout)), jnp.bfloat16)
    shape = (b,) + sp_in + (cin,)

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = conv_transpose3d_slicewise(x, w, (2, 2, 2))
                ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                y = y * lax.rsqrt(ms + 1e-6).astype(y.dtype)
                y = y[:, ::2, ::2, ::2, :]
                y = jnp.concatenate([y] * (cin // cout), axis=-1)
                return y, None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def _bench_up_matmul(sp_in, cin, cout, b, n: int):
    """ConvTranspose k=s=2 as ONE matmul + depth-to-space: each output
    voxel receives exactly one tap, so y = x @ W[(2,2,2) octants] then an
    interleaving reshape/transpose."""
    import jax.numpy as jnp
    from jax import lax

    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=(1.0 / np.sqrt(cin)), size=(2, 2, 2, cin, cout)), jnp.bfloat16)
    w2 = w.reshape(8, cin, cout).transpose(1, 0, 2).reshape(cin, 8 * cout)
    shape = (b,) + sp_in + (cin,)
    D, H, W = sp_in

    def make_fn(length):
        def run(x0):
            def body(x, _):
                y = x @ w2                     # [b, D, H, W, 8*cout]
                y = y.reshape(b, D, H, W, 2, 2, 2, cout)
                y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
                y = y.reshape(b, 2 * D, 2 * H, 2 * W, cout)
                ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                y = y * lax.rsqrt(ms + 1e-6).astype(y.dtype)
                y = y[:, ::2, ::2, ::2, :]
                y = jnp.concatenate([y] * (cin // cout), axis=-1)
                return y, None
            y, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return run

    return _time_scan(make_fn, shape, jnp.bfloat16, n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="all",
                    choices=["blocks", "shapes", "split", "blocked", "aniso",
                             "packed", "conv25d", "conv25dx", "conv2d",
                             "all"])
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sections", default="abc",
                    help="conv25dx sections to run (a=wide convs, "
                         "b=ConvTranspose, c=strided isolation)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend={jax.default_backend()} n={args.n}", flush=True)

    if args.mode in ("blocks", "all"):
        stages = [
            ("s0 128^3 C32", (128, 128, 128), 32, [1, 2, 4, 8]),
            ("s1 64^3 C64", (64, 64, 64), 64, [2, 4, 8]),
            ("s2 32^3 C128", (32, 32, 32), 128, [2, 4, 8]),
            ("s3 16^3 C256", (16, 16, 16), 256, [2, 8]),
        ]
        print("\n## fused block (conv+IN+LReLU), true per-iter")
        print("| stage | b | XLA ms (T/s) | Pallas ms (T/s) |", flush=True)
        print("|---|---|---|---|")
        for name, sp, c, bs in stages:
            for b in bs:
                flops = 2 * b * int(np.prod(sp)) * c * c * 27
                cells = []
                for pallas in (False, True):
                    try:
                        dt, t1, tn = bench_block(sp, c, b, pallas, args.n)
                        cells.append(f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})")
                    except Exception as e:
                        cells.append(f"FAIL:{type(e).__name__}")
                print(f"| {name} | {b} | {cells[0]} | {cells[1]} |",
                      flush=True)

    if args.mode in ("shapes", "all"):
        # constant total voxels = 4 x 128^3; does batch-vs-spatial shape move
        # the bare-conv rate at C=32/C=64?
        combos = [
            ("b4 128^3", (128, 128, 128), 4),
            ("b32 64^3", (64, 64, 64), 32),
            ("b256 32^3", (32, 32, 32), 256),
            ("b32 66x66x62", (66, 66, 62), 32),   # split-with-halo geometry
        ]
        print("\n## bare conv3d SAME, constant 4x128^3 voxels, true per-iter")
        print("| shape | C | ms (T/s) |", flush=True)
        print("|---|---|---|")
        for c in (32, 64):
            for name, sp, b in combos:
                flops = 2 * b * int(np.prod(sp)) * c * c * 27
                try:
                    dt, t1, tn = bench_bare_conv(sp, c, b, args.n)
                    cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
                except Exception as e:
                    cell = f"FAIL:{type(e).__name__}"
                print(f"| {name} | {c} | {cell} |", flush=True)

    if args.mode in ("blocked", "all"):
        print("\n## blocked conv (reshape+edge-concat pack) vs direct, "
              "true per-iter")
        print("| case | ms (T/s) |", flush=True)
        print("|---|---|")
        # raw regime ceiling: VALID conv at the blocked shapes
        for sp, c, b in (((34, 34, 34), 32, 128), ((34, 34, 34), 32, 256),
                         ((18, 18, 18), 32, 1024)):
            try:
                dt, flops = bench_valid_conv(sp, c, b, args.n)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}"
            print(f"| valid b{b} {sp[0]}^3 C{c} | {cell} |", flush=True)
        # single blocked SAME conv (pack+unpack every conv)
        for sp, c, b, blocks in (
                ((128, 128, 128), 32, 2, (32, 32, 32)),
                ((128, 128, 128), 32, 4, (32, 32, 32)),
                ((128, 128, 128), 32, 2, (16, 16, 16)),
                ((64, 64, 64), 64, 2, (32, 32, 32))):
            flops = 2 * b * int(np.prod(sp)) * c * c * 27
            try:
                dt, _, _ = bench_blocked_conv(sp, c, b, args.n, blocks)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}"
            print(f"| blocked b{b} {sp[0]}^3 C{c} bs{blocks[0]} | {cell} |",
                  flush=True)
        # 2-conv stage: blocked (pack amortized) vs XLA pair vs Pallas pair
        for sp, c, b, blocks in (
                ((128, 128, 128), 32, 2, (32, 32, 32)),
                ((128, 128, 128), 32, 4, (32, 32, 32)),
                ((64, 64, 64), 64, 2, (32, 32, 32))):
            flops = 2 * 2 * b * int(np.prod(sp)) * c * c * 27
            for tag, fn in (
                    ("stage-blocked", lambda: bench_blocked_stage(
                        sp, c, b, args.n, blocks)),
                    ("stage-xla", lambda: bench_xla_stage(sp, c, b, args.n)),
                    ("stage-pallas", lambda: bench_xla_stage(
                        sp, c, b, args.n, pallas=True))):
                try:
                    dt, _, _ = fn()
                    cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
                except Exception as e:
                    cell = f"FAIL:{type(e).__name__}"
                print(f"| {tag} b{b} {sp[0]}^3 C{c} | {cell} |", flush=True)

    if args.mode in ("packed", "all"):
        # DMA block pack (ops/pallas/block_pack): does the Pallas pack hold
        # HBM bandwidth, and does the fast conv regime survive the packed
        # layout's junk W columns + negative padding?
        print("\n## DMA-packed blocked conv (Pallas pack + XLA VALID conv)")
        print("| case | ms (T/s or GB/s) |", flush=True)
        print("|---|---|")
        for bs, c, nb in ((32, 32, 128), (32, 32, 256), (16, 32, 1024),
                          (32, 64, 16)):
            try:
                dt, flops = bench_packed_conv_regime(bs, c, nb, args.n)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f} T/s)"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}"
            print(f"| packconv nb{nb} bs{bs} C{c} | {cell} |", flush=True)
        for sp, c, b, bs in (((128, 128, 128), 32, 2, 32),
                             ((128, 128, 128), 32, 2, 16),
                             ((64, 64, 64), 64, 2, 32)):
            try:
                dt, nbytes = bench_pack_roundtrip(sp, c, b, bs, args.n)
                cell = (f"{dt*1e3:.2f} "
                        f"({2 * nbytes / dt / 1e9:.0f} GB/s eff)")
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}"
            print(f"| pack+unpack b{b} {sp[0]}^3 C{c} bs{bs} | {cell} |",
                  flush=True)
        for sp, c, b, bs in (((128, 128, 128), 32, 2, 32),
                             ((128, 128, 128), 32, 4, 32),
                             ((128, 128, 128), 32, 2, 16),
                             ((64, 64, 64), 64, 2, 32)):
            flops = 2 * 2 * b * int(np.prod(sp)) * c * c * 27
            try:
                dt, _, _ = bench_packed_stage(sp, c, b, args.n, bs)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f} T/s)"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}"
            print(f"| stage-packed b{b} {sp[0]}^3 C{c} bs{bs} | {cell} |",
                  flush=True)

    if args.mode in ("conv25d", "all"):
        # 2.5D decomposition (ops/conv25d): D folded into conv2d batch,
        # kd taps as channel groups, strided shift-add reduce.  No packing.
        print("\n## 2.5D conv (batched conv2d + D shift-add), true per-iter")
        print("| case | ms (T/s) |", flush=True)
        print("|---|---|")
        for sp, c, b, stride, cin in (
                ((128, 128, 128), 32, 2, (1, 1, 1), None),
                ((128, 128, 128), 32, 4, (1, 1, 1), None),
                ((128, 128, 128), 32, 8, (1, 1, 1), None),
                ((128, 128, 128), 64, 2, (2, 2, 2), 32),  # s0->s1 downsample
                ((64, 64, 64), 64, 2, (1, 1, 1), None),
                ((64, 64, 64), 64, 8, (1, 1, 1), None)):
            ci = cin or c
            out_vox = int(np.prod([s // st for s, st in zip(sp, stride)]))
            flops = 2 * b * out_vox * ci * c * 27
            try:
                dt, t1, tn = bench_conv25d(sp, c, b, args.n, stride, cin)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}: {str(e)[:120]}"
            # the chained s2 row upsamples the carry with jnp.repeat — a
            # harness artifact that dominated the timing (bogus 0.3 T/s,
            # RESULTS.md round 4); keep the row but label it so it can't
            # re-mislead — the one-shot isolation lives in ab_upsample.py
            sstr = ("s2 [harness artifact — see one-shot s2 isolation]"
                    if stride != (1, 1, 1) else "s1")
            print(f"| conv25d b{b} {sp[0]}^3 C{ci}->{c} {sstr} | {cell} |",
                  flush=True)
        for sp, c, b in (((128, 128, 128), 32, 2), ((128, 128, 128), 32, 4),
                         ((64, 64, 64), 64, 2)):
            flops = 2 * 2 * b * int(np.prod(sp)) * c * c * 27
            try:
                dt, t1, tn = bench_conv25d_stage(sp, c, b, args.n)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}: {str(e)[:120]}"
            print(f"| stage-25d b{b} {sp[0]}^3 C{c} | {cell} |", flush=True)

    if args.mode == "conv2d":
        # where does the bare 2D conv regime top out?  Informs whether the
        # conv25d gap-to-45+T/s is the conv2d itself (fold H next) or the
        # shift-add/IN epilogue (Pallas epilogue next).
        import jax
        import jax.numpy as jnp
        from jax import lax
        print("\n## bare conv2d regime scan (chained)", flush=True)
        print("| case | ms (T/s) |")
        print("|---|---|")

        def bench2d(b, hw, cin, cout, n):
            w = jnp.asarray(np.random.RandomState(3).normal(
                scale=1 / np.sqrt(9 * cin), size=(3, 3, cin, cout)),
                jnp.bfloat16)
            shape = (b, hw[0], hw[1], cin)

            def make_fn(length):
                def run(x0):
                    def body(x, _):
                        y = lax.conv_general_dilated(
                            x, w, (1, 1), "SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"))
                        ms = jnp.mean(jnp.square(y.astype(jnp.float32)))
                        y = y * lax.rsqrt(ms + 1e-6).astype(y.dtype)
                        if cout > cin:
                            y = y[..., :cin]
                        elif cout < cin:
                            y = jnp.concatenate([y] * (cin // cout), axis=-1)
                        return y, None
                    y, _ = lax.scan(body, x0, None, length=length)
                    return jnp.sum(y.astype(jnp.float32))
                return run

            return _time_scan(make_fn, shape, jnp.bfloat16, n)

        for b, hw, cin, cout in (
                (512, (128, 128), 32, 96),    # inside conv25d @ wb4 s0
                (512, (128, 128), 32, 128),   # padded-lane variant
                (512, (128, 128), 32, 32),    # single-tap variant
                (2048, (64, 128), 32, 96),    # H-fold regime probe (rate only)
                (8192, (32, 128), 32, 96),
                (256, (64, 64), 64, 192),     # s1 @ 64^3 b4
                (256, (64, 64), 128, 192),    # dec1 wide
                (512, (128, 128), 64, 96)):   # dec0 concat input
            flops = 2 * b * hw[0] * hw[1] * cin * cout * 9
            try:
                dt, t1, tn = bench2d(b, hw, cin, cout, args.n)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}: {str(e)[:90]}"
            print(f"| conv2d b{b} {hw[0]}x{hw[1]} C{cin}->{cout} | {cell} |",
                  flush=True)

    if args.mode == "conv25dx":
        # supplementary: (a) wide decoder convs (Cin=128 after skip concat),
        # (b) ConvTranspose upsampling cost at CT scale, (c) strided-conv
        # isolation — is the 0.3 T/s s2 pathology the conv2d or the chain's
        # repeat-upsample harness?
        import jax
        import jax.numpy as jnp
        from jax import lax
        print("\n## conv25d supplementary", flush=True)
        print("| case | ms (T/s) |")
        print("|---|---|")
        # (a) wide decoder conv: 64^3 Cin128 -> C64 via conv25d vs direct
        for sp, cout, b, cin in ((((64, 64, 64), 64, 2, 128),
                                  ((64, 64, 64), 64, 4, 128),
                                  ((128, 128, 128), 32, 2, 64))
                                 if "a" in args.sections else ()):
            flops = 2 * b * int(np.prod(sp)) * cin * cout * 27
            try:
                dt, t1, tn = bench_conv25d(sp, cout, b, args.n,
                                           (1, 1, 1), cin)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}: {str(e)[:90]}"
            print(f"| conv25d b{b} {sp[0]}^3 C{cin}->{cout} | {cell} |",
                  flush=True)
            try:
                dt, t1, tn = _bench_direct_cinout(sp, cout, b, args.n, cin)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}: {str(e)[:90]}"
            print(f"| direct  b{b} {sp[0]}^3 C{cin}->{cout} | {cell} |",
                  flush=True)
        # (b) ConvTranspose kernel=stride=2 at decoder scales, direct vs
        # matmul+depth-to-space
        for sp_in, cin, cout, b in ((((64, 64, 64), 64, 32, 4),
                                     ((64, 64, 64), 64, 32, 2),
                                     ((32, 32, 32), 128, 64, 4))
                                    if "b" in args.sections else ()):
            flops = 2 * b * int(np.prod(sp_in)) * cin * cout * 8
            for tag, fn in (("upT-direct", _bench_convtranspose),
                            ("upT-matmul", _bench_up_matmul),
                            ("upT-25d", _bench_up_25d)):
                try:
                    dt, t1, tn = fn(sp_in, cin, cout, b, args.n)
                    cell = f"{dt*1e3:.2f} ({flops/dt/1e12:.1f})"
                except Exception as e:
                    cell = f"FAIL:{type(e).__name__}: {str(e)[:90]}"
                print(f"| {tag} b{b} {sp_in[0]}^3 C{cin}->{cout} | {cell} |",
                      flush=True)
        # (c) strided isolation: one-shot timing (no chain) of the bare
        # strided conv25d vs bare strided direct conv, distinct inputs
        from lifelong_nnunet_tpu.ops.conv25d import conv3d_slicewise
        for name, op in () if "c" not in args.sections else (
                ("s2-25d", lambda x, w: conv3d_slicewise(x, w, (2, 2, 2))),
                ("s2-direct", lambda x, w: lax.conv_general_dilated(
                    x, w, (2, 2, 2), [(1, 1)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))):
            c_in, c_out, b, sp = 32, 64, 2, (128, 128, 128)
            w = jnp.asarray(np.random.RandomState(3).normal(
                scale=1 / np.sqrt(27 * c_in), size=(3, 3, 3, c_in, c_out)),
                jnp.bfloat16)
            f = jax.jit(lambda x: jnp.sum(op(x, w).astype(jnp.float32)))
            rng = np.random.RandomState(11)
            xs = [jnp.asarray(rng.normal(size=(b,) + sp + (c_in,)),
                              jnp.bfloat16) for _ in range(4)]
            _sync(f(xs[0]))
            ts = []
            for r in range(3):
                t0 = time.perf_counter()
                _sync(f(xs[1 + r]))
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            flops = 2 * b * int(np.prod(sp)) // 8 * c_in * c_out * 27
            print(f"| {name} b{b} 128^3 C32->64 one-shot | {dt*1e3:.1f} "
                  f"({flops/dt/1e12:.1f}) |", flush=True)

    if args.mode in ("aniso", "all"):
        # W-whole anisotropic blocks: split only D/H, keep W intact.  The
        # isotropic pack lost to XLA's minor-dim data movement (the W-axis
        # halo concat moves 64-byte slivers; the pack transpose touches the
        # minor dims — results/r4/stage_scan_blocked.log).  With blocks
        # (bd, bh, W): halo concats move contiguous >=8KB planes, the pack
        # transpose permutes MAJOR axes only, and _halo_axis on the W axis
        # (n=1) degenerates to the SAME zero-pad.  Open question this mode
        # answers: does XLA's conv reach the fast regime on [b*nd*nh,
        # bd+2, bh+2, W+2] shapes, and is the W-whole pack actually cheap?
        print("\n## W-whole anisotropic blocked conv, true per-iter")
        print("| case | ms (T/s) |", flush=True)
        print("|---|---|")
        # regime ceiling: bare VALID conv at the exact packed shapes
        for sp, c, b in (
                ((34, 34, 130), 32, 32),    # 128^3 b2, blocks (32,32,128)
                ((34, 34, 130), 32, 64),    # 128^3 b4
                ((18, 18, 130), 32, 128),   # 128^3 b2, blocks (16,16,128)
                ((34, 66, 130), 32, 16),    # 128^3 b2, blocks (32,64,128)
                ((34, 34, 66), 64, 8),      # 64^3 b2, blocks (32,32,64)
                ((18, 18, 66), 64, 32)):    # 64^3 b2, blocks (16,16,64)
            try:
                dt, flops = bench_valid_conv(sp, c, b, args.n)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}"
            print(f"| valid b{b} {sp[0]}x{sp[1]}x{sp[2]} C{c} | {cell} |",
                  flush=True)
        # single blocked SAME conv (pack+unpack every conv)
        for sp, c, b, blocks in (
                ((128, 128, 128), 32, 2, (32, 32, 128)),
                ((128, 128, 128), 32, 4, (32, 32, 128)),
                ((128, 128, 128), 32, 2, (16, 16, 128)),
                ((128, 128, 128), 32, 2, (32, 64, 128)),
                ((64, 64, 64), 64, 2, (32, 32, 64)),
                ((64, 64, 64), 64, 2, (16, 16, 64))):
            flops = 2 * b * int(np.prod(sp)) * c * c * 27
            try:
                dt, _, _ = bench_blocked_conv(sp, c, b, args.n, blocks)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}"
            print(f"| blocked b{b} {sp[0]}^3 C{c} bs{blocks[0]}x{blocks[1]}"
                  f"x{blocks[2]} | {cell} |", flush=True)
        # 2-conv stage in blocked layout (pack amortized over the pair)
        for sp, c, b, blocks in (
                ((128, 128, 128), 32, 2, (32, 32, 128)),
                ((128, 128, 128), 32, 4, (32, 32, 128)),
                ((128, 128, 128), 32, 2, (16, 16, 128)),
                ((64, 64, 64), 64, 2, (32, 32, 64))):
            flops = 2 * 2 * b * int(np.prod(sp)) * c * c * 27
            try:
                dt, _, _ = bench_blocked_stage(sp, c, b, args.n, blocks)
                cell = f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})"
            except Exception as e:
                cell = f"FAIL:{type(e).__name__}"
            print(f"| stage-blocked b{b} {sp[0]}^3 C{c} bs{blocks[0]}x"
                  f"{blocks[1]}x{blocks[2]} | {cell} |", flush=True)

    if args.mode in ("split", "all"):
        check_split_correct()
        print("\n## split-with-halo SAME conv vs direct, true per-iter")
        print("| shape | C | splits | direct ms (T/s) | split ms (T/s) |",
              flush=True)
        print("|---|---|---|---|---|")
        cases = [
            ((128, 128, 128), 32, 2, (2, 2, 2)),
            ((128, 128, 128), 32, 4, (2, 2, 2)),
            ((128, 128, 128), 32, 4, (4, 4, 2)),
            ((64, 64, 64), 64, 4, (2, 2, 2)),
        ]
        for sp, c, b, splits in cases:
            flops = 2 * b * int(np.prod(sp)) * c * c * 27
            cells = []
            try:
                dt, _, _ = bench_bare_conv(sp, c, b, args.n)
                cells.append(f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})")
            except Exception as e:
                cells.append(f"FAIL:{type(e).__name__}")
            try:
                dt, _, _ = bench_split_conv(sp, c, b, args.n, splits)
                cells.append(f"{dt*1e3:.1f} ({flops/dt/1e12:.1f})")
            except Exception as e:
                cells.append(f"FAIL:{type(e).__name__}")
            print(f"| b{b} {sp[0]}x{sp[1]}x{sp[2]} | {c} | {splits} "
                  f"| {cells[0]} | {cells[1]} |", flush=True)


if __name__ == "__main__":
    main()
