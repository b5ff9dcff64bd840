"""Isolate the Mosaic compile failure in ops/pallas/block_pack (round 4).

results/r4/stage_scan_packed.log: every `pack+unpack` / `stage-packed` case
dies with MosaicError (remote tpu_compile_helper exit 1) while the pure-XLA
`packconv` cases hit 49-65 TFLOP/s.  So one (or both) of the two Pallas DMA
kernels crashes Mosaic.  CPU tests ran interpret-mode only, which skips the
Mosaic pipeline entirely — this is the first on-chip compile.

Hypotheses, each isolated as a variant below:
  H1 4-D grid          -> pack_grid1 folds the grid to 1-D
  H2 DMA-writing into a PIPELINED output block -> pack_hbm / pack_stage
     keep the output in ANY (direct HBM->HBM, or VMEM-staged)
  H3 channels-last minor dim C=32 (non-128 lane) on the pipelined block
     -> same ANY variants dodge it; pack_cur vs them separates H2/H3
  H4 unpack (pipelined INPUT + 3-sliced-dim HBM write) crashes on its own
     -> unpack_cur isolated; unpack_hbm / unpack_stage as fixes

Every case prints ok/FAIL + achieved GB/s + max-abs error vs a numpy
reference, in-process (MosaicError is catchable — the scan proved it).

Usage: python tools/repro_pack.py [--quick]   (run on an idle chip)
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _round8(v: int) -> int:
    return -(-v // 8) * 8


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small config only (compile check, no bandwidth)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lifelong_nnunet_tpu.ops.pallas import block_pack as bp

    print(f"backend={jax.default_backend()} jax={jax.__version__}", flush=True)

    # config: small for correctness, CT-stage-0-like for bandwidth
    if args.quick:
        B, S, C, bs = 1, 64, 32, 32
    else:
        B, S, C, bs = 2, 128, 32, 32
    nd = nh = nw = S // bs
    nb = B * nd * nh * nw
    We = _round8(bs + 2)
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((B, S, S, S, C), dtype=np.float32)
    x = jnp.asarray(x_np, dtype)
    xp_np = np.pad(np.asarray(x, np.float32),
                   ((0, 0), (1, 1), (1, 1), (1, We - bs - 1), (0, 0)))

    # numpy reference pack (matches pack_blocks contract incl. junk cols)
    ref = np.empty((nb, bs + 2, bs + 2, We, C), np.float32)
    n = 0
    for b in range(B):
        for i in range(nd):
            for j in range(nh):
                for k in range(nw):
                    ref[n] = xp_np[b, i * bs:i * bs + bs + 2,
                                   j * bs:j * bs + bs + 2,
                                   k * bs:k * bs + We]
                    n += 1
    ref_j = jnp.asarray(ref, dtype)  # exact unpack input
    # unpack reference: identity on the un-halo'd interior
    y_blk = ref_j[:, 1:1 + bs, 1:1 + bs, 1:1 + bs, :]
    moved_pack = ref.size * 2  # bf16 bytes
    moved_unpack = y_blk.size * 2

    def check(tag, fn, inp, want, moved):
        try:
            out = jax.jit(fn)(inp)
            out.block_until_ready()
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - want.astype(jnp.float32))))
            if args.quick:
                print(f"| {tag} | ok err={err:.2e} |", flush=True)
                return
            # bandwidth: median of 3 distinct-input dispatches
            ts = []
            for r in range(3):
                xi = inp + jnp.asarray(r + 1, dtype)  # distinct input
                o = jax.jit(fn)(xi)
                o.block_until_ready()
                t0 = time.perf_counter()
                o2 = jax.jit(fn)(xi + jnp.asarray(0.5, dtype))
                o2.block_until_ready()
                ts.append(time.perf_counter() - t0)
            ms = sorted(ts)[1] * 1e3
            gbs = 2 * moved / sorted(ts)[1] / 1e9  # read+write
            print(f"| {tag} | ok err={err:.2e} {ms:.2f} ms "
                  f"({gbs:.0f} GB/s) |", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}".replace("\n", " ")[:1200]
            print(f"| {tag} | FAIL {msg} |", flush=True)
        # health probe: distinguishes kernel-compile failures from a worker
        # wedged by a previous compile-helper crash (the 21:22Z outage
        # followed repeated tpu_compile_helper exits)
        try:
            v = float(jnp.dot(jnp.ones((128, 128), jnp.bfloat16),
                              jnp.ones((128, 128), jnp.bfloat16)).sum())
            print(f"  # probe ok ({v:.0f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  # PROBE DEAD: {type(e).__name__}", flush=True)

    # ---- current kernels ----------------------------------------------
    # block_pack now emits the fused-minor layout [nb, bs+2, He, We, C]
    # (He = We = round8(bs+2)) with Q-deep pipelined DMAs; reference below.
    He_c = _round8(bs + 2)
    ref_c = np.empty((nb, bs + 2, He_c, We, C), np.float32)
    xpc_np = np.pad(np.asarray(x, np.float32),
                    ((0, 0), (1, 1), (1, He_c - bs - 1), (1, We - bs - 1),
                     (0, 0)))
    n = 0
    for b in range(B):
        for i in range(nd):
            for j in range(nh):
                for k in range(nw):
                    ref_c[n] = xpc_np[b, i * bs:i * bs + bs + 2,
                                      j * bs:j * bs + He_c,
                                      k * bs:k * bs + We]
                    n += 1
    check("pack_cur", lambda v: bp.pack_blocks(v, bs), x,
          jnp.asarray(ref_c, dtype), ref_c.size * 2)
    check("unpack_cur",
          lambda v: bp.unpack_blocks(v, B, (nd, nh, nw)),
          jnp.asarray(ref_c[:, 1:1 + bs, 1:1 + bs, 1:1 + bs, :], dtype),
          x, moved_unpack)

    # ---- H1: 1-D grid, still pipelined output ------------------------
    def pack_grid1(v):
        xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (1, We - bs - 1), (0, 0)))

        def kern(xp_hbm, out_ref, sem):
            m = pl.program_id(0)
            b = m // (nd * nh * nw)
            r = m % (nd * nh * nw)
            i = r // (nh * nw)
            r = r % (nh * nw)
            j = r // nw
            k = r % nw
            dma = pltpu.make_async_copy(
                xp_hbm.at[b, pl.ds(i * bs, bs + 2), pl.ds(j * bs, bs + 2),
                          pl.ds(k * bs, We), :],
                out_ref.at[0], sem)
            dma.start()
            dma.wait()

        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, bs + 2, bs + 2, We, C),
                                   lambda m: (m, 0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, bs + 2, bs + 2, We, C),
                                           v.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )(xp)

    check("pack_grid1", pack_grid1, x, ref_j, moved_pack)

    # ---- H2/H3: output in ANY, direct HBM->HBM DMA -------------------
    def pack_hbm(v):
        xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (1, We - bs - 1), (0, 0)))

        def kern(xp_hbm, out_hbm, sem):
            b = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)
            k = pl.program_id(3)
            m = ((b * nd + i) * nh + j) * nw + k
            dma = pltpu.make_async_copy(
                xp_hbm.at[b, pl.ds(i * bs, bs + 2), pl.ds(j * bs, bs + 2),
                          pl.ds(k * bs, We), :],
                out_hbm.at[m], sem)
            dma.start()
            dma.wait()

        return pl.pallas_call(
            kern,
            grid=(B, nd, nh, nw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nb, bs + 2, bs + 2, We, C),
                                           v.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )(xp)

    check("pack_hbm", pack_hbm, x, ref_j, moved_pack)

    # ---- H2 alt: VMEM-staged (HBM->VMEM->HBM) -------------------------
    def pack_stage(v):
        xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (1, We - bs - 1), (0, 0)))

        def kern(xp_hbm, out_hbm, vmem, s1, s2):
            b = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)
            k = pl.program_id(3)
            m = ((b * nd + i) * nh + j) * nw + k
            d1 = pltpu.make_async_copy(
                xp_hbm.at[b, pl.ds(i * bs, bs + 2), pl.ds(j * bs, bs + 2),
                          pl.ds(k * bs, We), :],
                vmem, s1)
            d1.start()
            d1.wait()
            d2 = pltpu.make_async_copy(vmem, out_hbm.at[m], s2)
            d2.start()
            d2.wait()

        return pl.pallas_call(
            kern,
            grid=(B, nd, nh, nw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nb, bs + 2, bs + 2, We, C),
                                           v.dtype),
            scratch_shapes=[pltpu.VMEM((bs + 2, bs + 2, We, C), dtype),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(xp)

    check("pack_stage", pack_stage, x, ref_j, moved_pack)

    # ---- H4 fixes: unpack with ANY input (HBM->HBM) -------------------
    def unpack_hbm(yb):
        def kern(y_hbm, out_hbm, sem):
            b = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)
            k = pl.program_id(3)
            m = ((b * nd + i) * nh + j) * nw + k
            dma = pltpu.make_async_copy(
                y_hbm.at[m],
                out_hbm.at[b, pl.ds(i * bs, bs), pl.ds(j * bs, bs),
                           pl.ds(k * bs, bs), :],
                sem)
            dma.start()
            dma.wait()

        return pl.pallas_call(
            kern,
            grid=(B, nd, nh, nw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, S, S, S, C), yb.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )(yb)

    check("unpack_hbm", unpack_hbm, y_blk, x, moved_unpack)

    def unpack_stage(yb):
        def kern(y_hbm, out_hbm, vmem, s1, s2):
            b = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)
            k = pl.program_id(3)
            m = ((b * nd + i) * nh + j) * nw + k
            d1 = pltpu.make_async_copy(y_hbm.at[m], vmem, s1)
            d1.start()
            d1.wait()
            d2 = pltpu.make_async_copy(
                vmem,
                out_hbm.at[b, pl.ds(i * bs, bs), pl.ds(j * bs, bs),
                           pl.ds(k * bs, bs), :],
                s2)
            d2.start()
            d2.wait()

        return pl.pallas_call(
            kern,
            grid=(B, nd, nh, nw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, S, S, S, C), yb.dtype),
            scratch_shapes=[pltpu.VMEM((bs, bs, bs, C), dtype),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(yb)

    check("unpack_stage", unpack_stage, y_blk, x, moved_unpack)

    # ---- H3 fix: FUSED-MINOR layout (W and C folded into one minor dim) ----
    # conv3d's proven DMA pattern: minor extent a 128-multiple, second-minor
    # 8-aligned starts/extents.  pack_cur's minor is C=32 (not 128-aligned).
    # Folding WxC makes the minor extent We*C = 40*32 = 1280 (10x128) with
    # 128-aligned starts k*bs*C; H becomes second-minor -> fetch extent
    # rounded to He=round8(bs+2)=40 (junk rows trimmed by the conv's
    # negative high padding, like the W junk columns).
    He = _round8(bs + 2)
    ref_f = np.empty((nb, bs + 2, He, We, C), np.float32)
    xpf_np = np.pad(np.asarray(x, np.float32),
                    ((0, 0), (1, 1), (1, He - bs - 1), (1, We - bs - 1),
                     (0, 0)))
    n = 0
    for b in range(B):
        for i in range(nd):
            for j in range(nh):
                for k in range(nw):
                    ref_f[n] = xpf_np[b, i * bs:i * bs + bs + 2,
                                      j * bs:j * bs + He,
                                      k * bs:k * bs + We]
                    n += 1
    ref_fj = jnp.asarray(ref_f, dtype)
    moved_packf = ref_f.size * 2

    def _pack_fusedm(v, pipelined):
        xp = jnp.pad(v, ((0, 0), (1, 1), (1, He - bs - 1),
                         (1, We - bs - 1), (0, 0)))
        Wp = xp.shape[3]
        xf = xp.reshape(B, xp.shape[1], xp.shape[2], Wp * C)  # free reshape

        def kern(x_hbm, out_ref, sem):
            b = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)
            k = pl.program_id(3)
            m = ((b * nd + i) * nh + j) * nw + k
            dst = out_ref.at[0] if pipelined else out_ref.at[m]
            dma = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(i * bs, bs + 2), pl.ds(j * bs, He),
                         pl.ds(k * bs * C, We * C)],
                dst, sem)
            dma.start()
            dma.wait()

        out_spec = (pl.BlockSpec((1, bs + 2, He, We * C),
                                 lambda b, i, j, k:
                                 (((b * nd + i) * nh + j) * nw + k, 0, 0, 0))
                    if pipelined else pl.BlockSpec(memory_space=pl.ANY))
        y = pl.pallas_call(
            kern,
            grid=(B, nd, nh, nw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((nb, bs + 2, He, We * C), v.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )(xf)
        return y.reshape(nb, bs + 2, He, We, C)

    check("pack_fusedm_pipe", lambda v: _pack_fusedm(v, True),
          x, ref_fj, moved_packf)
    check("pack_fusedm_hbm", lambda v: _pack_fusedm(v, False),
          x, ref_fj, moved_packf)

    def unpack_fusedm(yb):
        yf = yb.reshape(nb, bs, bs, bs * C)  # free reshape

        def kern(y_hbm, out_hbm, sem):
            b = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)
            k = pl.program_id(3)
            m = ((b * nd + i) * nh + j) * nw + k
            dma = pltpu.make_async_copy(
                y_hbm.at[m],
                out_hbm.at[b, pl.ds(i * bs, bs), pl.ds(j * bs, bs),
                           pl.ds(k * bs * C, bs * C)],
                sem)
            dma.start()
            dma.wait()

        out = pl.pallas_call(
            kern,
            grid=(B, nd, nh, nw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, S, S, S * C), yb.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )(yf)
        return out.reshape(B, S, S, S, C)

    check("unpack_fusedm", unpack_fusedm, y_blk, x, moved_unpack)
    return 0


if __name__ == "__main__":
    sys.exit(main())
