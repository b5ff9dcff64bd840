"""Gaussian-weighted sliding-window inference with mirroring TTA.

TPU-native equivalent of upstream nnU-Net's
``predict_preprocessed_data_return_seg_and_softmax`` (invoked by the
reference at ``inference/predict.py:208-219``): tile the volume with
half-patch-overlapping windows, weight each window's softmax by a Gaussian
importance map, accumulate, normalize.

TPU-first design:
  * windows are processed in **batches** (``window_batch``) so convs hit the
    MXU at high utilization instead of one-window-at-a-time
  * gather (dynamic_slice) and scatter-add (dynamic_update_slice) run inside
    one jitted program; accumulators never leave HBM
  * mirroring TTA is a static unroll of flip combinations inside the same
    program (the reference runs 8 sequential torch forwards)
  * everything is shape-static: the window grid is precomputed on host from
    the (padded) volume shape; one compilation per volume shape — callers
    should pad volume shapes to a coarse bucket to maximize cache hits
    (`bucket_shape`).
"""

from __future__ import annotations

import itertools
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


from functools import lru_cache


@lru_cache(maxsize=64)
def _cached_grid(image_size: tuple, patch_size: tuple, step_fraction: float,
                 window_batch: int):
    """Origins (padded to a window_batch multiple) for a padded-volume shape —
    pure function of shapes, cached across the volume stream.  Padding repeats
    origin 0; `valid` masks the repeats out of the accumulation (a duplicated
    window does NOT cancel in the normalization wherever other windows
    overlap it — it would bias the average toward the duplicate)."""
    steps = compute_steps(image_size, patch_size, step_fraction)
    origins = np.array(list(itertools.product(*steps)), dtype=np.int32)
    n_real = len(origins)
    wb = max(1, min(window_batch, n_real))
    rem = (-n_real) % wb
    if rem:
        origins = np.concatenate([origins, np.repeat(origins[:1], rem, axis=0)])
    valid = np.zeros(len(origins), np.float32)
    valid[:n_real] = 1.0
    return origins, wb, valid


class _ByteBoundedCache:
    """LRU cache bounded by TOTAL VALUE BYTES, not entry count: one CT-scale
    f32 weight map is ~300 MB, so 8 cached entries could pin ~2.4 GB on the
    single-CPU relay host (whose throughput halves under host memory
    pressure).  The newest entry is always kept, even if it alone exceeds
    the cap.  Cap override: ``LNN_WINV_CACHE_MB`` (default 512)."""

    def __init__(self, max_bytes: int):
        self.max_bytes = max_bytes
        self._d = {}          # key -> np.ndarray; dict preserves insert order
        self.total_bytes = 0

    def get(self, key):
        val = self._d.get(key)
        if val is not None:  # refresh recency
            del self._d[key]
            self._d[key] = val
        return val

    def put(self, key, val: np.ndarray):
        if key in self._d:
            self.total_bytes -= self._d.pop(key).nbytes
        self._d[key] = val
        self.total_bytes += val.nbytes
        while self.total_bytes > self.max_bytes and len(self._d) > 1:
            oldest_key = next(iter(self._d))
            self.total_bytes -= self._d.pop(oldest_key).nbytes

    def clear(self):
        self._d.clear()
        self.total_bytes = 0


_WINV_CACHE = _ByteBoundedCache(
    int(os.environ.get("LNN_WINV_CACHE_MB", "512")) * (1 << 20))


def _weight_inv(vol_shape: tuple, patch_size: tuple, grid_shape: tuple,
                use_gaussian: bool) -> np.ndarray:
    """1 / (summed per-window importance) for a REGULAR half-patch-stride grid.

    The weight accumulator is data-independent, so it is computed once on host
    and shipped as a constant instead of being scatter-accumulated on device
    every volume (it was half the serialized-scatter cost).

    The sum over the Cartesian window grid factorizes into one comb-sum PER
    AXIS (shifts along different axes commute): axis a replaces extent p_a by
    the full volume extent via grid_shape[a] shifted adds.  That is
    O(Σ_a n_a · partial-volume) instead of O(Π_a n_a · patch) — ~12x fewer
    element-adds at CT scale (512³-class volumes), in f32.  Cached in a
    byte-bounded LRU (see :class:`_ByteBoundedCache`)."""
    key = (vol_shape, patch_size, grid_shape, use_gaussian)
    cached = _WINV_CACHE.get(key)
    if cached is not None:
        return cached
    g = (gaussian_importance_map(patch_size) if use_gaussian
         else np.ones(patch_size, np.float32))
    steps = tuple(p // 2 for p in patch_size)
    w = g.astype(np.float32)
    # expand the largest axes last so intermediates stay small
    for a in sorted(range(len(vol_shape)), key=lambda a: vol_shape[a]):
        shape = list(w.shape)
        shape[a] = vol_shape[a]
        out = np.zeros(shape, np.float32)
        sl = [slice(None)] * len(shape)
        for i in range(grid_shape[a]):
            sl[a] = slice(i * steps[a], i * steps[a] + patch_size[a])
            out[tuple(sl)] += w
        w = out
    result = 1.0 / w
    _WINV_CACHE.put(key, result)
    return result


def compute_steps(image_size, patch_size, step_fraction: float = 0.5) -> list:
    """Window origins per axis: evenly spaced, spacing <= patch*step_fraction,
    first at 0 and last flush with the volume end (nnU-Net grid)."""
    steps = []
    for ims, ps in zip(image_size, patch_size):
        if ims <= ps:
            steps.append([0])
            continue
        max_step = ps * step_fraction
        num = int(np.ceil((ims - ps) / max_step)) + 1
        actual = (ims - ps) / max(num - 1, 1)
        steps.append([int(np.round(actual * i)) for i in range(num)])
    return steps


@lru_cache(maxsize=16)
def gaussian_importance_map(patch_size, sigma_scale: float = 1 / 8) -> np.ndarray:
    """Gaussian centered in the patch, normalized to max 1, zero-floor lifted
    to the smallest positive value (so every voxel gets weight). Cached —
    recomputing the scipy filter cost ~7 ms per volume in traces."""
    patch_size = tuple(int(p) for p in patch_size)
    tmp = np.zeros(patch_size, dtype=np.float64)
    center = tuple(s // 2 for s in patch_size)
    tmp[center] = 1.0
    from scipy.ndimage import gaussian_filter
    sigmas = [s * sigma_scale for s in patch_size]
    g = gaussian_filter(tmp, sigmas, mode="constant")
    g = g / g.max()
    g[g == 0] = g[g > 0].min()
    return g.astype(np.float32)


def _center_pads(spatial, patch_size):
    """Centered pad-to-at-least-patch config for spatial dims.  Returns
    ([[lo, hi], ...], [undo slice, ...]) — THE padding rule for inference
    (shared by pad_to_min and _prepare_meta)."""
    pads, sl = [], []
    for s, p in zip(spatial, patch_size):
        need = max(0, p - s)
        lo = need // 2
        pads.append([lo, need - lo])
        sl.append(slice(lo, lo + s))
    return pads, sl


def pad_to_min(data: np.ndarray, patch_size):
    """Pad spatial dims of [*, C]-last array up to at least patch size
    (centered, zero padding). Returns (padded, slicer-to-undo)."""
    pads, sl = _center_pads(data.shape[:-1], patch_size)
    return np.pad(data, [tuple(p) for p in pads] + [(0, 0)]), tuple(sl)


def bucket_shape(shape, patch_size, step_fraction: float = 0.5):
    """Round spatial shape up to the next window-grid-equivalent size so
    different volumes share compilations (grid spacing = patch*step)."""
    out = []
    for s, p in zip(shape, patch_size):
        step = max(1, int(p * step_fraction))
        out.append(p + step * int(np.ceil(max(0, s - p) / step)))
    return tuple(out)


# TTA-expanded batch elements (B * flip-combos * patch voxels) above which
# the flip variants run as sequential forwards instead of one big batch: at
# CT scale (128^3, 16-deep expanded batch) the first conv stage's activations
# are ~2 GB and pad 4x in the 128-lane tile (32 channels), which OOMs HBM
# (measured); at small scales the single big batch is ~1.5x faster.
_TTA_BATCH_MAX_ELEMS = 16_000_000


def _tta_forward(apply_fn, params, x, mirror_axes):
    """x: [B, *patch, C] -> mean softmax over mirror combos [B, *patch, K].
    Flip variants are stacked into ONE forward batch (B*combos) so the convs
    run at maximum batch — unless the expanded batch would blow HBM (see
    _TTA_BATCH_MAX_ELEMS), in which case variants run sequentially."""
    combos = [c for r in range(len(mirror_axes) + 1)
              for c in itertools.combinations(mirror_axes, r)]
    if len(combos) == 1:
        return jax.nn.softmax(apply_fn(params, x)[0].astype(jnp.float32), axis=-1)
    expanded = x.shape[0] * len(combos) * int(np.prod(x.shape[1:-1]))
    if expanded > _TTA_BATCH_MAX_ELEMS:
        # lax.scan over the flip variants: ONE compiled forward whose buffers
        # are reused each iteration (unrolled sequential forwards kept every
        # variant's norm intermediates live simultaneously — measured 52 GB
        # at CT scale).  Flips become flag-selected lax.rev so axes stay
        # static inside the scan body.
        mirror_axes = tuple(mirror_axes)
        flags = np.zeros((len(combos), len(mirror_axes)), bool)
        for i, c in enumerate(combos):
            for a in c:
                flags[i, mirror_axes.index(a)] = True
        acc0 = jax.nn.softmax(apply_fn(params, x)[0].astype(jnp.float32), axis=-1)

        def body(acc, f):
            xv = x
            for j, a in enumerate(mirror_axes):
                xv = jnp.where(f[j], jnp.flip(xv, axis=a + 1), xv)
            logits = apply_fn(params, xv)[0].astype(jnp.float32)
            for j, a in enumerate(mirror_axes):
                logits = jnp.where(f[j], jnp.flip(logits, axis=a + 1), logits)
            return acc + jax.nn.softmax(logits, axis=-1), None

        acc, _ = jax.lax.scan(body, acc0, jnp.asarray(flags[1:]))
        return acc / len(combos)
    variants = [jnp.flip(x, axis=[a + 1 for a in c]) if c else x for c in combos]
    big = jnp.concatenate(variants, axis=0)
    logits = apply_fn(params, big)[0].astype(jnp.float32)
    parts = jnp.split(logits, len(combos), axis=0)
    acc = 0.0
    for combo, part in zip(combos, parts):
        if combo:
            part = jnp.flip(part, axis=[a + 1 for a in combo])
        acc = acc + jax.nn.softmax(part, axis=-1)
    return acc / len(combos)


def _tta_forward_cm(apply_fn, params, x, mirror_axes):
    """Class-major TTA forward: x [B, *patch, C] -> mean softmax over mirror
    combos as [K, B, *patch] float32.

    Motivation (measured, RESULTS.md round 2): with num_classes ~= 3 in the
    minor dim, every f32 op over the logits pads K up to the 128-lane tile —
    the channel-minor TTA assembly cost ~22 ms/volume at hippocampus scale
    (vs 43 ms for the entire 64-window forward).  Here the logits move to
    class-MAJOR immediately after the network (one transpose XLA fuses into
    the head conv's epilogue) and softmax / unflip / mean all run with wide
    spatial dims in the lanes.

    The mirror-combo mean uses a pairwise unflip-reduction over flip bits
    (3 halving passes) instead of 2^n independent split+flip+add passes."""
    mirror_axes = tuple(mirror_axes)
    n_ax = len(mirror_axes)
    if n_ax == 0:
        logits = jnp.moveaxis(apply_fn(params, x)[0], -1, 0).astype(jnp.float32)
        return jax.nn.softmax(logits, axis=0)
    # combos in BITMASK order: bit j of the combo index <=> mirror_axes[j]
    combos = [tuple(a for j, a in enumerate(mirror_axes) if (c >> j) & 1)
              for c in range(2 ** n_ax)]
    b = x.shape[0]
    expanded = b * len(combos) * int(np.prod(x.shape[1:-1]))
    if expanded > _TTA_BATCH_MAX_ELEMS:
        # memory-capped scales: reuse the scanned sequential-variant path,
        # then transpose once (these scales are scatter-bound anyway)
        return jnp.moveaxis(_tta_forward(apply_fn, params, x, mirror_axes),
                            -1, 0)
    variants = [jnp.flip(x, axis=[a + 1 for a in c]) if c else x for c in combos]
    big = jnp.concatenate(variants, axis=0)
    logits = apply_fn(params, big)[0]                      # [nc*B, *patch, K]
    s = jax.nn.softmax(jnp.moveaxis(logits, -1, 0).astype(jnp.float32), axis=0)
    # [K, nc*B, *patch] -> [K, 2, ..., 2, B, *patch] (leading 2 = MSB = bit
    # n_ax-1); reduce one flip bit per pass, unflipping the flipped half
    s = s.reshape((s.shape[0],) + (2,) * n_ax + (b,) + x.shape[1:-1])
    for j in reversed(range(n_ax)):
        s = s[:, 0] + jnp.flip(s[:, 1], axis=j + 2 + mirror_axes[j])
    return s / len(combos)


def _scan_forward(params, data, origins_b, gaussian, apply_fn, patch_size,
                  mirror_axes, buf_dtype):
    """lax.scan the TTA forward over window batches.  origins_b [n_b, wb, dim]
    (may be traced values); returns class-major [n_b, K, wb, *patch]."""
    dim = len(patch_size)

    def gather_window(origin):
        return jax.lax.dynamic_slice(
            data, tuple(origin[a] for a in range(dim)) + (0,),
            patch_size + (data.shape[-1],))

    def body(_, batch_origins):
        windows = jax.vmap(gather_window)(batch_origins)
        probs = _tta_forward_cm(apply_fn, params, windows, mirror_axes)
        probs = probs * gaussian[None, None]          # [K, wb, *patch]
        return 0, probs.astype(buf_dtype)

    _, ys = jax.lax.scan(body, 0, origins_b)
    return ys


def _grid_probs(params, data, grid, shift, gaussian, apply_fn, num_classes,
                window_batch, patch_size, mirror_axes, buf_dtype):
    """Forward a rectangular window grid (origin = index*steps [+ shift]) and
    return class-major gaussian-weighted probs [K, *grid, *patch].  The
    origin list is padded to a window_batch multiple by repeating the last
    origin; the extra rows are sliced away before the reshape."""
    dim = len(patch_size)
    steps = tuple(p // 2 for p in patch_size)
    n_windows = int(np.prod(grid))
    base = np.array(list(itertools.product(*[range(n) for n in grid])),
                    dtype=np.int32) * np.array(steps, dtype=np.int32)
    wb = max(1, min(window_batch, n_windows))
    rem = (-n_windows) % wb
    if rem:
        base = np.concatenate([base, np.repeat(base[-1:], rem, axis=0)])
    origins = jnp.asarray(base)
    if shift is not None:
        origins = origins + shift[None]
    ys = _scan_forward(params, data, origins.reshape(-1, wb, dim), gaussian,
                       apply_fn, patch_size, mirror_axes, buf_dtype)
    probs = jnp.moveaxis(ys, 1, 0).reshape(
        (num_classes, -1) + patch_size)[:, :n_windows]
    return probs.reshape((num_classes,) + tuple(grid) + patch_size)


def _oa_accumulate(probs, patch_size, vol_shape):
    """Scatter-free overlap-add of a REGULAR half-patch-stride window grid.

    probs: class-major [K, *grid, *patch]; returns [K, *vol] float32.
    Windows split into 2^dim parity groups; within a group, half-patch-stride
    windows are exactly adjacent, so the group's windows tile a dense
    subvolume via a reshape + transpose, and groups combine with 2^dim static
    pads + adds (zero scatters)."""
    dim = len(patch_size)
    steps = tuple(p // 2 for p in patch_size)
    num_classes = probs.shape[0]
    acc = jnp.zeros((num_classes,) + tuple(vol_shape), jnp.float32)
    for g in itertools.product(range(2), repeat=dim):
        sub = probs[(slice(None),) + tuple(slice(gi, None, 2) for gi in g)]
        m = sub.shape[1:1 + dim]
        if any(mi == 0 for mi in m):
            continue
        perm = [0]
        for a in range(dim):
            perm += [1 + a, 1 + dim + a]
        dense = sub.transpose(perm).reshape(
            (num_classes,) + tuple(m[a] * patch_size[a] for a in range(dim)))
        pad_cfg = [(0, 0)] + [(g[a] * steps[a],
                               vol_shape[a] - g[a] * steps[a]
                               - m[a] * patch_size[a])
                              for a in range(dim)]
        acc = acc + jnp.pad(dense, pad_cfg).astype(jnp.float32)
    return acc


@partial(jax.jit, static_argnames=("apply_fn", "num_classes", "window_batch",
                                   "patch_size", "grid_shape", "mirror_axes",
                                   "output"))
def _sliding_window_oa_jit(params, data, w_inv, gaussian, apply_fn, num_classes,
                           window_batch, patch_size, grid_shape, mirror_axes,
                           output="probs"):
    """Overlap-add sliding window for a REGULAR grid (stride = patch//2 on
    every axis; callers guarantee this by bucket-padding the volume).

    The per-window scatter-accumulate of `_sliding_window_jit` serializes on
    TPU (measured ~58% of volume latency at hippocampus scale).  Here window
    probabilities are stacked into a [W, *patch, K] buffer by the forward
    scan, then accumulated with ZERO scatters: windows split into 2^dim
    parity groups; within a group, half-patch-stride windows are exactly
    adjacent, so the group's windows tile a dense subvolume via a reshape +
    transpose, and groups combine with 2^dim static pads + adds.  The weight
    normalizer is the host-precomputed constant `w_inv` (data-independent).

    Memory/layout: everything downstream of the network runs CLASS-MAJOR
    ([K, ...] with spatial dims minor) — a channels-last f32 buffer with
    K ~= 3 in the minor dim pads K up to the 128-lane TPU tile (~42x HBM
    expansion and traffic; measured as ~22 ms/volume of TTA-assembly overhead
    at hippocampus scale vs 43 ms for the whole 64-window forward).  The
    window buffer is bf16 for 'seg' output (argmax after f32 accumulation
    tolerates it), f32 otherwise."""
    vol_shape = data.shape[:-1]
    probs = _grid_probs(params, data, grid_shape, None, gaussian, apply_fn,
                        num_classes, window_batch, patch_size, mirror_axes,
                        jnp.bfloat16 if output == "seg" else jnp.float32)
    acc = _oa_accumulate(probs, patch_size, vol_shape)
    return _oa_finalize(acc, w_inv, output)


@partial(jax.jit, static_argnames=("apply_fn", "num_classes", "window_batch",
                                   "patch_size", "grid_shape", "mirror_axes",
                                   "output"))
def _sliding_window_oa_vmapped(params, data_b, w_inv, gaussian, apply_fn,
                               num_classes, window_batch, patch_size,
                               grid_shape, mirror_axes, output="seg"):
    """Volume-BATCHED overlap-add: vmap the monolithic OA core over a stack
    of same-shape padded volumes [B, *vol, C] -> one XLA program per B.

    Round 1 measured a 6x REGRESSION vmapping the scatter core (batched
    dynamic_update_slice serializes); the OA core is scatter-free (dense
    reshape/pad/add), which vmaps cleanly — volume batching folds the
    B dimension into the TTA forward batch (B*nc*wb windows per conv) and
    amortizes per-program dispatch + host sync across the stream."""
    def one(d):
        return _sliding_window_oa_jit(params, d, w_inv, gaussian, apply_fn,
                                      num_classes, window_batch, patch_size,
                                      grid_shape, mirror_axes, output)
    return jax.vmap(one)(data_b)


@partial(jax.jit, static_argnames=("apply_fn", "num_classes", "window_batch",
                                   "patch_size", "slab_grid", "slab_axis",
                                   "mirror_axes", "buf_dtype"),
         donate_argnums=(0,))
def _oa_slab_step(acc, params, data, offset, gaussian, apply_fn, num_classes,
                  window_batch, patch_size, slab_grid, slab_axis, mirror_axes,
                  buf_dtype=jnp.float32):
    """One slab of the chunked overlap-add core: forward + scatter-free
    accumulate of a rectangular sub-grid of windows (full grid extent on
    every axis except ``slab_axis``, where it spans ``slab_grid[slab_axis]``
    consecutive grid rows starting at voxel ``offset``).

    ``offset`` is a traced scalar, so ONE compiled program serves every slab
    position of the same slab_grid shape; ``acc`` [K, *vol] is donated and
    stays in HBM across dispatches."""
    dim = len(patch_size)
    steps = tuple(p // 2 for p in patch_size)
    shift = jnp.zeros((dim,), jnp.int32).at[slab_axis].set(offset)
    probs = _grid_probs(params, data, slab_grid, shift, gaussian, apply_fn,
                        num_classes, window_batch, patch_size, mirror_axes,
                        buf_dtype)

    slab_vol = tuple(
        (slab_grid[a] - 1) * steps[a] + patch_size[a] if a == slab_axis
        else acc.shape[1 + a] for a in range(dim))
    slab_acc = _oa_accumulate(probs, patch_size, slab_vol)

    start = (0,) + tuple(offset if a == slab_axis else 0 for a in range(dim))
    cur = jax.lax.dynamic_slice(acc, start, (num_classes,) + slab_vol)
    return jax.lax.dynamic_update_slice(acc, cur + slab_acc, start)


@partial(jax.jit, static_argnames=("output",))
def _oa_finalize(acc, w_inv, output="probs"):
    if output == "seg":
        # weight normalization is positive and per-voxel -> argmax unaffected
        return jnp.argmax(acc, axis=0).astype(jnp.uint8)
    probs = jnp.moveaxis(acc, 0, -1) * w_inv[..., None]
    if output == "probs_bf16":
        return probs.astype(jnp.bfloat16)
    return probs


def _sliding_window_oa_slab(params, data, w_inv, gaussian, apply_fn,
                            num_classes, window_batch, patch_size, grid_shape,
                            mirror_axes, output="probs"):
    """Chunked overlap-add for regular grids too big for one OA program.

    The grid is sliced into slabs of consecutive rows along its largest axis;
    each slab runs as one bounded `_oa_slab_step` dispatch (forward + parity-
    group overlap-add, ZERO scatters) adding into a donated device-resident
    [K, *vol] accumulator.  Adjacent slabs overlap by half a patch on the
    slab axis; both contributions land in the shared accumulator, so the
    result is identical to the monolithic OA core.  Replaces the serialized
    per-window scatter at CT scale (the scatter was ~40% of a 384^3 volume's
    latency) while keeping per-program device time bounded (axon worker
    crashes on multi-minute programs)."""
    dim = len(patch_size)
    vol_shape = tuple(data.shape[:-1])
    steps = tuple(p // 2 for p in patch_size)
    n_combos = 2 ** len(mirror_axes)
    pvox = int(np.prod(patch_size))
    bpe = 2 if output == "seg" else 4  # window buffer is bf16 for seg
    s = int(np.argmax(grid_shape))
    per_row = int(np.prod(grid_shape)) // grid_shape[s]
    row_cost = per_row * pvox * n_combos
    k = max(1, min(int(_OA_SLAB_MAX_TTA_WINDOW_VOXELS // max(1, row_cost)),
                   grid_shape[s]))
    while k > 1 and (k * per_row * pvox * num_classes * bpe) > _OA_BUFFER_CAP_BYTES:
        k -= 1

    acc = jnp.zeros((num_classes,) + vol_shape, jnp.float32)
    gaussian = jnp.asarray(gaussian)
    for i0 in range(0, grid_shape[s], k):
        kk = min(k, grid_shape[s] - i0)
        slab_grid = tuple(kk if a == s else grid_shape[a] for a in range(dim))
        acc = _oa_slab_step(acc, params, data, jnp.int32(i0 * steps[s]),
                            gaussian, apply_fn, num_classes, window_batch,
                            patch_size, slab_grid, s, tuple(mirror_axes),
                            jnp.bfloat16 if output == "seg" else jnp.float32)
    return _oa_finalize(acc, w_inv, output)


# bound the device work of ONE dispatch: a single XLA program running for
# minutes crashes the axon TPU worker (measured at the full 512x512x288 CT
# grid, ~2.5 min/volume); chunking also keeps the host responsive. The cap
# is in window-voxels (windows x patch voxels) per dispatch.
_MAX_WINDOW_VOXELS_PER_DISPATCH = 32 * 128 ** 3

# per-slab-dispatch cap for the chunked OA core, in TTA-expanded window
# voxels.  384M ~= 15-30 s of device time at measured conv throughputs —
# safely under the axon worker's multi-minute crash threshold while letting
# a full 512x512 CT grid plane (21 windows x 128^3 x 8 TTA = 352M) run as
# one dispatch.
_OA_SLAB_MAX_TTA_WINDOW_VOXELS = 384_000_000


@partial(jax.jit, static_argnames=("apply_fn", "num_classes", "patch_size",
                                   "mirror_axes"),
         donate_argnums=(0, 1))
def _sw_scatter_step(prob_acc, w_acc, params, data, origins_b, valid_b,
                     gaussian, apply_fn, num_classes, patch_size,
                     mirror_axes):
    """One bounded chunk of the scatter core: forward + gaussian-weighted
    scatter-accumulate of ``origins_b`` [nb, wb, dim] into the device-resident
    accumulators (donated: updated in place across dispatches)."""
    dim = len(patch_size)

    def gather_window(origin):
        return jax.lax.dynamic_slice(
            data, tuple(origin[a] for a in range(dim)) + (0,),
            patch_size + (data.shape[-1],))

    def body(carry, ov):
        batch_origins, batch_valid = ov
        prob_acc, w_acc = carry
        windows = jax.vmap(gather_window)(batch_origins)
        probs = _tta_forward_cm(apply_fn, params, windows, mirror_axes)
        probs = jnp.swapaxes(probs * gaussian[None, None], 0, 1)  # [wb,K,*patch]

        def scatter_one(carry2, owv):
            pa, wa = carry2
            origin, p, v = owv
            idx = tuple(origin[a] for a in range(dim))
            cur = jax.lax.dynamic_slice(pa, (0,) + idx,
                                        (num_classes,) + patch_size)
            pa = jax.lax.dynamic_update_slice(pa, cur + p * v, (0,) + idx)
            curw = jax.lax.dynamic_slice(wa, idx, patch_size)
            wa = jax.lax.dynamic_update_slice(wa, curw + gaussian * v, idx)
            return (pa, wa), None

        (prob_acc, w_acc), _ = jax.lax.scan(scatter_one, (prob_acc, w_acc),
                                            (batch_origins, probs, batch_valid))
        return (prob_acc, w_acc), None

    (prob_acc, w_acc), _ = jax.lax.scan(body, (prob_acc, w_acc),
                                        (origins_b, valid_b))
    return prob_acc, w_acc


@partial(jax.jit, static_argnames=("output",))
def _sw_scatter_finalize(prob_acc, w_acc, output="probs"):
    if output == "seg":
        # weight normalization is positive and per-voxel -> argmax unaffected
        return jnp.argmax(prob_acc, axis=0).astype(jnp.uint8)
    probs = jnp.moveaxis(prob_acc, 0, -1) / w_acc[..., None]
    if output == "probs_bf16":
        return probs.astype(jnp.bfloat16)
    return probs


def _sliding_window_jit(params, data, origins, valid, gaussian, apply_fn,
                        num_classes, window_batch, patch_size, mirror_axes,
                        output="probs"):
    """Scatter core, used for irregular grids (odd patch dims or
    step_fraction != 0.5) and for regular grids too big for the overlap-add
    buffer.  data: [*vol, C]; origins: [Wpad, dim] int32, padded to a
    multiple of window_batch; valid: [Wpad] float {0,1} masking the padding
    repeats out of both accumulators.

    Accumulators are CLASS-MAJOR [K, *vol] (a channels-last accumulator pads
    K up to the 128-lane tile — measured 4x memory expansion at CT scale).
    The window stream is split across several bounded dispatches (see
    _MAX_WINDOW_VOXELS_PER_DISPATCH) with the accumulators donated between
    them; under an outer trace (shard_map serving) the chunk loop simply
    unrolls into one program, preserving semantics."""
    dim = len(patch_size)
    vol_shape = data.shape[:-1]
    n_batches = origins.shape[0] // window_batch
    origins_b = jnp.asarray(origins).reshape(n_batches, window_batch, dim)
    valid_b = jnp.asarray(valid).reshape(n_batches, window_batch)

    per = max(1, _MAX_WINDOW_VOXELS_PER_DISPATCH
              // (int(np.prod(patch_size)) * window_batch))
    prob_acc = jnp.zeros((num_classes,) + tuple(vol_shape), jnp.float32)
    w_acc = jnp.zeros(tuple(vol_shape), jnp.float32)
    for start in range(0, n_batches, per):
        chunk_o = origins_b[start:start + per]
        chunk_v = valid_b[start:start + per]
        if chunk_o.shape[0] < per and start > 0:
            # keep one compiled shape across the stream: pad the tail chunk
            # with masked repeats of its first batch
            padn = per - chunk_o.shape[0]
            chunk_o = jnp.concatenate(
                [chunk_o, jnp.repeat(chunk_o[:1], padn, axis=0)])
            chunk_v = jnp.concatenate(
                [chunk_v, jnp.zeros((padn,) + chunk_v.shape[1:],
                                    chunk_v.dtype)])
        prob_acc, w_acc = _sw_scatter_step(
            prob_acc, w_acc, params, data, chunk_o, chunk_v,
            jnp.asarray(gaussian), apply_fn, num_classes, patch_size,
            tuple(mirror_axes))
    return _sw_scatter_finalize(prob_acc, w_acc, output)


@lru_cache(maxsize=256)
def _prepare_meta(spatial_shape: tuple, patch_size: tuple, step_fraction: float,
                  window_batch: int, use_gaussian: bool):
    """Shape-only host prep (pure function of shapes, cached across the
    volume stream).  Combines the centered pad-to-patch with the high-side
    bucket pad into ONE pad config so callers can pad on device.  When the
    patch is even on every axis and step_fraction == 0.5, the bucket pad
    makes the window grid REGULAR (origins = i*patch/2) — enabling the
    scatter-free overlap-add cores AND collapsing compile-cache entries
    across the volume stream.  Returns
    (pads, undo, origins, wb, gaussian, grid_shape) with grid_shape=None
    when only the irregular-grid fallback applies."""
    regular = step_fraction == 0.5 and all(p % 2 == 0 for p in patch_size)
    pads, undo = _center_pads(spatial_shape, patch_size)
    padded_sp = tuple(s + lo + hi
                      for s, (lo, hi) in zip(spatial_shape, pads))
    grid_shape = None
    if regular:
        bshape = bucket_shape(padded_sp, patch_size, step_fraction)
        for a in range(len(pads)):
            pads[a][1] += bshape[a] - padded_sp[a]
        padded_sp = bshape
        grid_shape = tuple((b - p) // (p // 2) + 1
                           for b, p in zip(bshape, patch_size))
        origins, wb = None, max(1, min(window_batch, int(np.prod(grid_shape))))
    else:
        # origin-list padding to a multiple of wb repeats origin 0; the
        # `valid` mask zeroes the repeats out of BOTH accumulators (they do
        # NOT cancel in the normalization — see _cached_grid's docstring)
        origins, wb, valid = _cached_grid(padded_sp, patch_size,
                                          step_fraction, window_batch)
        origins = (origins, valid)
    gaussian = (gaussian_importance_map(patch_size) if use_gaussian
                else np.ones(patch_size, np.float32))
    pads = tuple((lo, hi) for lo, hi in pads) + ((0, 0),)
    return pads, tuple(undo), origins, wb, gaussian, grid_shape


@partial(jax.jit, static_argnames=("pads",))
def _pad_device(x, pads):
    """Zero-pad on device: the volume stream uploads RAW volumes (fewer
    bytes over the host link, no host-side np.pad on the 1-CPU host)."""
    return jnp.pad(x, pads)


# Device-side padding compiles one (trivial) XLA program PER RAW SHAPE —
# medical streams have near-unique per-case shapes, so small volumes host-pad
# (np.pad of a few MB is ~free and keeps the jit cache bounded) and only
# large volumes (np.pad of a CT-scale array costs ~0.3-0.5 s of the 1-CPU
# host's time per volume, every volume) pay the per-shape pad compile.
_HOST_PAD_MAX_BYTES = 64_000_000


def _to_device_padded(v: np.ndarray, pads, input_bf16: bool):
    """Upload one volume and apply its pad config (host- or device-side by
    size; see _HOST_PAD_MAX_BYTES)."""
    if not any(any(p) for p in pads):
        return jnp.asarray(v.astype(jnp.bfloat16 if input_bf16 else np.float32))
    if v.nbytes <= _HOST_PAD_MAX_BYTES:
        return jnp.asarray(np.pad(v, pads).astype(
            jnp.bfloat16 if input_bf16 else np.float32))
    raw = jnp.asarray(v.astype(jnp.bfloat16 if input_bf16 else np.float32))
    return _pad_device(raw, pads)


def _prepare(data, patch_size, step_fraction, window_batch, use_gaussian):
    """Host-padding variant of `_prepare_meta` for callers that need the
    padded array on host (e.g. stacking for sharded serving).  Returns
    (padded, undo, origins, wb, gaussian, grid_shape)."""
    data = np.asarray(data)
    patch_size = tuple(patch_size)
    pads, undo, origins, wb, gaussian, grid_shape = _prepare_meta(
        tuple(data.shape[:-1]), patch_size, step_fraction, window_batch,
        use_gaussian)
    padded = np.pad(data, pads) if any(any(p) for p in pads) else data
    return padded, undo, origins, wb, gaussian, grid_shape


# Above this, the overlap-add window buffer (plus its parity-group reshape
# temporaries, ~4x the buffer) would pressure HBM; at such scales each window
# forward costs hundreds of GFLOPs, so the scatter's serialization is
# negligible and the scatter core wins on memory (measured: CT 128^3 OA
# compile OOMs at 26 GB; scatter fits).
_OA_BUFFER_CAP_BYTES = 1_500_000_000

# The OA core runs the WHOLE volume (all windows x TTA variants) as one XLA
# program; a single program running minutes of device time crashes the axon
# TPU worker (same failure the scatter core's bounded dispatches avoid).
# Cap the per-program device work: volumes whose TTA-expanded window-voxel
# count exceeds this fall back to the chunked scatter core.  256M TTA-window-
# voxels ~= 10-20 s of device time at measured conv throughputs; hippocampus
# streams (5.7M) keep the faster OA path with a wide margin.
_OA_MAX_TTA_WINDOW_VOXELS = 256_000_000


def _run_core(apply_fn, params, dev, prep, patch_size, num_classes,
              mirror_axes, output, use_gaussian=True):
    """Dispatch one padded device volume to the overlap-add core (regular
    grid, small enough window buffer) or the scatter fallback."""
    _, _, origins, wb, gaussian, grid_shape = prep
    if grid_shape is not None:
        n_windows = int(np.prod(grid_shape))
        buf_bytes = (n_windows * int(np.prod(patch_size)) * num_classes
                     * (2 if output == "seg" else 4))
        n_combos = 2 ** len(mirror_axes)
        tta_window_voxels = n_windows * int(np.prod(patch_size)) * n_combos
        if (buf_bytes <= _OA_BUFFER_CAP_BYTES
                and tta_window_voxels <= _OA_MAX_TTA_WINDOW_VOXELS):
            w_inv = _w_inv_for(output, dev.shape[:-1], patch_size, grid_shape,
                               use_gaussian)
            return _sliding_window_oa_jit(params, dev, w_inv, jnp.asarray(gaussian),
                                          apply_fn, num_classes, wb, patch_size,
                                          grid_shape, tuple(mirror_axes), output)
        # regular grid too big for one OA program: chunked slab OA, as long
        # as a single grid row along the largest axis fits one dispatch
        s = int(np.argmax(grid_shape))
        per_row = n_windows // grid_shape[s]
        row_cost = per_row * int(np.prod(patch_size)) * n_combos
        row_buf = (per_row * int(np.prod(patch_size)) * num_classes
                   * (2 if output == "seg" else 4))
        if (row_cost <= _OA_SLAB_MAX_TTA_WINDOW_VOXELS
                and row_buf <= _OA_BUFFER_CAP_BYTES):
            w_inv = _w_inv_for(output, dev.shape[:-1], patch_size, grid_shape,
                               use_gaussian)
            return _sliding_window_oa_slab(params, dev, w_inv, gaussian,
                                           apply_fn, num_classes, wb,
                                           patch_size, grid_shape,
                                           tuple(mirror_axes), output)
        # degenerate: even one grid row exceeds a bounded dispatch — fall
        # back to the per-window scatter core with the regular origins
        origins, wb, valid = _cached_grid(tuple(dev.shape[:-1]), patch_size,
                                          0.5, wb)
    else:
        origins, valid = origins
    return _sliding_window_jit(params, dev, jnp.asarray(origins),
                               jnp.asarray(valid), jnp.asarray(gaussian),
                               apply_fn, num_classes, wb, patch_size,
                               tuple(mirror_axes), output)


def _predict_2d_over_3d(apply_fn, params, data: np.ndarray, patch_size,
                        num_classes, mirror_axes, step_fraction, window_batch,
                        use_gaussian, output, input_bf16):
    """2D network over a 3D volume: per-slice tiled 2D prediction, the
    counterpart of upstream nnU-Net's ``_internal_predict_3D_2Dconv_tiled``
    (invoked whenever the ``2d`` configuration predicts/validates a volume).

    TPU-native formulation: slices are INDEPENDENT, so they ride the vmapped
    overlap-add core as the volume batch — the slice dimension folds into
    the TTA forward's conv batch (a [D*wb*combos, ph, pw, C] conv instead of
    D sequential slice programs).  Slices are chunked under the vmap caps;
    chunks keep one compiled shape by padding with repeated slices."""
    mirror_axes = tuple(a for a in mirror_axes if a < len(patch_size))
    D = data.shape[0]
    prep = _prepare_meta(tuple(data.shape[1:-1]), patch_size, step_fraction,
                         window_batch, use_gaussian)
    pads, undo, _, wb, gaussian, grid_shape = prep
    dev_all = _to_device_padded(data, ((0, 0),) + pads, input_bf16)
    chunks = []
    k = _vmap_eligible_batch(prep, patch_size, num_classes, mirror_axes,
                             output, D)
    if k >= 1:  # regular grid, a slice chunk fits one vmapped OA program
        w_inv = _w_inv_for(output, dev_all.shape[1:-1], patch_size,
                           grid_shape, use_gaussian)
        g = jnp.asarray(gaussian)
        for s0 in range(0, D, k):
            chunk = dev_all[s0:s0 + k]
            n_valid = chunk.shape[0]
            if n_valid < k and s0 > 0:  # keep one compiled shape
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], k - n_valid, axis=0)])
            out = _sliding_window_oa_vmapped(
                params, chunk, w_inv, g, apply_fn, num_classes, wb,
                patch_size, grid_shape, mirror_axes, output)
            chunks.append(np.asarray(out[:n_valid]))
    else:
        # irregular 2D grid (odd patch dims) or a slice too big for one OA
        # program: slice-serial through _run_core's slab/scatter dispatch
        for d in range(D):
            out = _run_core(apply_fn, params, dev_all[d], prep, patch_size,
                            num_classes, mirror_axes, output, use_gaussian)
            chunks.append(np.asarray(out)[None])
    res = np.concatenate(chunks, axis=0)
    return res[(slice(None),) + undo]


def predict_sliding_window(apply_fn, params, data: np.ndarray, patch_size,
                           num_classes: int, mirror_axes=(0, 1, 2),
                           step_fraction: float = 0.5, window_batch: int = 4,
                           use_gaussian: bool = True, output: str = "probs",
                           input_bf16: bool = False):
    """data: [*spatial, C] (channels-last, preprocessed). Returns softmax
    probabilities [*spatial, num_classes] (numpy, original spatial dims), or
    the argmax segmentation [*spatial] uint8 with ``output='seg'`` (computed
    on device; shrinks the device->host transfer by num_classes*4x).
    ``output='probs_bf16'`` halves the transfer, cast back to f32 on host.
    ``input_bf16`` halves the host->device upload (preprocessed intensities
    tolerate bf16).

    apply_fn(params, x) must return the model's DS output list (highest
    resolution first) for x [B, *patch, C].  A 2D ``patch_size`` over a 3D
    volume routes to per-slice tiled prediction (``_predict_2d_over_3d``)."""
    patch_size = tuple(int(p) for p in patch_size)
    data = np.asarray(data)
    if data.ndim - 1 == len(patch_size) + 1:  # 2D net on a 3D volume
        out = _predict_2d_over_3d(apply_fn, params, data, patch_size,
                                  num_classes, mirror_axes, step_fraction,
                                  window_batch, use_gaussian, output,
                                  input_bf16)
        if output == "probs_bf16":
            out = out.astype(np.float32)
        return out
    prep = _prepare_meta(tuple(data.shape[:-1]), patch_size, step_fraction,
                         window_batch, use_gaussian)
    pads, undo = prep[0], prep[1]
    dev = _to_device_padded(data, pads, input_bf16)
    out = _run_core(apply_fn, params, dev, prep, patch_size, num_classes,
                    mirror_axes, output, use_gaussian)
    out = np.asarray(out)
    if output == "probs_bf16":
        out = out.astype(np.float32)
    return out[undo]


def _shard_pad(n_volumes: int, n_dev: int, g_size: int) -> int:
    """Number of duplicate volumes appended so the batch splits into EQUAL
    per-device shards of WHOLE volume groups: the minimal pad to a multiple
    of n_dev * max(1, g_size).  Equal shards ⇒ every device executes the
    same number of identical volume programs (work balance)."""
    unit = n_dev * max(1, g_size)
    return (-n_volumes) % unit


def predict_sliding_window_sharded(apply_fn, params, volumes: list, patch_size,
                                   num_classes: int, mesh=None,
                                   mirror_axes=(0, 1, 2),
                                   step_fraction: float = 0.5,
                                   window_batch: int = 8,
                                   output: str = "seg", input_bf16: bool = True,
                                   volume_batch: int = 1):
    """Multi-chip serving: volumes sharded one-per-device over the mesh's
    'data' axis; every device runs the full single-volume sliding-window core
    on its shard (shard_map), params replicated.  This scales volume
    throughput ~linearly with chips without the batched-scatter slowdown a
    vmapped core exhibits.  Volumes must share their padded shape."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import make_mesh
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    mesh = mesh or make_mesh(data_parallel=len(jax.devices()))
    n_dev = mesh.shape["data"]
    patch_size = tuple(int(p) for p in patch_size)
    prepped = [_prepare(v, patch_size, step_fraction, window_batch, True)
               for v in volumes]
    shapes = {p[0].shape for p in prepped}
    assert len(shapes) == 1, f"volumes must share padded shape, got {shapes}"
    # undo slicers are PER VOLUME: same padded shape does not imply same
    # original shape (small volumes pad up to the patch differently per axis)
    undos = [p[1] for p in prepped]
    prep0 = prepped[0]
    dtype = jnp.bfloat16 if input_bf16 else np.float32
    stack = np.stack([p[0] for p in prepped]).astype(dtype)
    # group size for the vmapped OA core: what the caller asked for, clamped
    # by the OA caps (0/1 -> per-volume lax.map)
    g_size = min(_vmap_eligible_batch(prep0, patch_size, num_classes,
                                      mirror_axes, output, volume_batch),
                 max(1, len(stack) // n_dev)) if volume_batch > 1 else 1
    # pad the volume batch so every device gets an equal shard that divides
    # into whole groups — per-device work is balanced by construction
    # (equal volume counts x identical per-volume programs), which is the
    # correctness-side basis for the linear-scaling model in RESULTS.md
    rem = _shard_pad(len(stack), n_dev, g_size)
    if rem:
        stack = np.concatenate([stack, np.repeat(stack[:1], rem, axis=0)])

    def per_device(vols_shard):  # [B/n_dev, *vol, C]
        if g_size > 1:
            # groups of g_size volumes per vmapped OA program (same win as
            # predict_sliding_window_multi's volume_batch)
            _, _, _, wb0, gaussian0, grid0 = prep0
            w_inv = _w_inv_for(output, vols_shard.shape[1:-1], patch_size,
                               grid0)
            gauss = jnp.asarray(gaussian0)

            def group(vols_g):
                return _sliding_window_oa_vmapped(
                    params, vols_g, w_inv, gauss, apply_fn, num_classes,
                    wb0, patch_size, grid0, tuple(mirror_axes), output)

            grouped = vols_shard.reshape((-1, g_size) + vols_shard.shape[1:])
            out = jax.lax.map(group, grouped)
            return out.reshape((-1,) + out.shape[2:])

        def one(v):
            return _run_core(apply_fn, params, v, prep0, patch_size,
                             num_classes, mirror_axes, output)
        return jax.lax.map(one, vols_shard)

    spec = P("data", *([None] * (stack.ndim - 1)))
    fn = shard_map(
        per_device, mesh=mesh, in_specs=spec,
        out_specs=P("data", *([None] * (stack.ndim - (1 if output == "seg" else 0) - 1))),
        check_vma=False)
    with mesh:
        dev_stack = jax.device_put(stack, NamedSharding(mesh, spec))
        out = np.asarray(jax.jit(fn)(dev_stack))
    if output == "probs_bf16":
        out = out.astype(np.float32)
    return [out[i][undos[i]] for i in range(len(volumes))]


# the vmapped stream multiplies the TTA forward's conv batch by the volume
# batch — a factor _tta_forward_cm's own per-volume _TTA_BATCH_MAX_ELEMS
# check cannot see.  Cap the COMBINED expanded batch (volumes x window_batch
# x mirror combos x patch voxels); 64M elems ~= 4 GB of bf16 stage-0
# activations at 32 channels, safely inside v5e HBM.
_VMAP_TTA_BATCH_MAX_ELEMS = 64_000_000


def _vmap_eligible_batch(prep, patch_size, num_classes, mirror_axes, output,
                         volume_batch):
    """How many volumes ONE vmapped OA program may take for this shape:
    min(volume_batch, cap quotients).  Returns 0 when even a single volume
    exceeds the OA buffer/program caps (callers must then fall back to
    _run_core, whose slab/scatter dispatch handles oversized grids);
    values <= 1 mean the vmapped core buys nothing for a multi-volume
    stream."""
    grid_shape = prep[5]
    if grid_shape is None:
        return 0
    n_windows = int(np.prod(grid_shape))
    pvox = int(np.prod(patch_size))
    wb = prep[3]
    per_buf = n_windows * pvox * num_classes * (2 if output == "seg" else 4)
    per_tta = n_windows * pvox * (2 ** len(mirror_axes))
    per_fwd = wb * (2 ** len(mirror_axes)) * pvox
    return int(min(volume_batch, _OA_BUFFER_CAP_BYTES // max(1, per_buf),
                   _OA_MAX_TTA_WINDOW_VOXELS // max(1, per_tta),
                   _VMAP_TTA_BATCH_MAX_ELEMS // max(1, per_fwd)))


def _w_inv_for(output, vol_shape, patch_size, grid_shape,
               use_gaussian: bool = True):
    """The OA cores' weight normalizer: unused by the seg path (argmax is
    invariant to the positive per-voxel normalization), the host-precomputed
    constant otherwise.  Single source for the 5 call sites."""
    if output == "seg":
        return jnp.float32(1.0)
    return jnp.asarray(_weight_inv(tuple(vol_shape), tuple(patch_size),
                                   tuple(grid_shape), use_gaussian))


def predict_sliding_window_multi(apply_fn, params, volumes: list, patch_size,
                                 num_classes: int, mirror_axes=(0, 1, 2),
                                 step_fraction: float = 0.5, window_batch: int = 4,
                                 output: str = "seg", input_bf16: bool = True,
                                 volume_batch: int = 1):
    """Inference over a stream of volumes sharing one compiled program.

    A device-queue pipeline (dispatch volume k+1 before fetching volume k's
    result) hides the host<->device latency.  ``volume_batch > 1``
    additionally groups consecutive SAME-SHAPE volumes into one vmapped
    overlap-add program (`_sliding_window_oa_vmapped`): the volume dimension
    folds into the TTA forward's conv batch and the per-program dispatch +
    sync amortizes across the group.  (Round 1 measured vmapping the SCATTER
    core 6x slower — batched dynamic_update_slice serializes; the vmapped
    path exists only for the scatter-free OA core and falls back to
    per-volume dispatch for irregular/oversized grids.)"""
    patch_size = tuple(int(p) for p in patch_size)
    pending = []  # (indices, device result, per-index undo slicers)
    results: list = [None] * len(volumes)

    def fetch(entry):
        idxs, out, undos = entry
        arr = np.asarray(out)
        for pos, (j, undo) in enumerate(zip(idxs, undos)):
            r = arr[pos][undo] if len(idxs) > 1 else arr[undo]
            results[j] = r.astype(np.float32) if output == "probs_bf16" else r

    def dispatch(entry):
        pending.append(entry)
        if len(pending) >= 2:  # fetch the oldest while the newest computes
            fetch(pending.pop(0))

    # volumes grouped by PADDED shape (different raw shapes bucket-pad to the
    # same grid — that is what makes batching engage on real case streams)
    group: list = []  # [(index, np volume, prep)]

    def flush_group():
        if not group:
            return
        idxs = [g[0] for g in group]
        arrs = [g[1] for g in group]
        preps = [g[2] for g in group]
        group.clear()
        if len(arrs) == 1:
            prep = preps[0]
            dev = _to_device_padded(arrs[0], prep[0], input_bf16)
            out = _run_core(apply_fn, params, dev, prep, patch_size,
                            num_classes, mirror_axes, output)
            dispatch(([idxs[0]], out, [prep[1]]))
            return
        # pad partial groups to the shape's full batch (repeat the last
        # volume — extras never appear in idxs, so fetch ignores them) so ONE
        # program per bucket shape serves every group length
        bmax = _vmap_eligible_batch(preps[0], patch_size, num_classes,
                                    mirror_axes, output, volume_batch)
        if (all(a.nbytes <= _HOST_PAD_MAX_BYTES for a in arrs)
                and os.environ.get("LNN_HOST_STACK", "1") != "0"):
            # ONE stacked upload for small volumes: per-volume device_puts
            # each pay the relay's per-RPC latency (the dominant residual in
            # the round-3 stream profile); these volumes host-pad anyway
            host = [np.pad(a, p[0]) for a, p in zip(arrs, preps)]
            host.extend(host[-1:] * (bmax - len(host)))
            stacked = jnp.asarray(np.stack(host).astype(
                jnp.bfloat16 if input_bf16 else np.float32))
        else:
            devs = [_to_device_padded(a, p[0], input_bf16)
                    for a, p in zip(arrs, preps)]
            devs.extend(devs[-1:] * (bmax - len(devs)))
            stacked = jnp.stack(devs)
        _, _, _, wb, gaussian, grid_shape = preps[0]
        w_inv = _w_inv_for(output, stacked.shape[1:-1], patch_size, grid_shape)
        out = _sliding_window_oa_vmapped(
            params, stacked, w_inv, jnp.asarray(gaussian),
            apply_fn, num_classes, wb, patch_size, grid_shape,
            tuple(mirror_axes), output)
        dispatch((idxs, out, [p[1] for p in preps]))

    def padded_shape(v, prep):
        return tuple(s + lo + hi
                     for s, (lo, hi) in zip(v.shape[:-1], prep[0]))

    for i, v in enumerate(volumes):
        v = np.asarray(v)
        if v.ndim - 1 == len(patch_size) + 1:  # 2D net on a 3D volume
            flush_group()
            results[i] = predict_sliding_window(
                apply_fn, params, v, patch_size, num_classes,
                mirror_axes=mirror_axes, step_fraction=step_fraction,
                window_batch=window_batch, output=output,
                input_bf16=input_bf16)
            continue
        prep = _prepare_meta(tuple(v.shape[:-1]), patch_size, step_fraction,
                             window_batch, True)
        bmax = _vmap_eligible_batch(prep, patch_size, num_classes,
                                    mirror_axes, output, volume_batch)
        if bmax <= 1:
            flush_group()
            group.append((i, v, prep))
            flush_group()
            continue
        if group and padded_shape(group[0][1], group[0][2]) != padded_shape(v, prep):
            flush_group()
        group.append((i, v, prep))
        if len(group) >= bmax:
            flush_group()
    flush_group()
    for entry in pending:
        fetch(entry)
    return results
