"""Image-in → segmentation-out prediction pipeline.

Counterpart of the reference's ``nnunet_ext/inference/predict.py:117-401``
(which forks upstream predict): per case — preprocess (crop/resample/
normalize), Gaussian sliding-window softmax with TTA, undo resampling, undo
crop, argmax, NIfTI export; optional multi-fold softmax ensembling and
connected-component postprocessing.

Host-side stages (preprocess / resample-back / export) run in a thread pool
overlapping with device inference (the reference uses multiprocessing queues
+ an export pool; one process with threads is enough here since the heavy
work is numpy/scipy which releases the GIL).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from scipy import ndimage

from ..planning.fingerprint import crop_to_nonzero
from ..planning.preprocess import normalize, resample_image
from ..utilities.imageio import image_suffix, read_image, write_image
from ..utilities.nifti import NiftiImage
from .sliding_window import predict_sliding_window


def preprocess_for_inference(image_files: list, plans, config_name: str):
    """Load + crop + resample + normalize one case. Returns (data [*sp, C]
    channels-last float32, props dict needed to undo)."""
    imgs = [read_image(f) for f in image_files]
    vols = []
    for img in imgs:
        d = np.asarray(img.data)
        if d.ndim == 4:
            vols.extend(d[..., c].astype(np.float32) for c in range(d.shape[3]))
        else:
            vols.append(d.astype(np.float32))
    data = np.stack(vols, axis=0)
    spacing = imgs[0].spacing
    orig_shape = data.shape[1:]
    # to plans space (coarsest axis first) — undone by restore_softmax
    tf = list(getattr(plans, "transpose_forward", [0, 1, 2]))
    sp_t = [spacing[a] for a in tf]
    if tf != [0, 1, 2]:
        data = np.ascontiguousarray(data.transpose([0] + [a + 1 for a in tf]))
    data, _, bbox, mask = crop_to_nonzero(data, None)
    cfg = plans.config(config_name)
    target_spacing = np.array(cfg.spacing[-3:], dtype=np.float64)
    data_r = resample_image(data, sp_t, target_spacing, is_seg=False)
    mask_r = resample_image(mask[None].astype(np.float32), sp_t, target_spacing,
                            is_seg=True)[0] > 0.5
    data_n = normalize(data_r, plans, mask_r)
    props = {
        "original_shape": list(orig_shape),   # untransposed
        "original_spacing": list(spacing),    # untransposed
        "transpose_forward": tf,              # bbox/shapes below are in tf space
        "crop_bbox": [[b[0], b[1]] for b in bbox],
        "cropped_shape": list(data.shape[1:]),
        "resampled_shape": list(data_r.shape[1:]),
        "affine": np.asarray(imgs[0].affine),
    }
    return np.moveaxis(data_n, 0, -1), props


def restore_softmax(probs: np.ndarray, props: dict) -> np.ndarray:
    """Resample class probabilities [*sp, K] back to the original cropped
    shape, re-embed into the original volume (undo crop), and un-transpose
    back to the original axis order (undo ``transpose_forward``, reference
    ``inference/predict.py:224-226``).  Returns [*orig_shape, K]."""
    cropped = tuple(props["cropped_shape"])
    if probs.shape[:-1] != cropped:
        zoom = np.array(cropped) / np.array(probs.shape[:-1])
        chans = [ndimage.zoom(probs[..., k], zoom, order=1, mode="nearest")
                 for k in range(probs.shape[-1])]
        chans = [c[tuple(slice(0, s) for s in cropped)] for c in chans]
        probs = np.stack(chans, axis=-1)
    tf = list(props.get("transpose_forward", [0, 1, 2]))
    orig_t = [props["original_shape"][a] for a in tf]  # original shape in tf space
    full = np.zeros(tuple(orig_t) + (probs.shape[-1],), np.float32)
    full[..., 0] = 1.0  # outside crop = background
    sl = tuple(slice(b[0], b[1]) for b in props["crop_bbox"])
    full[sl] = probs
    if tf != [0, 1, 2]:
        tb = list(np.argsort(tf))
        full = np.ascontiguousarray(full.transpose(tb + [full.ndim - 1]))
    return full


def remove_all_but_largest_component(seg: np.ndarray, labels=None) -> np.ndarray:
    """Connected-component postprocessing (upstream ``load_remove_save``
    equivalent): keep only the largest 3D component per given label."""
    out = seg.copy()
    labels = labels if labels is not None else [c for c in np.unique(seg) if c > 0]
    for c in labels:
        mask = seg == c
        comp, n = ndimage.label(mask)
        if n <= 1:
            continue
        sizes = ndimage.sum(mask, comp, range(1, n + 1))
        keep = int(np.argmax(sizes)) + 1
        out[mask & (comp != keep)] = 0
    return out


def predict_case(apply_fn, params_per_fold: list, image_files: list, plans,
                 config_name: str, mirror_axes=(0, 1, 2), step_fraction=0.5,
                 window_batch: int = 4, do_tta: bool = True,
                 postprocess_labels=None, preprocessed=None):
    """Predict one case, ensembling softmax over folds. Returns (seg uint8
    [*orig_shape], softmax [*orig, K], props).  ``preprocessed`` optionally
    supplies an already-preprocessed ``(data, props)`` pair (the look-ahead
    pipeline in ``predict_from_folder``)."""
    data, props = preprocessed or preprocess_for_inference(
        image_files, plans, config_name)
    cfg = plans.config(config_name)
    num_classes = plans.num_classes + 1
    probs = None
    for params in params_per_fold:
        # bf16 device->host transfer halves per-case latency; ensembling,
        # resampling and argmax happen in f32 on host
        p = predict_sliding_window(
            apply_fn, params, data, cfg.patch_size, num_classes,
            mirror_axes=mirror_axes if do_tta else (),
            step_fraction=step_fraction, window_batch=window_batch,
            output="probs_bf16")
        probs = p if probs is None else probs + p
    probs = probs / len(params_per_fold)
    return finalize_case(probs, props, postprocess_labels)


def finalize_case(probs: np.ndarray, props: dict, postprocess_labels=None):
    """Fold-ensembled softmax [*resampled, K] -> (seg, full softmax, props):
    undo resampling/crop/transpose, argmax, optional CC postprocessing.
    Shared tail of the per-case and volume-batched drivers."""
    full = restore_softmax(probs, props)
    seg = np.argmax(full, axis=-1).astype(np.uint8)
    if postprocess_labels is not None:
        seg = remove_all_but_largest_component(seg, postprocess_labels)
    return seg, full, props


def export_segmentation(seg: np.ndarray, props: dict, out_file: str):
    write_image(out_file, NiftiImage(seg.astype(np.uint8),
                                     spacing=tuple(props["original_spacing"]),
                                     affine=np.asarray(props["affine"])))


def predict_from_folder(apply_fn, params_per_fold: list, plans, config_name: str,
                        input_folder: str, output_folder: str,
                        num_modalities: int | None = None, do_tta: bool = True,
                        window_batch: int = 4, postprocess_labels=None,
                        io_workers: int = 2, lookahead: int = 2,
                        volume_batch: int = 8) -> list:
    """Predict every case in a folder of ``<case>_0000.nii.gz``-style images
    (reference ``predict_from_folder``, ``inference/predict.py:324-401``).

    Host preprocessing runs ``lookahead`` cases AHEAD of device inference on
    worker threads, and NIfTI export trails behind asynchronously — per-case
    latency approaches max(preprocess, device, export) instead of their sum
    (the reference's multiprocess preprocessing queue + export pool,
    ``inference/predict.py:23-114,255-259``; threads suffice here because the
    heavy host work is numpy/scipy which releases the GIL).

    ``volume_batch > 1`` routes device inference through the volume-batched
    sliding-window stream: same-bucket-shape cases share one vmapped
    overlap-add program, amortizing the per-dispatch host relay cost
    (measured 14-16 vol/s vs 10 at vb=1 on hippocampus-scale volumes —
    RESULTS.md round-3 stream A/B).  Oversized grids (CT-scale) fall back to
    per-volume dispatch inside the stream, so memory stays bounded."""
    os.makedirs(output_folder, exist_ok=True)
    num_modalities = num_modalities or plans.num_modalities
    files = sorted(f for f in os.listdir(input_folder) if image_suffix(f))
    cases: dict = {}
    for f in files:
        base = f[: -len(image_suffix(f))]
        case = base[:-5] if len(base) > 5 and base[-5] == "_" and base[-4:].isdigit() else base
        cases.setdefault(case, []).append(os.path.join(input_folder, f))
    ordered = sorted(cases.items())
    written = []
    with ThreadPoolExecutor(max_workers=io_workers) as pool:
        prep = {}   # case index -> future of (data, props)
        def submit_prep(idx):
            if 0 <= idx < len(ordered) and idx not in prep:
                prep[idx] = pool.submit(preprocess_for_inference,
                                        sorted(ordered[idx][1]), plans, config_name)
        for i in range(lookahead + 1):
            submit_prep(i)
        exports = []

        def case_out(case):
            out_file = os.path.join(output_folder, f"{case}.nii.gz")
            written.append(out_file)
            return out_file

        if volume_batch > 1:
            # chunked volume-batched driver: the chunk bounds host memory
            # (chunk preprocessed volumes + their softmax resident at once)
            from .sliding_window import predict_sliding_window_multi
            cfg = plans.config(config_name)
            num_classes = plans.num_classes + 1
            chunk_n = max(2 * volume_batch, 2)
            i = 0
            while i < len(ordered):
                chunk = ordered[i:i + chunk_n]
                pres = []
                for j in range(len(chunk)):
                    pres.append(prep.pop(i + j).result())
                    submit_prep(i + j + lookahead + 1)
                datas = [p[0] for p in pres]
                probs = None
                for params in params_per_fold:
                    ps = predict_sliding_window_multi(
                        apply_fn, params, datas, cfg.patch_size, num_classes,
                        mirror_axes=(0, 1, 2) if do_tta else (),
                        window_batch=window_batch, output="probs_bf16",
                        volume_batch=volume_batch)
                    probs = ps if probs is None else [a + b for a, b in zip(probs, ps)]
                for (case, _), p, (_, props) in zip(chunk, probs, pres):
                    seg, _, props = finalize_case(
                        p / len(params_per_fold), props, postprocess_labels)
                    exports.append(pool.submit(export_segmentation, seg, props,
                                               case_out(case)))
                i += len(chunk)
        else:
            for i, (case, imgs) in enumerate(ordered):
                pre = prep.pop(i).result()
                submit_prep(i + lookahead + 1)
                seg, _, props = predict_case(
                    apply_fn, params_per_fold, sorted(imgs), plans, config_name,
                    do_tta=do_tta, window_batch=window_batch,
                    postprocess_labels=postprocess_labels, preprocessed=pre)
                exports.append(pool.submit(export_segmentation, seg, props,
                                           case_out(case)))
        for f in exports:
            f.result()
    return written
