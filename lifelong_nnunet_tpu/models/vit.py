"""Vision Transformer (2D/3D) with SPT, LSA, and task-specific LayerNorms.

Capability counterpart of the reference's
``nnunet_ext/network_architecture/vision_transformer.py`` (a timm fork):
  * 2D/3D ``PatchEmbed`` via strided conv (reference ``:16-79``, Conv3d ``:50``)
  * ``Attention`` with optional **LSA** — learnable per-head temperature and
    diagonal (self-token) masking (reference ``:81-151``)
  * Blocks with optional **task-specific LayerNorms** held per task
    (reference ModuleDicts ``:153-198``; here: one LN parameter set per name
    in the static ``ln_tasks`` tuple, selected by the ``task`` call argument)
  * attention weights returned per layer (reference Encoder ``:200-216``)
  * **SPT** ShiftedPatchTokenization — concat of 4 diagonally shifted copies
    before patch embedding (reference ``:461-551``)
  * size presets base/large/huge = embed 768/1024/1280, heads 12/16/16,
    depth 12/24/32 (reference generic_ViT_UNet.py:68-70)

TPU-first deviation (deliberate, documented): the reference ViT emits its
output through a single cls-token -> Linear(prod(target_shape)) head
(vision_transformer.py:438,457) — a ~40M-param dense layer that funnels the
whole feature map through one token.  Here the output is **per-token**: each
token is projected to ``out_features`` channels and reshaped to the patch
grid, preserving spatial structure and keeping the matmuls MXU-shaped.
"""

from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

VIT_SIZES = {
    "base": {"embed_dim": 768, "depth": 12, "num_heads": 12},
    "large": {"embed_dim": 1024, "depth": 24, "num_heads": 16},
    "huge": {"embed_dim": 1280, "depth": 32, "num_heads": 16},
}


def patch_dim_for(img_size: Sequence[int], max_patch: int = 16) -> tuple:
    """Per-axis patch size: the largest common divisor of all spatial dims
    that is <= max_patch (reference rule via ``commDiv``,
    generic_ViT_UNet.py:148), computed per axis against the axis size."""
    def divisors(n):
        return {d for d in range(1, n + 1) if n % d == 0}
    common = None
    for s in img_size:
        ds = divisors(int(s))
        common = ds if common is None else (common & ds)
    valid = [d for d in sorted(common) if d <= max_patch]
    p = valid[-1] if valid else 1
    return tuple(p for _ in img_size)


class PatchEmbed(nn.Module):
    """Patch embedding for any spatial rank.

    Mathematically a stride=kernel conv, but implemented as
    reshape→transpose→einsum: on the v5e the conv's input-gradient lowering
    costs 230 ms at ViT-base/hippocampus size vs 27 ms for the identical
    einsum (measured; this single op was 60% of the ViT train step).
    Parameters keep nn.Conv's exact tree structure — nested scope ``proj``
    with ``kernel`` [*patch, C, E] and ``bias`` [E] — so checkpoints from the
    earlier nn.Conv formulation restore unchanged."""
    patch_size: tuple
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = tuple(self.patch_size)
        dim = len(p)
        C = x.shape[-1]
        proj = self._proj_params(p, C)
        B = x.shape[0]
        grid = tuple(x.shape[1 + a] // p[a] for a in range(dim))
        # [B, g0, p0, g1, p1, ..., C] -> [B, g0, g1, ..., p0, p1, ..., C]
        shape = (B,) + tuple(v for a in range(dim) for v in (grid[a], p[a])) + (C,)
        xr = x.reshape(shape)
        perm = ((0,) + tuple(1 + 2 * a for a in range(dim))
                + tuple(2 + 2 * a for a in range(dim)) + (1 + 2 * dim,))
        xt = xr.transpose(perm).reshape(B, int(np.prod(grid)), -1)
        kmat = proj["kernel"].reshape(-1, self.embed_dim).astype(self.dtype)
        tokens = jnp.einsum("bnk,ke->bne", xt.astype(self.dtype), kmat,
                            preferred_element_type=jnp.float32).astype(self.dtype)
        tokens = tokens + proj["bias"].astype(self.dtype)
        return tokens, grid

    def _proj_params(self, p, C):
        # identical param tree to the previous nn.Conv(name='proj'):
        # {'proj': {'kernel': [*patch, C, E], 'bias': [E]}}
        proj = _ProjParams(kernel_shape=p + (C, self.embed_dim),
                           embed_dim=self.embed_dim, name="proj")
        return proj()


class _ProjParams(nn.Module):
    """Parameter holder matching nn.Conv's scope layout (see PatchEmbed)."""
    kernel_shape: tuple
    embed_dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            self.kernel_shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.embed_dim,), jnp.float32)
        return {"kernel": kernel, "bias": bias}


class ShiftedPatchTokenization(nn.Module):
    """SPT (reference ``:461-551``): concatenate the input with 4 diagonally
    shifted copies (by half a patch) along channels, LayerNorm, then patch-
    embed.  Shifts use the two trailing spatial axes (in-plane), matching the
    reference's 2D PatchShifting applied slice-wise for 3D."""
    patch_size: tuple
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shift_h = max(1, self.patch_size[-2] // 2)
        shift_w = max(1, self.patch_size[-1] // 2)
        ah, aw = x.ndim - 3, x.ndim - 2  # the two trailing spatial axes
        shifted = [x]
        for dh, dw in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
            s = jnp.roll(x, (dh * shift_h, dw * shift_w), axis=(ah, aw))
            shifted.append(s)
        x = jnp.concatenate(shifted, axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        return PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                          name="embed")(x)


class TaskLayerNorm(nn.Module):
    """LayerNorm with per-task parameters (task-specific LNs, reference
    ``:153-198,380-416``).  ``ln_tasks`` is static; ``task_idx`` selects."""
    ln_tasks: tuple = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, task_idx: int = 0):
        if not self.ln_tasks:
            return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        lns = [nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"ln_{t}") for t in self.ln_tasks]
        out = lns[task_idx](x)
        if self.is_initializing():
            # touch every task's LN so its params exist (flax creates params
            # lazily on call; un-called task LNs would otherwise be missing)
            for i, ln in enumerate(lns):
                if i != task_idx:
                    ln(x)
        return out


def _flash_eligible(n_tokens: int, dtype) -> bool:
    """Route to the Pallas flash-attention kernel only where the on-chip A/B
    (tools/ab_vit_attention.py, RESULTS.md round 3) showed a win: TPU, bf16,
    >=512 tokens (CT-scale ViT; 1.12-1.25x there, 0.88x at the hippocampus'
    256 padded tokens, so short sequences stay on XLA), block-divisible
    sequence. ``LNN_FLASH_ATTN=0`` opts out."""
    if os.environ.get("LNN_FLASH_ATTN", "1") == "0":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return dtype == jnp.bfloat16 and n_tokens >= 512 and n_tokens % 256 == 0


def _flash_attention(q, k, v, sm_scale: float):
    """jax's bundled Pallas TPU flash-attention (forward + custom VJP)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    n = q.shape[2]
    block = 512 if n % 512 == 0 else 256
    bs = BlockSizes(block_q=block, block_k_major=block, block_k=block,
                    block_b=1, block_q_major_dkv=block,
                    block_k_major_dkv=block, block_k_dkv=block,
                    block_q_dkv=block, block_k_major_dq=block,
                    block_k_dq=block, block_q_dq=block)
    return flash_attention(q, k, v, causal=False, sm_scale=sm_scale,
                           block_sizes=bs)


class Attention(nn.Module):
    num_heads: int
    lsa: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, need_weights: bool = True):
        B, N, D = x.shape
        head_dim = D // self.num_heads
        qkv = nn.Dense(3 * D, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(0, 2, 1, 3)  # [B, H, N, hd]
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if (not self.lsa and not need_weights
                and _flash_eligible(N, self.dtype)):
            # flash never materializes the [B,H,N,N] weights — usable only
            # when the caller doesn't ask for them (return_attn=False)
            out = _flash_attention(q, k, v, head_dim ** -0.5)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
            out = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                           name="proj")(out)
            return out, None
        if self.lsa:
            # learnable per-head temperature, init 1/sqrt(hd) (reference :96-118)
            temp = self.param("temperature",
                              lambda k_, s: jnp.full(s, head_dim ** -0.5),
                              (self.num_heads, 1, 1))
            logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                                preferred_element_type=jnp.float32) * temp
            # diagonal masking: a token never attends to itself (reference :123-134)
            eye = jnp.eye(N, dtype=bool)
            logits = jnp.where(eye[None, None], -1e9, logits)
        else:
            logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                                preferred_element_type=jnp.float32) * (head_dim ** -0.5)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", weights.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        out = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
        return out, weights


class Block(nn.Module):
    num_heads: int
    mlp_ratio: int = 4
    lsa: bool = False
    ln_tasks: tuple = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, task_idx: int = 0, need_weights: bool = True):
        h = TaskLayerNorm(self.ln_tasks, self.dtype, name="norm1")(x, task_idx)
        attn_out, weights = Attention(self.num_heads, self.lsa, self.dtype,
                                      name="attn")(h, need_weights)
        x = x + attn_out
        h = TaskLayerNorm(self.ln_tasks, self.dtype, name="norm2")(x, task_idx)
        D = x.shape[-1]
        h = nn.Dense(self.mlp_ratio * D, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)
        return x + h, weights


class VisionTransformer(nn.Module):
    """Dense (per-token) ViT over one or more input stages.

    ``out_features``: output channels per token — an int (single stage,
    V1-V3) or a tuple (V4: one entry per decoder stage; per-stage patch
    embeds + output projections share the transformer blocks, reference
    ``:326-378``).  Call with ``idx`` selecting the stage.  The per-axis
    patch size is derived from the input's (static-under-trace) spatial
    shape via the reference's largest-common-divisor-<=16 rule.  Returns a
    [B, *grid, out_features] feature map (+ per-layer attention weights
    with ``return_attn``)."""
    out_features: tuple                 # (C,) or (C_stage0, C_stage1, ...)
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    lsa: bool = False
    spt: bool = False
    ln_tasks: tuple = ()
    max_patch: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx: int = 0, task_idx: int = 0,
                 return_attn: bool = False):
        out_features = self.out_features[idx]
        patch = patch_dim_for(x.shape[1:-1], self.max_patch)
        if self.spt:
            tokens, grid = ShiftedPatchTokenization(
                patch, self.embed_dim, self.dtype, name=f"patch_embed_{idx}")(x)
        else:
            tokens, grid = PatchEmbed(patch, self.embed_dim, self.dtype,
                                      name=f"patch_embed_{idx}")(x)
        n_tokens = tokens.shape[1]
        pos = self.param(f"pos_embed_{idx}", nn.initializers.normal(0.02),
                         (1, n_tokens, self.embed_dim))
        h = tokens + pos
        attns = []
        for d in range(self.depth):
            h, w = Block(self.num_heads, self.mlp_ratio, self.lsa,
                         self.ln_tasks, self.dtype,
                         name=f"block{d}")(h, task_idx,
                                           need_weights=return_attn)
            attns.append(w)
        h = TaskLayerNorm(self.ln_tasks, self.dtype, name="norm")(h, task_idx)
        out = nn.Dense(out_features, dtype=self.dtype, param_dtype=jnp.float32,
                       name=f"head_{idx}")(h)
        out = out.reshape((x.shape[0],) + grid + (out_features,)).astype(jnp.float32)
        if return_attn:
            return out, attns
        return out


def vit_kwargs_for_type(vit_type: str) -> dict:
    if vit_type not in VIT_SIZES:
        raise KeyError(f"unknown ViT type {vit_type!r}; options {sorted(VIT_SIZES)}")
    return dict(VIT_SIZES[vit_type])
