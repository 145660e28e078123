"""fastMRI-style U-Net in flax (NHWC, TPU layout).

Capability-parity with the reference U-Net (src/models/unet.py:17-188 and the
fastmri package model behind klD-Net, src/models/kld_net.py:4-12):

- ConvBlock: 2 x [3x3 conv (no bias) -> norm -> LeakyReLU(0.2) -> Dropout2d]
- avg-pool 2x2 downsampling, 2x2 stride-2 transpose-conv upsampling
- reflect pad on the right/bottom when skip shapes are odd
- final 1x1 conv head

Uses: klD-Net (in=2 Re/Im k-space, out=1 logit mask, chans=32, 4 pools,
train_kld_net.py:20) and the image-space denoiser (in=out=1, chans=32,
6 pools, InstanceNorm, train_unet_denoiser.py:35-42).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import UnetConfig


def _norm(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """InstanceNorm2d (no affine, eps 1e-5, torch default) on NHWC, or
    batch-statistics norm, or identity."""
    if kind == "none":
        return x
    if kind == "instance":
        axes = (1, 2)
    elif kind == "batch":
        axes = (0, 1, 2)
    else:
        raise ValueError(f"unknown norm: {kind}")
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class ConvBlock(nn.Module):
    out_chans: int
    drop_prob: float = 0.0
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.out_chans, (3, 3), use_bias=False)(x)
            x = _norm(x, self.norm)
            x = nn.leaky_relu(x, 0.2)
            if self.drop_prob > 0.0:
                # Dropout2d: drop whole feature maps (broadcast over H, W).
                x = nn.Dropout(
                    self.drop_prob,
                    broadcast_dims=(1, 2),
                    deterministic=not train,
                )(x)
        return x


class TransposeConvBlock(nn.Module):
    out_chans: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.out_chans, (2, 2), strides=(2, 2), use_bias=False
        )(x)
        x = _norm(x, self.norm)
        return nn.leaky_relu(x, 0.2)


class Unet(nn.Module):
    """U-Net over NHWC tensors; __call__(x, train=False) -> NHWC output."""

    in_chans: int = 2
    out_chans: int = 1
    chans: int = 32
    num_pool_layers: int = 4
    drop_prob: float = 0.0
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        stack = []
        ch = self.chans
        x = ConvBlock(ch, self.drop_prob, self.norm)(x, train=train)
        stack.append(x)
        for _ in range(self.num_pool_layers - 1):
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            ch *= 2
            x = ConvBlock(ch, self.drop_prob, self.norm)(x, train=train)
            stack.append(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(ch * 2, self.drop_prob, self.norm)(x, train=train)

        for _ in range(self.num_pool_layers):
            skip = stack.pop()
            x = TransposeConvBlock(ch, self.norm)(x)
            # Reflect-pad right/bottom when the skip had odd extent.
            pad_h = skip.shape[1] - x.shape[1]
            pad_w = skip.shape[2] - x.shape[2]
            if pad_h or pad_w:
                x = jnp.pad(
                    x,
                    ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    mode="reflect",
                )
            x = jnp.concatenate([x, skip], axis=-1)
            if ch == self.chans:  # final stage: block + 1x1 head
                x = ConvBlock(ch, self.drop_prob, self.norm)(x, train=train)
                x = nn.Conv(self.out_chans, (1, 1))(x)
            else:
                x = ConvBlock(ch, self.drop_prob, self.norm)(x, train=train)
                ch //= 2
        return x


def build_unet(cfg: UnetConfig) -> Unet:
    return Unet(
        in_chans=cfg.in_chans,
        out_chans=cfg.out_chans,
        chans=cfg.chans,
        num_pool_layers=cfg.num_pool_layers,
        drop_prob=cfg.drop_prob,
        norm=cfg.norm,
    )


def build_kld_net() -> Unet:
    """k-space line detector: 2-ch (Re, Im) -> 1-ch logit mask
    (reference kld_net.py:4-12, train_kld_net.py:20)."""
    return Unet(in_chans=2, out_chans=1, chans=32, num_pool_layers=4)


def build_denoiser() -> Unet:
    """Image-space motion-artifact denoiser (train_unet_denoiser.py:35-42)."""
    return Unet(in_chans=1, out_chans=1, chans=32, num_pool_layers=6)
