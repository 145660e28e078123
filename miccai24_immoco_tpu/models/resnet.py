"""ResNet-18 classifier (flax, NHWC) for the downstream lesion-patch task.

Capability parity with reference src/models/classification.py:5-15: a
ResNet-18 backbone with a fresh 2-class FC head, backbone frozen and only
the head trained (train_classification.py:29-158).  The reference pulls
ImageNet weights from torch.hub; this environment has no network and no
torchvision, so the backbone initializes randomly by default and
``load_torch_state_dict`` can ingest a converted torch checkpoint when one
is provided (key mapping documented there).

Input convention matches the reference pipeline: 124x124 grayscale patches
min-max normalized, replicated to 3 channels, ImageNet-normalized
(test_classification.py:24-49).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class BasicBlock(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), self.strides, padding=1,
                    use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), self.strides,
                               use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for filters, strides in (
            (64, 1), (64, 1), (128, 2), (128, 1),
            (256, 2), (256, 1), (512, 2), (512, 1),
        ):
            x = BasicBlock(filters, (strides, strides))(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if return_features:
            return x
        return nn.Dense(self.num_classes)(x)


def init_resnet18(key, num_classes: int = 2, input_hw: int = 124):
    net = ResNet18(num_classes=num_classes)
    variables = net.init(
        {"params": key}, jnp.zeros((1, input_hw, input_hw, 3)), train=False
    )
    return net, variables


def preprocess_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) grayscale -> (B, H, W, 3) ImageNet-normalized, replicating
    the reference's per-image min-max + 3-channel + normalize pipeline
    (test_classification.py:24-49)."""
    b = patches.shape[0]
    flat = patches.reshape(b, -1)
    lo = flat.min(axis=1).reshape(b, 1, 1)
    hi = flat.max(axis=1).reshape(b, 1, 1)
    x = (patches - lo) / (hi - lo + 1e-12)
    x = jnp.repeat(x[..., None], 3, axis=-1)
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def load_torch_state_dict(variables: Dict, state: Dict[str, np.ndarray]):
    """Map a torchvision resnet18 state_dict onto this module's params.

    torch OIHW conv kernels transpose to HWIO; BatchNorm running stats map
    into batch_stats.  Unmatched head weights stay as initialized.
    """
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])

    # Ordered lists of (torch prefix, flax path) pairs.
    mapping = [("conv1", ("Conv_0",)), ("bn1", ("BatchNorm_0",))]
    idx = 0
    for layer in range(1, 5):
        for block in range(2):
            t = f"layer{layer}.{block}"
            fb = f"BasicBlock_{idx}"
            mapping += [
                (f"{t}.conv1", (fb, "Conv_0")),
                (f"{t}.bn1", (fb, "BatchNorm_0")),
                (f"{t}.conv2", (fb, "Conv_1")),
                (f"{t}.bn2", (fb, "BatchNorm_1")),
            ]
            if f"{t}.downsample.0.weight" in state:
                mapping += [
                    (f"{t}.downsample.0", (fb, "Conv_2")),
                    (f"{t}.downsample.1", (fb, "BatchNorm_2")),
                ]
            idx += 1

    def set_in(tree, path, key, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]][key] = jnp.asarray(value)

    for tprefix, fpath in mapping:
        if f"{tprefix}.weight" not in state:
            continue
        w = state[f"{tprefix}.weight"]
        if w.ndim == 4:  # conv OIHW -> HWIO
            set_in(params, fpath, "kernel", np.transpose(w, (2, 3, 1, 0)))
        else:  # batchnorm scale
            set_in(params, fpath, "scale", w)
            set_in(params, fpath, "bias", state[f"{tprefix}.bias"])
            set_in(stats, fpath, "mean", state[f"{tprefix}.running_mean"])
            set_in(stats, fpath, "var", state[f"{tprefix}.running_var"])

    return {"params": flax.core.freeze(params),
            "batch_stats": flax.core.freeze(stats)}
