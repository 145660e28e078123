"""ResNet-18 lesion-patch classifier training (head-only fine-tune).

Recipe parity with reference src/train/train_classification.py:29-158:

- ResNet-18 backbone frozen; only the 2-class FC head trains
- class-weighted cross-entropy (label weights from the dataset)
- Adam on the head, batched patch pipeline with ImageNet normalization
- accuracy metric = softmax-argmax vs one-hot argmax
  (classification_utils.py:307-316)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from miccai24_immoco_tpu.models.resnet import (
    ResNet18,
    init_resnet18,
    preprocess_patches,
)


@dataclasses.dataclass(frozen=True)
class ClassifierTrainConfig:
    steps: int = 300
    batch_size: int = 32
    learning_rate: float = 1e-3
    seed: int = 0
    num_classes: int = 2
    # The reference freezes an ImageNet-pretrained backbone and trains only
    # the FC head (train_classification.py:29-158). This environment has no
    # ImageNet weights (no torchvision, no network), so head-only training
    # sits on random features; train_backbone=True trains the whole network
    # from scratch instead — a documented divergence that exists purely
    # because the pretrained initializer is unavailable here.
    train_backbone: bool = False


def multi_acc(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Reference multi_acc (classification_utils.py:307-316)."""
    pred = jnp.argmax(jax.nn.softmax(logits, axis=-1), axis=-1)
    return jnp.mean((pred == labels).astype(jnp.float32))


def make_classifier_trainer(
    cfg: ClassifierTrainConfig,
    input_hw: int = 124,
    class_weights: Optional[np.ndarray] = None,
    backbone_init: Optional[Dict] = None,
):
    """``backbone_init``: optional pretrained param/batch_stats overlay
    ({"params": ..., "batch_stats": ...}) applied before the head/backbone
    split — the transfer protocol.  The reference freezes an
    ImageNet-pretrained torchvision backbone and trains only the FC head
    (train_classification.py:29-158); with no ImageNet weights in this
    environment, a backbone pretrained on a DIFFERENT synthetic lesion task
    (the "distinct" corpus) stands in for the generic-feature initializer.
    The Dense_0 head is excluded from the overlay (fresh head per task).
    """
    net, variables = init_resnet18(
        jax.random.PRNGKey(cfg.seed), cfg.num_classes, input_hw
    )
    if backbone_init is not None:
        variables = {
            "params": {
                **variables["params"],
                **{k: v for k, v in backbone_init["params"].items()
                   if k != "Dense_0"},
            },
            "batch_stats": backbone_init.get(
                "batch_stats", variables["batch_stats"]
            ),
        }
    head_opt = optax.adam(cfg.learning_rate)
    weights = jnp.asarray(
        class_weights
        if class_weights is not None
        else np.ones(cfg.num_classes, np.float32)
    )

    # Split: trainable head = Dense_0; everything else frozen (reference
    # freezes the backbone, train_classification.py head-only optimizer).
    # With cfg.train_backbone everything is trainable (see config note);
    # BatchNorm stays in eval mode (init running stats) either way, so no
    # mutable-state plumbing is needed — frozen-BN training.
    def split(params):
        if cfg.train_backbone:
            return dict(params), {}
        head = {"Dense_0": params["Dense_0"]}
        back = {k: v for k, v in params.items() if k != "Dense_0"}
        return head, back

    params = dict(variables["params"])
    head_params, backbone = split(params)
    opt_state = head_opt.init(head_params)
    batch_stats = variables["batch_stats"]

    @jax.jit
    def train_step(head_params, opt_state, patches, labels):
        x = preprocess_patches(patches)

        def loss_fn(hp):
            logits = net.apply(
                {"params": {**backbone, **hp}, "batch_stats": batch_stats},
                x,
                train=False,  # frozen backbone: eval-mode batch stats
            )
            logw = jax.nn.log_softmax(logits)
            onehot = jax.nn.one_hot(labels, cfg.num_classes)
            ce = -(onehot * logw).sum(-1) * weights[labels]
            return ce.mean(), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            head_params
        )
        updates, opt_state = head_opt.update(grads, opt_state)
        return optax.apply_updates(head_params, updates), opt_state, loss, logits

    @jax.jit
    def eval_step(head_params, patches, labels):
        x = preprocess_patches(patches)
        logits = net.apply(
            {"params": {**backbone, **head_params}, "batch_stats": batch_stats},
            x,
            train=False,
        )
        return multi_acc(logits, labels)

    state = {
        "net": net,
        "backbone": backbone,
        "batch_stats": batch_stats,
        "head_params": head_params,
        "opt_state": opt_state,
    }
    return state, train_step, eval_step


def train_classifier(
    patches: np.ndarray,
    labels: np.ndarray,
    cfg: ClassifierTrainConfig = ClassifierTrainConfig(),
    val: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    log_every: int = 50,
    log_fn: Callable[[int, Dict], None] = lambda i, s: None,
    backbone_init: Optional[Dict] = None,
):
    """patches: (N, H, W) float; labels: (N,) int."""
    counts = np.bincount(labels, minlength=cfg.num_classes).astype(np.float32)
    class_weights = counts.sum() / (cfg.num_classes * np.maximum(counts, 1))
    state, train_step, eval_step = make_classifier_trainer(
        cfg, patches.shape[-1], class_weights, backbone_init=backbone_init
    )
    hp, opt_state = state["head_params"], state["opt_state"]
    px = jnp.asarray(patches)
    ly = jnp.asarray(labels)
    rng = np.random.default_rng(cfg.seed)
    n = patches.shape[0]
    for i in range(cfg.steps):
        idx = rng.choice(n, min(cfg.batch_size, n), replace=False)
        hp, opt_state, loss, _ = train_step(hp, opt_state, px[idx], ly[idx])
        if i % log_every == 0:
            stats = {"loss": float(loss)}
            if val is not None:
                stats["val_acc"] = float(
                    eval_step(hp, jnp.asarray(val[0]), jnp.asarray(val[1]))
                )
            log_fn(i, stats)
    state["head_params"] = hp
    state["opt_state"] = opt_state
    return state, eval_step


def make_eval_from_checkpoint(path: str):
    """Restore a classifier checkpoint (cli train-classifier output:
    {head_params, backbone, batch_stats} + metadata) -> eval_acc(patches,
    labels) callable for eval/downstream.classification_conditions."""
    import jax

    from miccai24_immoco_tpu.models.resnet import ResNet18
    from miccai24_immoco_tpu.utils.checkpoint import restore_with_meta

    tree, meta = restore_with_meta(path)
    net = ResNet18(num_classes=2)
    variables = {
        "params": {**tree["backbone"], **tree["head_params"]},
        "batch_stats": tree["batch_stats"],
    }

    @jax.jit
    def logits_fn(patches):
        return net.apply(variables, preprocess_patches(patches), train=False)

    def eval_acc(patches: np.ndarray, labels: np.ndarray) -> float:
        logits = logits_fn(jnp.asarray(patches))
        return float(multi_acc(logits, jnp.asarray(labels)))

    return eval_acc
