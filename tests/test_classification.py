"""ResNet-18 classifier, annotation processing, and patch extraction tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.data.annotations import (
    build_patch_dataset,
    extract_patch,
    filter_classes,
    read_annotations,
    split_by_file,
)
from miccai24_immoco_tpu.models.resnet import init_resnet18, preprocess_patches
from miccai24_immoco_tpu.train.train_classification import (
    ClassifierTrainConfig,
    multi_acc,
    train_classifier,
)


def test_resnet18_shapes():
    net, variables = init_resnet18(jax.random.PRNGKey(0), 2, 64)
    out = net.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 2)
    feats = net.apply(
        variables, jnp.zeros((1, 64, 64, 3)), train=False, return_features=True
    )
    assert feats.shape == (1, 512)


def test_preprocess_patches_imagenet_norm(rng):
    p = jnp.asarray(rng.random((3, 16, 16)).astype(np.float32) * 7)
    x = preprocess_patches(p)
    assert x.shape == (3, 16, 16, 3)
    # After min-max to [0,1] and ImageNet normalize, channel ranges differ.
    x0 = np.asarray(x[..., 0])
    assert x0.min() == pytest.approx((0 - 0.485) / 0.229, abs=1e-4)


def test_multi_acc():
    logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0], [5.0, 0.0]])
    labels = jnp.asarray([0, 1, 1])
    assert float(multi_acc(logits, labels)) == pytest.approx(2 / 3)


def test_classifier_head_learns_separable_patches(rng):
    # Two trivially separable classes: bright vs dark patches.
    n = 40
    dark = rng.random((n // 2, 32, 32)).astype(np.float32) * 0.2
    brite = rng.random((n // 2, 32, 32)).astype(np.float32) * 0.2 + 0.8
    patches = np.concatenate([dark, brite])
    labels = np.concatenate([np.zeros(n // 2, np.int32), np.ones(n // 2, np.int32)])
    cfg = ClassifierTrainConfig(steps=100, batch_size=16, learning_rate=1e-2)
    state, eval_step = train_classifier(patches, labels, cfg,
                                        val=(patches, labels))
    acc = float(eval_step(state["head_params"], jnp.asarray(patches),
                          jnp.asarray(labels)))
    assert acc > 0.8, acc


def test_annotations_pipeline(tmp_path, rng):
    csv_path = tmp_path / "brain.csv"
    rows = ["file,slice,study_level,x,y,width,height,label"]
    for i in range(30):
        if i < 13:
            lab = "Nonspecific white matter lesion"
        elif i < 26:
            lab = "Craniotomy"
        else:
            lab = "Rare thing"  # below min_instances -> filtered out
        rows.append(f"f{i % 5},{i % 3},No,10,12,8,6,{lab}")
    csv_path.write_text("\n".join(rows))

    parsed = read_annotations(str(csv_path))
    assert len(parsed) == 30
    kept, cmap = filter_classes(parsed, min_instances=5)
    assert cmap == {"Craniotomy": 0, "Nonspecific white matter lesion": 1}
    assert all("class_id" in r for r in kept)

    splits = split_by_file(kept, test_files=2)
    files = lambda rs: {r["file"] for r in rs}
    assert not (files(splits["test"]) & files(splits["train"]))
    assert not (files(splits["test"]) & files(splits["val"]))

    img = rng.random((64, 64)).astype(np.float32)
    patches, labs, weights = build_patch_dataset(
        kept[:6], lambda f, s: img, patch=24
    )
    assert patches.shape == (6, 24, 24)
    assert weights.shape == (2,)


def test_extract_patch_centered():
    img = jnp.zeros((64, 64)).at[30:34, 40:44].set(1.0)
    patch = extract_patch(img, cx=42.0, cy=32.0, patch=16)
    assert patch.shape == (16, 16)
    # The bright box lands in the middle of the patch.
    mid = np.asarray(patch[4:12, 4:12])
    assert mid.sum() > 0.8 * np.asarray(patch).sum()
