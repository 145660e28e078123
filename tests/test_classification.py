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


def _torch_resnet18():
    """Minimal torch ResNet-18 with torchvision-compatible state_dict keys
    (conv1, bn1, layer{1-4}.{0,1}.conv{1,2}/bn{1,2}/downsample.{0,1}, fc) —
    the ingestion fixture for load_torch_state_dict. Built here because the
    environment has no torchvision; forward semantics follow the
    torchvision BasicBlock exactly."""
    import torch
    import torch.nn as tnn

    class TBasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    class TResNet18(tnn.Module):
        def __init__(self, num_classes=2):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            layers = []
            cin = 64
            for li, (cout, stride) in enumerate(
                [(64, 1), (128, 2), (256, 2), (512, 2)]
            ):
                blocks = tnn.Sequential(
                    TBasicBlock(cin, cout, stride), TBasicBlock(cout, cout)
                )
                setattr(self, f"layer{li+1}", blocks)
                layers.append(blocks)
                cin = cout
            self.fc = tnn.Linear(512, num_classes)

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    return TResNet18()


def test_torch_state_dict_ingestion_matches_torch_forward(rng):
    """load_torch_state_dict oracle: ingest a randomly-initialized torch
    ResNet-18 state_dict (torchvision key layout) and assert the flax
    forward reproduces the torch forward feature-for-feature. This is the
    test that makes real ImageNet weight ingestion a data change
    (reference pulls them via torch.hub, classification.py:11-13)."""
    torch = pytest.importorskip("torch")
    from miccai24_immoco_tpu.models.resnet import load_torch_state_dict

    tnet = _torch_resnet18()
    # Randomize BN running stats too, so the test catches stat mapping.
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    tnet.eval()

    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    _, variables = init_resnet18(jax.random.PRNGKey(0), num_classes=2,
                                 input_hw=64)
    variables = load_torch_state_dict(variables, state)
    # Head: map fc too (unmatched in the converter by design — set directly).
    import flax

    params = flax.core.unfreeze(variables["params"])
    params["Dense_0"]["kernel"] = jnp.asarray(state["fc.weight"].T)
    params["Dense_0"]["bias"] = jnp.asarray(state["fc.bias"])
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    from miccai24_immoco_tpu.models.resnet import ResNet18

    got = np.asarray(
        ResNet18(num_classes=2).apply(variables, jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_lesion_corpus_balanced_and_distinct():
    from miccai24_immoco_tpu.data.lesions import lesion_corpus
    from miccai24_immoco_tpu.eval.downstream import extract_patches

    c = lesion_corpus(8, 128, 128, seed=3)
    assert list(c["labels"]) == [0, 1] * 4
    assert c["image"].dtype == np.complex64
    # Deterministic.
    c2 = lesion_corpus(8, 128, 128, seed=3)
    np.testing.assert_array_equal(c["image"], c2["image"])
    # Patches at the recorded centers are class-separable in mean
    # intensity (blob = bright parenchyma, craniotomy = darkened skull).
    ps = np.stack(
        [
            np.asarray(
                extract_patches(
                    jnp.abs(jnp.asarray(c["image"][i])),
                    jnp.asarray(c["centers"][i : i + 1]),
                    62,
                )[0]
            )
            for i in range(8)
        ]
    )
    m0 = ps[c["labels"] == 0].mean()
    m1 = ps[c["labels"] == 1].mean()
    assert m0 > m1 + 0.2, (m0, m1)
