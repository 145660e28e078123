"""Tests for movement-group extraction and motion simulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miccai24_immoco_tpu.config import MotionSimConfig
from miccai24_immoco_tpu.ops import fft2c, ifft2c
from miccai24_immoco_tpu.ops.masks import (
    extract_movement_groups,
    group_label_image,
    group_labels,
)
from miccai24_immoco_tpu.ops.motion_sim import simulate_motion_2d, simulate_motion_batch


def oracle_group_labels(ind):
    """Reference loop semantics (motion_utils.py:69-91), as a test oracle."""
    w = len(ind)
    out = np.zeros(w, np.int64)
    count = 1
    for i in range(w):
        if i != w - 1 and ind[i] == 1 and ind[i + 1] == 1:
            out[i] = count
        elif i != w - 1 and ind[i] == 1 and ind[i + 1] == 0:
            out[i] = count
            count += 1
        elif i == w - 1 and ind[i] == 1:
            out[i] = count
    return out


@pytest.mark.parametrize(
    "ind",
    [
        [0, 1, 1, 0, 0, 1, 0, 1, 1, 1],
        [1, 1, 0, 1],
        [0, 0, 0],
        [1, 1, 1, 1],
        [1],
        [0, 1],
        [1, 0],
    ],
)
def test_group_labels_match_reference_loop(ind):
    ind = np.asarray(ind)
    ours = np.asarray(group_labels(jnp.asarray(ind)))
    np.testing.assert_array_equal(ours, oracle_group_labels(ind))


def test_group_label_image_broadcasts_columns():
    ind = jnp.asarray([0, 1, 1, 0, 1])
    img = np.asarray(group_label_image(ind))
    assert img.shape == (5, 5)
    np.testing.assert_array_equal(img[0], img[3])
    np.testing.assert_array_equal(img[0], oracle_group_labels(np.asarray(ind)))


def test_extract_movement_groups_padding():
    ind = jnp.asarray([0, 1, 1, 0, 1, 0, 0, 1])
    masks, n = extract_movement_groups(ind, height=4, max_groups=6)
    assert masks.shape == (6, 4, 8)
    assert int(n) == 3
    # Group 1 covers columns 1-2; group 3 covers column 7; groups 4+ empty.
    np.testing.assert_array_equal(np.asarray(masks[0, 0]), [0, 1, 1, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(masks[2, 0]), [0, 0, 0, 0, 0, 0, 0, 1])
    assert float(masks[3:].sum()) == 0.0
    # Union of group masks == indicator columns.
    np.testing.assert_array_equal(
        np.asarray(masks.sum(0)[0]).astype(int), np.asarray(ind)
    )


def _smooth_image(rng, h=48, w=48):
    x = rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w))
    k = np.fft.fftshift(np.fft.fft2(x))
    yy, xx = np.mgrid[:h, :w]
    g = np.exp(-(((yy - h / 2) ** 2 + (xx - w / 2) ** 2) / (2 * (h / 8) ** 2)))
    return jnp.asarray(
        np.fft.ifft2(np.fft.ifftshift(k * g)).astype(np.complex64)
    )


def test_motion_sim_structure(rng):
    img = _smooth_image(rng)
    out = jax.jit(
        lambda k, im: simulate_motion_2d(k, im, n_movements=5, max_movements=8)
    )(jax.random.PRNGKey(0), img)
    h, w = img.shape
    assert out.kspace.shape == (h, w) and out.mask.shape == (h, w)
    mask = np.asarray(out.mask)
    # Mask is column-structured.
    assert (mask == mask[0:1]).all()
    ncols = mask[0].sum()
    assert 1 <= ncols <= 8 * 9  # <= n * max width
    # Clean columns carry the original k-space.
    k_clean = np.asarray(fft2c(img))
    k_out = np.asarray(out.kspace)
    np.testing.assert_allclose(
        k_out[:, mask[0] == 0], k_clean[:, mask[0] == 0], rtol=1e-4, atol=1e-3
    )
    # Corrupted columns differ.
    assert np.abs(k_out[:, mask[0] == 1] - k_clean[:, mask[0] == 1]).max() > 1e-3
    # Rotations/translations nonzero only for active movements, never 0
    # (reference remaps 0 draws to 1).
    rot = np.asarray(out.rotations)
    assert (rot[:5] != 0).all() and (rot[5:] == 0).all()


def test_motion_sim_deterministic_and_vmappable(rng):
    img = _smooth_image(rng)
    a = simulate_motion_2d(jax.random.PRNGKey(7), img)
    b = simulate_motion_2d(jax.random.PRNGKey(7), img)
    np.testing.assert_array_equal(np.asarray(a.kspace), np.asarray(b.kspace))

    batch = jnp.stack([img, img * 0.5])
    out = simulate_motion_batch(jax.random.PRNGKey(3), batch)
    assert out.kspace.shape == (2, *img.shape)
    # Different keys per sample -> different corruption.
    assert np.abs(np.asarray(out.mask[0]) - np.asarray(out.mask[1])).sum() > 0


def test_motion_sim_feeds_group_extraction(rng):
    img = _smooth_image(rng)
    out = simulate_motion_2d(jax.random.PRNGKey(11), img, n_movements=4)
    masks, n = extract_movement_groups(out.mask[0], img.shape[0], max_groups=10)
    assert 1 <= int(n) <= 4
    np.testing.assert_array_equal(
        np.asarray(masks.sum(0)).astype(int), np.asarray(out.mask)
    )
