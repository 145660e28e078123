"""Golden tests: affine_grid / grid_sample vs torch CPU, covering the exact
align_corners mixtures the reference uses (built True, sampled False:
immoco.py:72-76 + 97-107; motion sim uses border padding motion_utils.py:165-182;
Autofocusing uses bicubic autofocusing.py:75-85)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from miccai24_immoco_tpu.ops.warp import affine_grid, grid_sample, identity_grid


def rand_theta(rng, n=1, scale=0.2):
    base = np.tile(np.eye(2, 3, dtype=np.float32), (n, 1, 1))
    base[:, :, :2] += scale * rng.standard_normal((n, 2, 2)).astype(np.float32)
    base[:, :, 2] = 0.3 * rng.standard_normal((n, 2)).astype(np.float32)
    return base


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("hw", [(8, 8), (7, 11)])
def test_affine_grid_matches_torch(rng, align, hw):
    theta = rand_theta(rng, n=3)
    ours = np.asarray(affine_grid(jnp.asarray(theta), hw, align_corners=align))
    theirs = F.affine_grid(
        torch.from_numpy(theta), (3, 1, *hw), align_corners=align
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_identity_grid_matches_reference_construction():
    # Reference builds the Image-INR query grid via affine_grid(eye, ...,
    # align_corners=True) (immoco.py:72-76).
    h, w = 5, 9
    ours = np.asarray(identity_grid((h, w), align_corners=True))
    theirs = F.affine_grid(
        torch.eye(2, 3).unsqueeze(0), (1, 1, h, w), align_corners=True
    )[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(rng, mode, padding, align):
    n, c, h, w = 2, 3, 9, 12
    img = rng.standard_normal((n, c, h, w)).astype(np.float32)
    theta = rand_theta(rng, n=n, scale=0.3)
    grid_t = F.affine_grid(torch.from_numpy(theta), (n, c, h, w), align_corners=True)
    theirs = F.grid_sample(
        torch.from_numpy(img),
        grid_t,
        mode=mode,
        padding_mode=padding,
        align_corners=align,
    ).numpy()
    grid_j = jnp.asarray(grid_t.numpy())
    ours = np.asarray(
        grid_sample(
            jnp.asarray(img),
            grid_j,
            mode=mode,
            padding_mode=padding,
            align_corners=align,
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_grid_sample_complex_matches_re_im_pair(rng):
    # Reference warps complex images by sampling the view_as_real channels
    # (immoco.py:97-107); our complex path must equal per-part sampling.
    c, h, w = 1, 8, 8
    img = (
        rng.standard_normal((c, h, w)) + 1j * rng.standard_normal((c, h, w))
    ).astype(np.complex64)
    theta = rand_theta(rng, n=1)
    grid = affine_grid(jnp.asarray(theta[0]), (h, w), align_corners=True)
    out = np.asarray(
        grid_sample(jnp.asarray(img), grid, mode="bilinear", align_corners=False)
    )
    re = np.asarray(
        grid_sample(jnp.asarray(img.real), grid, mode="bilinear", align_corners=False)
    )
    im = np.asarray(
        grid_sample(jnp.asarray(img.imag), grid, mode="bilinear", align_corners=False)
    )
    np.testing.assert_allclose(out, re + 1j * im, atol=1e-6)


def test_grid_sample_gradients_finite(rng):
    import jax

    img = jnp.asarray(rng.standard_normal((1, 6, 6)).astype(np.float32))
    grid = identity_grid((6, 6)) * 0.9

    def loss(g):
        return jnp.sum(grid_sample(img, g, mode="bilinear") ** 2)

    g = jax.grad(loss)(grid)
    assert np.all(np.isfinite(np.asarray(g)))
