"""Native data-plane tests: C++ path vs Python fallbacks vs jnp ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from miccai24_immoco_tpu import native
from miccai24_immoco_tpu.ops.complex_utils import rss_complex
from miccai24_immoco_tpu.ops.masks import group_labels
from miccai24_immoco_tpu.ops.nufft import kb_kernel_table, ugly_number


def test_native_builds():
    # The toolchain is baked into this image; the native path must be live.
    assert native.available()


def test_rss_combine_crop_matches_jnp(rng):
    x = (rng.standard_normal((3, 40, 44)) + 1j * rng.standard_normal((3, 40, 44))).astype(
        np.complex64
    )
    out = native.rss_combine_crop(x, 32)
    img = jnp.asarray(x)[:, 4:36, 6:38]
    expect = np.asarray(rss_complex(img, axis=0))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_run_length_groups_matches_jnp():
    ind = np.asarray([0, 1, 1, 0, 1, 0, 0, 1, 1, 1], np.uint8)
    ids, n = native.run_length_groups(ind)
    np.testing.assert_array_equal(ids, np.asarray(group_labels(jnp.asarray(ind))))
    assert n == 3


def test_ugly_and_kb_match_python():
    for v in (7, 400, 1601):
        assert native.ugly_number(v) == ugly_number(v)
    table = native.kb_table(128, 4.0, 6.0)
    expect = np.asarray(kb_kernel_table(128, 4.0, 6.0))
    np.testing.assert_allclose(table, expect, rtol=1e-5)


def test_packfile_roundtrip(tmp_path, rng):
    path = str(tmp_path / "corpus.imco")
    slices = (
        rng.standard_normal((5, 16, 12)) + 1j * rng.standard_normal((5, 16, 12))
    ).astype(np.complex64)
    native.PackFile.write(path, slices)
    pf = native.PackFile(path)
    assert (pf.n, pf.h, pf.w, pf.c) == (5, 16, 12, 2)
    np.testing.assert_allclose(pf.read(0, 5), slices, atol=0)
    np.testing.assert_allclose(pf.read(3)[0], slices[3], atol=0)
    with pytest.raises(IOError):
        pf.read(5)
