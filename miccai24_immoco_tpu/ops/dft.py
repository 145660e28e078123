"""Centered 2-D DFT as dense matmuls — the MXU alternative to XLA's FFT.

XLA's TPU FFT lowering is a known soft spot: the fit step calls fft2c over
(max_movements, H, W) complex every iteration (forward AND backward), and
measurement (scripts/fft_bench.py) shows the FFT path costs ~5-7 ms per
batch-4 iteration over the matmul floor while the DFT-matmul path is in the
measurement noise.  A centered DFT over a fixed H/W is a constant linear
map, so both axes can be evaluated as dense matmuls with the fftshift /
ifftshift permutations folded into the matrices:

    fft2c(X) = A_h @ X @ A_w^T,   A = P_shift F P_ishift  (320^2: ~0.8 MB)

FLOPs at 320^2 x 12 movements: ~6 GFLOP per forward — noise for the MXU —
and the autodiff of a matmul is a matmul (no FFT in the backward either).
The two contractions are ordered so no explicit transpose is materialized:
contracting the H axis first leaves (..., W, U) which the W-axis contraction
maps back to (..., U, V).

Semantics match ops/fft.fft2c / ifft2c for the matching size exactly (same
asymmetric shift ordering, unnormalized forward, 1/N inverse — reference
src/utils/data_utils.py:29-34); fp32 matmuls run at Precision.HIGHEST so the
result agrees with the FFT to ~1e-4 relative (unit-tested).

Statics discipline: the DFT matrices MUST be threaded through jitted callers
as arguments (build via ``centered_dft_statics`` once, pass in the model's
statics pytree) — closing over them would constant-fold at every compile.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _centered_dft_matrix(n: int, inverse: bool = False) -> np.ndarray:
    """Matrix A with centered-DFT-along-one-axis(x) == A @ x.

    Forward: fftshift(fft(ifftshift(x))) (unnormalized);
    inverse: ifftshift(ifft(fftshift(x))) (1/N) — the reference's asymmetric
    shift ordering in both directions (data_utils.py:29-34).
    """
    eye = np.eye(n, dtype=np.complex64)
    if inverse:
        out = np.fft.ifftshift(
            np.fft.ifft(np.fft.fftshift(eye, axes=0), axis=0), axes=0
        )
    else:
        out = np.fft.fftshift(
            np.fft.fft(np.fft.ifftshift(eye, axes=0), axis=0), axes=0
        )
    return out.astype(np.complex64)


def centered_dft_statics(h: int, w: int, inverse: bool = False) -> Dict[str, Any]:
    """Device-resident real/imag DFT matrices for (h, w) images.

    Returns {"htr","hti","wtr","wti"}: A_h^T and A_w^T real/imag parts as
    float32 (complex64 cannot cross host<->device on the target runtime —
    utils/hostio.py).  Both matrices are symmetric for any n (A[u,k] depends
    only on u*k products), but transposed layout is kept explicit.
    """
    a_ht = _centered_dft_matrix(h, inverse).T
    a_wt = _centered_dft_matrix(w, inverse).T
    return {
        "htr": jnp.asarray(np.ascontiguousarray(a_ht.real), jnp.float32),
        "hti": jnp.asarray(np.ascontiguousarray(a_ht.imag), jnp.float32),
        "wtr": jnp.asarray(np.ascontiguousarray(a_wt.real), jnp.float32),
        "wti": jnp.asarray(np.ascontiguousarray(a_wt.imag), jnp.float32),
    }


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Contract axis -2 of ``a`` with axis 0 of ``b`` at fp32/HIGHEST; the
    contracted-result axis lands at the END of the output (XLA layout —
    no transpose materialized)."""
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((a.ndim - 2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def fft2c_mm(x: jnp.ndarray, dft: Dict[str, Any]) -> jnp.ndarray:
    """Centered 2-D (i)DFT of complex (..., H, W) via matmuls.

    Matches ops/fft.fft2c when ``dft`` was built with inverse=False, and
    ifft2c with inverse=True (1/N folded into the matrices).
    """
    xr, xi = jnp.real(x), jnp.imag(x)
    # H axis: contract axis -2 with A_h^T -> (..., W, U)  [= (A_h @ X)^T]
    yr = _mm(xr, dft["htr"]) - _mm(xi, dft["hti"])
    yi = _mm(xr, dft["hti"]) + _mm(xi, dft["htr"])
    # W axis: contract axis -2 (the W axis of the transposed layout) with
    # A_w^T -> (..., U, V) — back in natural layout.
    zr = _mm(yr, dft["wtr"]) - _mm(yi, dft["wti"])
    zi = _mm(yr, dft["wti"]) + _mm(yi, dft["wtr"])
    return jax.lax.complex(zr, zi)
