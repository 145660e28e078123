"""miccai24_immoco_tpu — TPU-native JAX framework for self-supervised MRI motion
correction (IM-MoCo, MICCAI 2024) and its baselines.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``multimodallearning/MICCAI24_IMMoCo`` (reference mounted read-only at
``/root/reference``): hash-grid INR instance fits, k-space line detection,
motion simulation, Autofocusing / AF+ / U-Net-denoiser baselines, metrics and
evaluation harness — all built TPU-first (static shapes, ``lax.scan`` inner
loops, ``vmap`` slice batching, ``shard_map`` device parallelism).

Layer map (mirrors SURVEY.md §1, reimagined for TPU):

- ``ops``      — numerics: centered FFT pair, warping, hash-grid encoding,
                 losses, metrics, movement-group mask algebra, motion
                 simulation, NUFFT.
- ``models``   — IM-MoCo instance fit, klD-Net / denoiser U-Nets,
                 Autofocusing, AF+, ResNet18 classifier.
- ``parallel`` — mesh construction and sharded batched instance fits
                 (data-parallel over slices, level-parallel hash tables).
- ``data``     — fastMRI h5 IO, frozen test-corpus generation.
- ``train``    — training loops (klD-Net, denoiser, AF+ metric net,
                 classifier).
- ``eval``     — metric aggregation, LaTeX tables, figure/violin reporting.
"""

__version__ = "0.1.0"

from miccai24_immoco_tpu import config  # noqa: F401
