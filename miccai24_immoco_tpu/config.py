"""Typed configuration for the whole framework.

The reference scatters every hyperparameter as hard-coded literals across its
scripts (SURVEY.md §5 "Config / flag system: none"); here they are collected
into frozen dataclasses so that training scripts, the instance fit, and the
benchmark all draw from one audited source.  Defaults reproduce the reference
behavior exactly; each field cites the reference origin (file:line under
/root/reference).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Multiresolution hash-grid encoding.

    Mirrors the tiny-cuda-nn config at src/models/immoco.py:27-37 of the
    reference: 16 levels x 2 features, 2^19-entry tables, base resolution 16,
    per-level scale 2, linear interpolation.
    """

    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 2.0
    # tiny-cuda-nn initializes hash tables ~ U(-1e-4, 1e-4).
    init_scale: float = 1e-4

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def num_features(self) -> int:
        return self.num_levels * self.features_per_level

    def level_resolution(self, level: int) -> int:
        # tcnn: N_l = floor(N_min * b^l)
        return int(self.base_resolution * (self.per_level_scale**level))


@dataclasses.dataclass(frozen=True)
class LatticeEncodingConfig:
    """TPU-native separable lattice encoding (alternative to the hash grid).

    For INR queries that form a fixed regular lattice (always the case in
    IM-MoCo: the Image INR queries the identity grid, the Motion INR a
    (movements, H, W) meshgrid — immoco.py:72-80), each sub-Nyquist level is
    a dense feature grid evaluated by *separable interpolation matmuls*
    (MXU-friendly, zero gathers), and all super-Nyquist hashed levels are
    folded into free per-lattice-point "fine" features — which on a fixed
    lattice strictly subsume hashed features (a hashed level restricted to a
    lattice is a fixed sparse linear map of table entries with collisions;
    a free per-point feature removes the collisions).
    """

    base_resolution: int = 16
    per_level_scale: float = 2.0
    features_per_level: int = 2
    num_levels: int = 16
    # Per-level dense-entry cap; defaults to the reference hash-table size so
    # the parameter budget per level matches the hash grid it replaces.
    dense_entry_budget: int = 1 << 19
    # Per-point feature dim; -1 derives features_per_level * n_folded_levels.
    fine_features: int = -1
    init_scale: float = 1e-4


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Small INR head MLP (reference: tcnn network_config, immoco.py:11-25)."""

    hidden_width: int = 256
    num_hidden_layers: int = 1
    activation: str = "relu"  # "relu" | "tanh"
    out_features: int = 2


@dataclasses.dataclass(frozen=True)
class ImageINRConfig:
    """Image INR: 2-D coords -> (Re, Im). Reference immoco.py:11-17,60-62."""

    encoding: str = "hash"  # "hash" | "lattice"
    grid: HashGridConfig = HashGridConfig()
    lattice: LatticeEncodingConfig = LatticeEncodingConfig()
    mlp: MLPConfig = MLPConfig(hidden_width=256, activation="relu")


@dataclasses.dataclass(frozen=True)
class MotionINRConfig:
    """Motion INR: 3-D coords (movement, x, y) -> 2-D displacement.

    Reference immoco.py:19-25,63-65 — 64-wide Tanh MLP, output squashed with
    tanh and added to the identity sampling grid (immoco.py:93-95).
    """

    encoding: str = "hash"  # "hash" | "lattice"
    grid: HashGridConfig = HashGridConfig()
    # Displacement fields are smooth; default the lattice variant to the dense
    # pyramid only (no per-point fine features).
    lattice: LatticeEncodingConfig = LatticeEncodingConfig(fine_features=0)
    mlp: MLPConfig = MLPConfig(hidden_width=64, activation="tanh")


@dataclasses.dataclass(frozen=True)
class InstanceFitConfig:
    """IM-MoCo per-slice self-supervised optimization.

    Reference defaults: imcoco_motion_correction(iters=200, lr=1e-2,
    lambda_ge=1e-2) at immoco.py:116-117; k-space pre-scaled to max-abs 16000
    (immoco.py:137-139); lambda halving schedule at immoco.py:180-181.
    """

    iters: int = 200
    learning_rate: float = 1e-2
    lambda_ge: float = 1e-2
    kspace_scale: float = 16000.0
    # Lambda-decay variant: "main" replicates immoco.py:180-181; "downstream"
    # replicates the near-duplicate in test_immoco_downstream.py:188-189
    # (halve when j % 10 == 0 and j > 80; k-space scaled x8000 there).
    schedule_variant: str = "main"
    # Adam (torch defaults, immoco.py:149-154)
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    image_inr: ImageINRConfig = ImageINRConfig()
    motion_inr: MotionINRConfig = MotionINRConfig()
    # Static padded movement-group count for XLA; reference shapes are
    # data-dependent (heavy scenario uses 16-19 groups, prepareData.py:147-148).
    max_movements: int = 24
    # Compute dtype for the INR MLPs ("bfloat16" rides the MXU; params fp32).
    compute_dtype: str = "float32"
    # Warp implementation: "matmul" runs bilinear sampling as one-hot MXU
    # matmuls (no gather/scatter — 35x faster per fit iteration on TPU, see
    # ops/warp_mm.py); "gather" is the torch-semantics reference path;
    # "pallas_tiled" is the fused windowed Pallas kernel (custom forward AND
    # backward, ~6x fewer warp FLOPs; requires motion_disp_px <=
    # warp_pallas_tile_px/2 - 2, see ops/warp_tiled_pallas.py).
    warp_impl: str = "matmul"
    # Round-5 XH warp: build the bilinear hat rows in one fused XLA pass
    # per direction and stream them into apply-style Pallas kernels
    # (ops/warp_tiled_pallas._warp_tiled_xh).  Bit-identical numerics to
    # the fused kernels; trades the measured per-row VPU floor (~18 us per
    # (movement, window) unit) for HBM-rate weight reads.
    warp_pallas_xla_hats: bool = False
    # Output-tile edge for warp_impl="pallas_tiled" (source window is twice
    # this unless warp_pallas_win_px overrides); H, W must be divisible by
    # it.
    warp_pallas_tile_px: int = 64
    # Source-window edge for warp_impl="pallas_tiled" (0 = the historic
    # 2*tile).  A smaller window shrinks the per-unit hat-row build (the
    # measured VPU floor, PERFORMANCE.md item 2a) and the window matmuls
    # proportionally; exactness requires motion_disp_px <=
    # (win - tile)/2 - 2, so e.g. tile 64 / win 96 pairs with a 14 px cap.
    # Must be a multiple of 8.
    warp_pallas_win_px: int = 0
    # Optional displacement cap in pixels: scales the Motion INR's tanh
    # output so |displacement| <= motion_disp_px (reference allows the full
    # +-1 normalized range = +-half the image; protocol motions are <=~30 px
    # at the corners). Required by the banded warp; None = full range.
    # (Float-valued for derived configs: the coarse c2f companion scales
    # the cap by the raster ratio, models/immoco.py build_immoco.)
    motion_disp_px: Optional[float] = None
    # Banded-warp block size (0 = dense one-hots). Exactness requires
    # motion_disp_px <= warp_band_px - 2; 32/30 cuts warp FLOPs 3.3x.
    warp_band_px: int = 0
    # 2-D tiled-warp block size (0 = off; supersedes warp_band_px): both
    # one-hot axes span only a 3-tile window, cutting warp FLOPs ~11x at
    # tile 32 AND shrinking the rows intermediate (the bandwidth cost).
    # Exactness requires motion_disp_px <= warp_tile_px - 2.
    warp_tile_px: int = 0
    # k-space operator in the forward model: "fft" uses XLA's TPU FFT;
    # "dft_mm" evaluates the centered DFT as dense MXU matmuls (ops/dft.py),
    # matmul-only in the backward too; agrees with the FFT to ~1e-4.
    # Measured neutral on the target TPU (the FFTs are not the bottleneck);
    # kept for toolchains with slow FFT lowerings.
    kspace_op: str = "fft"
    # Hard data-consistency projection on the OUTPUT image (deliberate
    # divergence, off by default for parity): the reference returns the raw
    # Image-INR prediction (immoco.py:206), discarding the measured k-space
    # columns outside the movement groups even though those columns equal
    # the ground truth exactly under the column-replacement corruption model
    # (motion_utils.py:185-190). With dc_replace the output spectrum keeps
    # the measured data on uncorrupted columns and uses the INR only where
    # the data is corrupted — the standard inverse-problem DC projection
    # (the reference's own Autofocusing baseline recomposes DC lines the
    # same way, autofocusing.py:87-89).
    dc_replace: bool = False
    # Motion-INR lattice downsampling (deliberate divergence, 1 = reference
    # parity): with factor f the displacement field is evaluated on an
    # (M, H/f, W/f) lattice and bilinearly upsampled to (M, H, W) via two
    # small interp matmuls (MXU work). The reference evaluates its Motion
    # INR at every output pixel (immoco.py:78-80, 93-95), but the fields it
    # learns are tanh-bounded smooth deformations of near-rigid motions, so
    # a half-resolution lattice represents them with no measured quality
    # loss while cutting the motion-INR encode+MLP cost ~4x (the second-
    # largest per-iteration term after the warp — PERFORMANCE.md round 2).
    motion_res_factor: int = 1
    # Polyak/EMA averaging of the INR parameters over late iterations
    # (deliberate divergence, 0.0 = reference parity): the reference returns
    # the final-iterate Image INR (immoco.py:206), but its lambda schedule
    # drives the GE prior to ~0 after iters/2, so late iterations purely
    # chase the measured (corrupted) k-space through the imperfect motion
    # model — measured on the heavy scenario, the final iterate OVERFITS
    # (400-iteration fits score 2-4 dB WORSE than 200).  With ema_decay d >
    # 0, an exponential moving average of the parameters is accumulated
    # from iteration floor(iters * ema_start_frac) on (before that it
    # tracks the iterate exactly) and the output image is the EMA
    # parameters' prediction — tail-iterate averaging that suppresses the
    # DC-overfit noise at zero extra optimization cost.
    ema_decay: float = 0.0
    ema_start_frac: float = 0.5
    # Coarse-to-fine fitting (deliberate divergence, 0 = reference parity):
    # the first ``coarse_iters`` of the fit run against the CENTER-CROPPED
    # k-space on a ``coarse_size``^2 raster (classic multiresolution
    # registration — the motion/image landscape is smoother at low
    # frequency, and the per-iteration warp cost scales with raster area),
    # then the SAME parameters/optimizer state continue at full resolution
    # for the remaining iterations.  Both INRs are parameterized at the
    # full-resolution lattice throughout (models/inr.py ``param_shape``), so
    # the hand-off is a pure raster switch: no re-initialization, Adam
    # moments carry over, and the lambda schedule continues (GE is an
    # unnormalized sum, so the coarse stage's lambda is scaled by the pixel-
    # count ratio to preserve the prior/data balance).  coarse_size=0 picks
    # the largest warp-tile multiple <= 0.6 * min(H, W).
    coarse_iters: int = 0
    coarse_size: int = 0
    # Multi-level pyramid generalization: ((iters, size), ...) phases in
    # coarse-to-fine order (strictly increasing sizes, each < full extent),
    # run before the full-resolution remainder.  Takes precedence over
    # coarse_iters/coarse_size when non-empty; ((i, s),) == coarse_iters=i,
    # coarse_size=s.  Measured (PERFORMANCE.md round-2 pyramid table): the
    # per-iteration cost at size s scales ~(s/H)^2 for the warp, so a
    # 192->256->320 ladder front-loads cheap iterations at equal quality.
    coarse_schedule: Tuple[Tuple[int, int], ...] = ()
    # Displacement-magnitude regularizer (deliberate divergence, 0.0 =
    # reference parity = no motion prior beyond the tanh bound,
    # immoco.py:78-95): adds lambda_motion * mean over real movement groups
    # of the squared normalized displacement field to the fit loss.  Under
    # MILD corruption draws (movement groups whose lines barely moved) the
    # unregularized bilevel fit can invent spurious motion — the Image INR
    # then absorbs the inverse warp and the output replaces near-clean
    # measured columns with smoothed INR content (the failing-heavy-slice
    # mechanism, PERFORMANCE.md round 2).  A small L2 pull toward zero
    # displacement is inert when real ghosts drive the data term but
    # collapses spurious motion on still groups.
    lambda_motion: float = 0.0
    # Anneal fraction for lambda_motion (0.0 = constant weight).  With
    # f > 0, the motion-L2 weight decays LINEARLY from lambda_motion at
    # iteration 0 to exactly 0 at floor(f * iters), and stays 0 after —
    # "start rigidly, then release".  Rationale (VERDICT r2 next#5 +
    # PERFORMANCE.md probe_motion_reg): the degenerate heavy-tail basin
    # (uniform ~7 px spurious displacement) is entered EARLY; the
    # lambda -> inf limit (motion pinned to ~0, INR-inpainting + DC)
    # beats the basin on every measured tail slice, but a CONSTANT
    # penalty can't be released once the fit escapes.  Annealing holds
    # motion near zero through the basin-forming iterations and then
    # hands the landscape back to the unregularized fit (reference
    # parity for the tail of the schedule).
    lambda_motion_anneal_frac: float = 0.0
    # Motion-gated hard data consistency in pixels (deliberate divergence,
    # 0.0 = gate off; requires dc_replace): movement groups whose FITTED
    # mean |displacement| falls below this threshold are treated as
    # uncorrupted in the output DC projection — their measured k-space
    # columns are kept instead of the INR spectrum.  Sub-pixel rigid motion
    # produces negligible ghosting, so measured data beats INR content
    # exactly where the fit says nothing moved.
    dc_motion_gate_px: float = 0.0
    # Identity-column recentering gate in pixels (deliberate divergence,
    # 0.0 = off = reference parity; the reference returns the fit as-is,
    # immoco.py:206).  The uncorrupted columns are verbatim motion-free
    # spectrum samples, so a common-mode shift of the reconstruction is
    # observable without GT: phase-correlate the final image against the
    # measured identity columns and undo the (dy, dx) peak if both
    # components are <= this gate AND the correlation peak passes a
    # confidence ratio (ops/recenter.py).  Applied BEFORE the dc_replace
    # projection.  MEASURED at protocol scale (probe_recenter.py): the
    # degenerate-basin heavy failures carry ~0 rigid shift — the fit's
    # own k-space L2 anchors translation through the same columns — so
    # this is a safety/diagnostic knob (measured-neutral on the 320²
    # protocol), not a quality lever; see ops/recenter.py for the full
    # measurement note.
    recenter_max_px: float = 0.0
    # Trailing motion-frozen phase (deliberate divergence, 0 = reference
    # parity = joint optimization for all iterations, immoco.py:149-175):
    # the LAST ``motion_freeze_iters`` full-resolution iterations hold the
    # Motion INR fixed and optimize the Image INR alone.  The sampling
    # grids are then segment-constant, so the hat-weight one-hots — the
    # measured VPU floor of every build+apply warp variant (PERFORMANCE.md
    # item 2a) — are built ONCE per compiled segment and each iteration
    # runs pure-MXU weight applies forward and backward
    # (ops/warp_mm.bilinear_weights_tiled/bilinear_apply_tiled).  The
    # lambda schedule makes late iterations data-consistency-dominant and
    # the motion field converges early under coarse-to-fine, so freezing
    # the tail trades no measured quality (bench table) for a ~2-3x
    # cheaper tail iteration.  Requires motion_disp_px <=
    # motion_freeze_tile_px - 1 and H, W divisible by the tile.
    motion_freeze_iters: int = 0
    motion_freeze_tile_px: int = 32
    # Motion duty-cycling over the full-resolution JOINT span (deliberate
    # divergence, () = reference parity = every iteration updates both
    # INRs): with (j, f), the joint span alternates j joint iterations
    # (both INRs, fused warp) with f motion-frozen iterations (Image INR
    # only, precomputed warp weights — the same frozen machinery as
    # motion_freeze_iters, weights rebuilt from the motion params at each
    # frozen sub-span entry).  Motion keeps converging at a j/(j+f) duty
    # rate while most iterations run at the ~1.8x-cheaper frozen step;
    # compose with motion_freeze_iters for a fully-frozen tail.
    motion_duty: Tuple[int, int] = ()
    # Plain joint iterations at the START of the full-res joint span before
    # duty cycling begins (only meaningful with motion_duty).  Rationale
    # (VERDICT r2 next#1): the measured light-duty ssim cost (~0.004,
    # PERFORMANCE.md duty table) comes from starving the motion fit right
    # after the c2f hand-off — the early full-res iterations need every
    # motion update, while the late ones (lambda tail -> pure DC) tolerate
    # a reduced duty rate.  duty_start delays cycling past that window.
    motion_duty_start: int = 0


@dataclasses.dataclass(frozen=True)
class MotionSimConfig:
    """Rigid 2-D motion simulation (reference motion_utils.py:121-202).

    Random per-movement integer rotation/translation in [-10, 10), corrupted
    k-space column bands of width 1-10, minimum gap size//n_movements.
    """

    n_movements_range: Tuple[int, int] = (5, 20)  # get_rand_int([5,20])
    shift_range: Tuple[int, int] = (-10, 10)
    rotate_range: Tuple[int, int] = (-10, 10)
    width_range: Tuple[int, int] = (1, 10)
    acs_fraction: float = 0.08  # computed (motion_utils.py:136) but unused


@dataclasses.dataclass(frozen=True)
class UnetConfig:
    """fastMRI-style U-Net (reference src/models/unet.py:17-111).

    klD-Net: in=2 (Re/Im k-space), out=1 logit mask, chans=32, 4 pools
    (kld_net.py:4-12, train_kld_net.py:20). Denoiser: in=out=1, 6 pools,
    InstanceNorm (train_unet_denoiser.py:35-42).
    """

    in_chans: int = 2
    out_chans: int = 1
    chans: int = 32
    num_pool_layers: int = 4
    drop_prob: float = 0.0
    norm: str = "instance"  # "instance" | "batch" | "none"


@dataclasses.dataclass(frozen=True)
class KLDTrainConfig:
    """klD-Net training recipe (reference train_kld_net.py:22-32)."""

    steps: int = 4200
    batch_size: int = 4
    learning_rate: float = 1e-4
    seed: int = 128
    best_dice_gate: float = 0.80
    # CosineAnnealingWarmRestarts(T_0=steps//6, T_mult=2), stepped after i>5.
    cosine_t0_div: int = 6
    cosine_t_mult: int = 2


@dataclasses.dataclass(frozen=True)
class AutofocusingConfig:
    """Autofocusing baseline budget (test_autofocusing.py:66-74)."""

    iters: int = 60
    learning_rate: float = 1.0
    loss_scale: float = 1e-4
    max_movements: int = 24
    warp_impl: str = "matmul"  # "matmul" (MXU one-hot) | "gather" (torch path)


@dataclasses.dataclass(frozen=True)
class AFPlusConfig:
    """AF+ baseline (af_plus.py:34-97): per-line rigid params, hand-rolled
    Adam beta=(0.89, 0.8999), lr 3e-4, 80 iters, central 8% lines frozen."""

    iters: int = 80
    learning_rate: float = 3e-4
    b1: float = 0.89
    b2: float = 0.8999
    grad_scale: float = 1e-4
    center_fraction: float = 0.08
    nufft_oversamp: int = 5
    # KB gridding backend: "matmul" = one dense MXU matmul (ops/nufft.py),
    # "scatter" = tap-loop scatter-add (identical results; CPU-friendly).
    nufft_mode: str = "matmul"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Corpus layout (reference prepareData.py).

    light = 6-9 movements, heavy = 16-19 (prepareData.py:147-148); 320^2
    center crop with separate-Re/Im RSS coil combine (data_utils.py:60-75).
    """

    crop_size: int = 320
    n_test: int = 50
    light_movements: Tuple[int, int] = (6, 10)  # np.arange semantics [lo, hi)
    heavy_movements: Tuple[int, int] = (16, 20)
    slice_index: int = 1  # preprocess_dataset picks volume slice [1]


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for batched fits. dp shards the slice batch; tp
    shards hash-grid levels (all-gathered features over ICI)."""

    dp: int = -1  # -1: all remaining devices
    tp: int = 1


@dataclasses.dataclass(frozen=True)
class FrameworkConfig:
    fit: InstanceFitConfig = InstanceFitConfig()
    sim: MotionSimConfig = MotionSimConfig()
    kld_unet: UnetConfig = UnetConfig()
    kld_train: KLDTrainConfig = KLDTrainConfig()
    autofocus: AutofocusingConfig = AutofocusingConfig()
    afplus: AFPlusConfig = AFPlusConfig()
    data: DataConfig = DataConfig()
    mesh: MeshConfig = MeshConfig()


DEFAULT = FrameworkConfig()


def replace(cfg, **kw):
    """dataclasses.replace passthrough for ergonomic config overrides."""
    return dataclasses.replace(cfg, **kw)
