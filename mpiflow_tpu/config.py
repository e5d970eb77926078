"""Configuration dataclasses for the generation pipeline and training.

The defaults reproduce the reference CLI defaults
(gen_3dphoto_dynamic_v2.py:20-34) and the constants hard-coded across the
reference render path (utils/utils.py, model/AdaMPI.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Normalized pinhole intrinsics (reference: gen_3dphoto_dynamic_v2.py:42-49)."""

    fx: float = 0.58
    fy: float = 0.58
    cx: float = 0.5
    cy: float = 0.5
    # The reference casts K to fp16 on GPU before scaling; enabling this
    # reproduces that quantization for bit-parity experiments.
    fp16_quantized: bool = False


@dataclasses.dataclass(frozen=True)
class PoseConfig:
    """Random pose distribution (reference: utils/utils.py:121-156).

    Three flavors exist in the reference:
      * "kitti_v2"  : utils/utils.py        (base 0.1, forward-biased z, angle x0.4)
      * "coco"      : utils/utils_coco.py   (base 0.05 keyed scaling, angle x0.5)
      * "legacy"    : utils/utils copy.py   (base 0.05, translation x0.3, angle x0.2)
    """

    flavor: str = "kitti_v2"
    ext_cz: float = 0.15
    base_motions: Tuple[float, float, float] = (0.1, 0.1, 0.1)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """MPI rendering constants (reference: utils/mpi/mpi_rendering.py, utils/utils.py)."""

    num_planes: int = 64
    disp_near: float = 1.0
    disp_far: float = 0.001           # model/AdaMPI.py:15 disp_range=[0.001, 1]
    far_dist_cap: float = 1e3         # mpi_rendering.py:75 last-plane distance
    cumprod_eps: float = 1e-6         # mpi_rendering.py:84
    depth_eps: float = 1e-5           # mpi_rendering.py:152 weighted depth eps
    flow_clip: float = 200.0          # utils/utils.py:348
    mask_thresh: float = 0.99         # utils/utils.py:171
    hard_flow: bool = False
    # Renderer execution strategy: "pallas" (VMEM-tiled warp kernel, 2x the
    # XLA gather on v5e; exact, guarded fallback -- ops/pallas_warp.py),
    # "preblocked" (XLA blocked gather), "quad", "scan" (O(H*W) memory,
    # serial planes) or "batched" (plane-parallel, materializes the stack).
    # All numerically identical; the generator downgrades "pallas" to
    # "preblocked" when the backend/resolution can't run the kernel.
    mode: str = "pallas"
    # Compositing dtype. The reference runs fp16 end-to-end on GPU; we run
    # fp32 (TPU bf16 is too coarse for pixel-accurate flow).
    dtype: str = "float32"
    # Dtype of the warp gather TABLE (preblocked/pallas modes). "bfloat16"
    # halves the HBM traffic of the bytes-bound warp kernel; it rounds only
    # the gathered rgb/sigma/mask channels (the reference itself renders
    # from an fp16 model, utils/utils.py:188). Ground-truth flow is
    # analytic + composited with f32 source weights, so it is UNCHANGED;
    # compositing stays f32. "float32" (default) is bit-exact vs the
    # reference oracle.
    warp_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class InpaintConfig:
    """Hole inpainting of motion-occlusions (reference: utils/utils.py:284-286).

    method:
      * "jax"   : iterative masked diffusion on-device (default; fully fused)
      * "cv2_ns": exact reference behavior, cv2.inpaint(..., 3, INPAINT_NS) on host
    """

    method: str = "jax"
    radius: int = 3
    num_iters: int = 128


@dataclasses.dataclass(frozen=True)
class DepthConfig:
    """Disparity preprocessing (reference: bilateral_filter.py:13-53; the
    filter is commented off the live path at utils/utils.py:48)."""

    bilateral_iters: int = 0          # 0 = off (reference live-path behavior)
    bilateral_size: int = 5           # filter_size=[5,5] per iteration
    bilateral_threshold: float = 0.04


@dataclasses.dataclass(frozen=True)
class GenConfig:
    """End-to-end dataset generation (reference CLI: gen_3dphoto_dynamic_v2.py:20-34)."""

    width: int = 1280
    height: int = 384
    seed: int = 114514
    repeat: int = 5
    ckpt_path: str = "adampiweight/adampi_64p.pth"
    base: str = ""
    out: str = ""
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    pose: PoseConfig = dataclasses.field(default_factory=PoseConfig)
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    inpaint: InpaintConfig = dataclasses.field(default_factory=InpaintConfig)
    depth: DepthConfig = dataclasses.field(default_factory=DepthConfig)
    # Batching across images on one chip and sharding across the mesh.
    batch_images: int = 1
    mesh_data_axis: int = 1
    # Multi-slice shape: >1 builds a ("host", "data") mesh of this many
    # rows x mesh_data_axis columns; each row consumes its own input base
    # dir (run() then takes a list of bases, one per host). Requires
    # rng_mode="jax" -- the numpy reference stream is inherently sequential
    # over one global file order.
    mesh_host_axis: int = 1
    # Host-side RNG parity with the reference (python `random` + numpy global
    # seeds). "numpy" reproduces the reference sample stream; "jax" uses
    # counter-based jax.random (faster, order-independent, production default).
    rng_mode: str = "numpy"
    resume: bool = True
    # Colorized mixed-flow side outputs (flow_viz/{key}.png). The COCO
    # flavor of the reference computes these per sample (utils_coco.py:270-278).
    save_flow_viz: bool = False

    @property
    def ext_cz(self) -> float:
        return self.pose.ext_cz


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    """RAFT model hyperparameters (reference: RAFT/core/raft.py:24-56)."""

    small: bool = False
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    dropout: float = 0.0
    alternate_corr: bool = False
    # "pallas" = ops/pallas_corr kernel (alt_cuda_corr's TPU counterpart;
    # bit-exact, probe-guarded fallback to xla off-TPU or on unsupported
    # shapes); "xla" = row-window gather lookup (corr_lookup_windowed).
    # Measured (tools/bench_corr.py, v5e, batch 4 288x960): 12-iter lookup
    # chain 301->164 ms fwd / 446->256 ms fwd+bwd; train step 717->653 ms.
    corr_impl: str = "pallas"
    # bf16 convs / f32 flow math (the reference's AMP); off by default so
    # parity tests and eval run pure f32 -- enable for training throughput
    mixed_precision: bool = False
    # Rematerialize the GRU-iteration scan body under autodiff: the scan
    # otherwise stashes every iteration's intermediates to HBM for the
    # backward; at 1.4% MFU the step has FLOP headroom to recompute them
    # instead. Forward values are unchanged (jax.checkpoint identity);
    # measure via tools/ablate_train.py before flipping the default.
    remat_gru: bool = False

    @staticmethod
    def small_config() -> "RAFTConfig":
        return RAFTConfig(small=True, hidden_dim=96, context_dim=64,
                          corr_levels=4, corr_radius=3)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """RAFT training schedule (reference: RAFT/train.py:217-240, train_standard.sh)."""

    name: str = "raft"
    stage: str = "mpi-flow"
    restore_ckpt: Optional[str] = None
    data_root: str = ""
    lr: float = 1e-4
    num_steps: int = 50_000
    batch_size: int = 6
    image_size: Tuple[int, int] = (288, 960)
    iters: int = 12
    wdecay: float = 1e-5
    epsilon: float = 1e-8
    clip: float = 1.0
    gamma: float = 0.85
    max_flow: float = 400.0
    add_noise: bool = False
    val_freq: int = 5000
    seed: int = 1234
    validation: Sequence[str] = ()
    # The reference calls model.freeze_bn() for every stage except chairs
    # (RAFT/train.py:146-148): frozen = eval-mode BN (running stats).
    # freeze_bn=False runs BN in train mode (batch stats + momentum-updated
    # running buffers) -- required for from-scratch chairs training.
    freeze_bn: bool = True
    # Compute the sequence loss in block layout ([N,h,w,64,2] predictions,
    # ground truth space-to-depth'd once) instead of depth-to-spacing all
    # `iters` predictions to pixel layout fwd+bwd. Same per-pixel loss
    # terms; layout-only. Measure via tools/ablate_train.py / bench_upsample
    # before flipping the default. Ignored for RAFT-small (bilinear up).
    block_up: bool = False
