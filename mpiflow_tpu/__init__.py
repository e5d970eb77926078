"""MPI-Flow TPU: a TPU-native framework for realistic optical-flow data generation.

Re-implementation (from scratch, JAX/XLA/Pallas-first) of the capabilities of
Sharpiless/MPI-Flow (ICCV 2023, "MPI-Flow: Learning Realistic Optical Flow with
Multiplane Images"):

  * AdaMPI multiplane-image prediction (CPN encoder/UNet/decoder + PAN) as
    jitted Flax inference  (reference: model/AdaMPI.py, model/CPN/*, model/PAN.py)
  * The hot geometry path -- per-plane homography warping, back-to-front
    volume compositing, analytic plane flow -- as fused XLA/Pallas kernels
    (reference: utils/mpi/{mpi_rendering,homography_sampler}.py, geometry.py)
  * Independent object motion via dual-pose rendering and mask compositing
    (reference: utils/utils.py:159-349, moving_obj.py)
  * Forward z-buffer warping, bilateral depth filtering, diffusion inpainting
    as vectorized TPU ops (reference: external/forward_warping/warping.c,
    bilateral_filter.py, cv2.inpaint call sites)
  * Batched, sharded dataset generation over a `jax.sharding.Mesh`
    (reference parallelism: one process per GPU, scripts/gen_*.sh)
  * A RAFT optical-flow consumer (model, training loop, KITTI/Sintel eval)
    in Flax with a windowed-correlation kernel
    (reference: RAFT/, RAFT/alt_cuda_corr/)

Layout:
  io/        flow/image file codecs (.flo, KITTI PNG16, PFM) + native writer
  geom/      SE(3), intrinsics, plane homographies
  render/    MPI volume rendering + novel-view synthesis (the hot path)
  ops/       reusable TPU ops (resampling, warping, inpainting, morphology)
  models/    AdaMPI, EdgeConnect, RAFT (Flax) + torch checkpoint converters
  motion/    camera/object pose sampling, object motion module
  depth/     edge-aware disparity filtering
  parallel/  device-mesh configuration and sharded execution helpers
  pipeline/  end-to-end dataset generation (batched, resumable)
  train/     RAFT training/eval loops (optax, pjit data parallel)
  data/      dataset readers and augmentation for flow training
  viz/       flow colorization and debug montages
  utils/     profiling, tree and misc helpers
"""

__version__ = "0.1.0"
