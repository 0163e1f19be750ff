"""Canonical default config schema.

Mirrors the key schema of the reference config tree
(reference detectron2/config/defaults.py:18-167) so user yaml configs carry
over unchanged, with TPU-specific additions under ``TPU`` (mesh/precision)
replacing the CUDA-specific keys (``MODEL.DEVICE``/``CUDNN_BENCHMARK``).
The schema is open: project yamls may add keys (e.g. ``LOSS.*``) freely.
"""

from .config import CfgNode as CN

_C = CN()
_C.VERSION = 2

_C.MODEL = CN()
_C.MODEL.META_ARCHITECTURE = ""
_C.MODEL.WEIGHTS = ""
_C.MODEL.PIXEL_MEAN = [0.485, 0.456, 0.406]
_C.MODEL.PIXEL_STD = [0.229, 0.224, 0.225]
_C.MODEL.MAX_DEPTH = 80

_C.MODEL.DEPTH_NET = CN()
_C.MODEL.DEPTH_NET.NAME = ""

_C.MODEL.POSE_NET = CN()
_C.MODEL.POSE_NET.NAME = ""

_C.INPUT = CN()

_C.DATASETS = CN()
_C.DATASETS.TRAIN = CN()
_C.DATASETS.TRAIN.NAME = ""
_C.DATASETS.TRAIN.SPLIT = ""
_C.DATASETS.TRAIN.DATA_ROOT = ""
_C.DATASETS.TRAIN.IMG_WIDTH = 768
_C.DATASETS.TRAIN.IMG_HEIGHT = 384
_C.DATASETS.TRAIN.PREPROCESS = []

_C.DATASETS.TEST = CN()
_C.DATASETS.TEST.NAME = ""
_C.DATASETS.TEST.SPLIT = ""
_C.DATASETS.TEST.DATA_ROOT = ""
_C.DATASETS.TEST.IMG_WIDTH = 768
_C.DATASETS.TEST.IMG_HEIGHT = 384
_C.DATASETS.TEST.PREPROCESS = []

_C.DATALOADER = CN()
_C.DATALOADER.NUM_WORKERS = 6
_C.DATALOADER.SAMPLER_TRAIN = "DDPSampler"
_C.DATALOADER.PREFETCH = 2

_C.LOSS = CN()

_C.SOLVER = CN()
_C.SOLVER.MAX_EPOCHS = 10
_C.SOLVER.DEPTH_LR = 0.001
_C.SOLVER.CHECKPOINT_PERIOD = 1
_C.SOLVER.IMS_PER_BATCH = 16
_C.SOLVER.REFERENCE_WORLD_SIZE = 0
_C.SOLVER.GRAD_CLIP = 0.0

_C.TEST = CN()
_C.TEST.EVAL_PERIOD = 1
# Eval batch size. 1 = the reference's timing protocol (data/build.py:130);
# raising it speeds periodic eval when test images share one shape.
_C.TEST.IMS_PER_BATCH = 1
# Overlap periodic eval with the next epoch's training: the epoch-end eval
# runs on a worker thread against a copied params/batch_stats snapshot, and
# its metrics are logged when it finishes (at the next epoch boundary or at
# end of training). Single-process only — under multi-host SPMD two threads
# issuing collectives can interleave differently across processes and
# deadlock, so world_size > 1 ignores this and evals synchronously.
_C.TEST.ASYNC = False
_C.TEST.GT_SCALE = False
_C.TEST.MIN_DEPTH = 0.001
_C.TEST.MAX_DEPTH = 80.0
# True-average BN statistics recompute before each eval (reference
# detectron2/engine/hooks.py:381-450); DefaultTrainer path only.
_C.TEST.PRECISE_BN = CN()
_C.TEST.PRECISE_BN.ENABLED = False
_C.TEST.PRECISE_BN.NUM_ITER = 200

_C.EVALUATORS = ("",)

# ---------------------------------------------------------------------------
# TPU runtime (replaces MODEL.DEVICE / CUDNN_BENCHMARK in the reference).
# ---------------------------------------------------------------------------
_C.TPU = CN()
# Axis names and sizes for the device mesh. 0 = use all available devices on
# the data axis. Parallelism is data-parallel by default (the reference's DDP
# analog); the mesh is extensible to model axes for larger nets.
_C.TPU.MESH_AXES = ("data",)
_C.TPU.MESH_SHAPE = (0,)
# Compute dtype for the network ("bfloat16" or "float32"). Params stay fp32.
_C.TPU.COMPUTE_DTYPE = "bfloat16"
# Donate the train state buffers to the step function (in-place updates).
_C.TPU.DONATE = True
# Use jax.checkpoint (remat) on encoder blocks to trade FLOPs for HBM.
_C.TPU.REMAT = False
# Warp backend for view-synthesis resampling: "auto" (banded MXU Pallas
# kernel on TPU, measured-fastest gather otherwise), "banded", "banded_f32"
# (exact 3-pass matmuls), or "gather". PARITY.STRICT forces "gather".
_C.TPU.WARP_IMPL = "auto"
# Banded-kernel row window (multiple of 8, >= 16): spread budget per 8-row
# output tile is ~window-9 rows; steps with tiles beyond it run the
# whole-plane-window variant (costlier matmul, never wrong). Larger = fewer
# wide-window steps, ~linearly costlier matmul. 128 measured fastest on v5e
# at the flagship shape — B=48 192×640 sweep: 64/96/112/128/144/160/192 →
# 128.6/129.0/129.0/149.3/144.9/141.3/131.8 img/s/chip (the 112→128 jump is
# violations going to ~zero right at the 128-lane-aligned window).
_C.TPU.WARP_WINDOW = 128
# v2 column-tiled banded kernel windows (round 3): per-8×128-tile x window
# (multiple of 256: two 128-aligned halves) and y window (multiple of 16).
# Starts are 128-aligned, so each half must span the tile's own 128-col
# block plus alignment waste: xw2=256 (XWIN 512) guarantees contiguous
# x-span coverage up to ~385 cols; 256 violates on ANY tile whose
# displacement straddles 0. Tiles beyond either spread budget fall back to
# the v1 row-banded kernel (WARP_WINDOW), then its whole-plane variant.
# 0 disables v2.
#
# YWIN is a measured tuning knob whose best value is COORDINATE-REGIME
# DEPENDENT (round 4): under bench_models' synthetic trajectory, 48 beat
# 96 by +8.5% (162.4 vs 149.7 — the dot M-dim halves); under bench.py's
# trajectory the SAME change lost 9% (137.0 vs 151.3, one-process A/B) —
# its evolving pose drives per-tile spreads past the narrower budget and
# the flagged tiles pay whole-plane-window patches. 96 never flags in
# either regime and is the safe default; drop to 48 for steady-state
# fine-tuning runs (0% flags at trained-regime coords, pure FLOP win).
_C.TPU.WARP_XWIN = 512
_C.TPU.WARP_YWIN = 96
# Adaptive narrow y-window (round 5; 0 disables): the train step compiles a
# second executable at this window and switches to it once the per-tile
# flag predicate (computed every step on the live warp coords, read 2 steps
# behind) reports 3 consecutive flag-free steps, retreating to WARP_YWIN on
# the first flagged one. Captures the regime-dependent +8.5% (48 vs 96 at
# the flagship shape, round-4 table) without the −9% cliff bench.py's
# random-init trajectory measured for a static 48: early training runs
# wide, the trained regime runs narrow.
_C.TPU.WARP_YWIN_NARROW = 48
# Backward-only y-window for the tiled warp's coordinate cotangents
# (0 = same as WARP_YWIN). The bwd re-flags tiles at this window (exact:
# violators take the whole-plane patch branch), so a narrower bwd window
# trades its dominant dot FLOPs against more patched tiles — a probe knob
# (docs/PERF.md round-5 warp-bwd-diet measurement).
_C.TPU.WARP_YWIN_BWD = 0
# v2 column-tiled kernel output tile height (multiple of 8). 16 halves the
# per-call grid and doubles the per-dot output width at identical FLOPs;
# taller tiles spend more y-spread budget (more per-tile fallbacks early).
_C.TPU.WARP_TILE_H = 8
# PackNet packed-3D-conv backend: "auto" (blocked on TPU, ndhwc elsewhere),
# "ndhwc" (literal 1-input-channel 3D conv), or "blocked" (depth band
# embedded in a dense 2D conv over channel blocks of CONV3D_BLOCK —
# MXU-sized contractions; see tools/microbench_conv3d.py). On TPU the ndhwc
# form is unusable at reference shape: its [B,C,H,W,d=8] intermediate
# layout-pads the trailing dim 8→128 (16×, ~15 GB HBM at B=8 192×640).
_C.TPU.CONV3D_IMPL = "auto"
_C.TPU.CONV3D_BLOCK = 30

# Strict reference-parity mode: restores reference behaviors behind our
# intentional divergences so a metric gap can be bisected — batch-level flip
# taken from sample 0 (reference data/datasets/kitti_v2.py:219) and a
# synchronous per-step NaN check (reference engine/train_loop.py:283-287)
# instead of the deferred watchdog.
_C.PARITY = CN()
_C.PARITY.STRICT = False

_C.OUTPUT_DIR = "./output"
_C.SEED = -1
_C.VIS_PERIOD = 0
_C.LOG_PERIOD = 20
_C.RUN_NAME = ""

_C.GLOBAL = CN()
_C.GLOBAL.HACK = 1.0
