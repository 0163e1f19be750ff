"""Dataset base class, NHWC batch collation, and loader builders.

Parity with reference detectron2/data/build.py:17-150, re-designed for the
SPMD runtime: the loader produces per-host numpy batches of size
IMS_PER_BATCH // num_hosts (the reference divides per GPU; our 'device' unit
is the host, whose chips receive shards at device_put time). Collation
produces fixed-shape NHWC arrays — ctx images stack to a dense [B,N,H,W,3]
(vs the reference's lists) and the flip flag is a per-sample [B] bool vector
(an improvement over the reference collator's take-sample-0 batch flag,
kitti_v2.py:219).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.registry import Registry
from ..utils import comm
from .preprocess import build_preprocess
from .samplers import TrainingSampler, EpochSampler, InferenceSampler
from .loader import PrefetchLoader

logger = logging.getLogger(__name__)

DATASET_REGISTRY = Registry("DATASET")


class DatasetBase:
    """Map-style dataset: index → preprocessed sample dict.

    Holds the preprocess pipeline built from the yaml PREPROCESS list;
    ``get_prediction`` runs the pipeline *backward* to restore predictions to
    the original image frame (reference data/build.py:35-55).
    """

    def __init__(self, dataset_cfg, cfg):
        self.preprocesses = [
            build_preprocess(p) for p in dataset_cfg.get("PREPROCESS", [])
        ]
        # PARITY.STRICT: reference collator takes `flip` from sample 0 for
        # the whole batch (reference data/datasets/kitti_v2.py:219); our
        # default is per-sample flip (a divergence that improves batch
        # diversity but must be switchable to bisect metric gaps)
        self.strict_parity = bool(cfg.get("PARITY", {}).get("STRICT", False))

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int):
        raise NotImplementedError

    def get_sample(self, idx: int, rng: Optional[np.random.Generator] = None):
        """Like __getitem__ but with an explicit RNG for the random ops."""
        raise NotImplementedError

    def preprocess(self, data_dict, rng: Optional[np.random.Generator] = None):
        for op in self.preprocesses:
            data_dict = op.forward(data_dict, rng)
        return data_dict

    def get_prediction(self, data_dict):
        for op in self.preprocesses[::-1]:
            data_dict = op.backward(data_dict)
        return data_dict

    # -- collation ---------------------------------------------------------
    def batch_collator(self, batch_list: List[Dict[str, Any]]) -> Dict[str, Any]:
        keys = batch_list[0].keys()
        out: Dict[str, Any] = {}
        for key in keys:
            vals = [d[key] for d in batch_list]
            if key in ("img", "img_orig"):
                out[key] = np.stack(vals).astype(np.float32)
            elif key in ("ctx_img", "ctx_img_orig"):
                out[key] = np.stack([np.stack(v) for v in vals]).astype(np.float32)
            elif key == "depth":
                out[key] = np.stack(vals).astype(np.float32)[..., None]
            elif key == "ctx_depth":
                out[key] = np.stack([np.stack(v) for v in vals]).astype(np.float32)[..., None]
            elif key in ("mask",):
                out[key] = np.stack(vals).astype(np.float32)[..., None]
            elif key == "ctx_mask":
                out[key] = np.stack([np.stack(v) for v in vals]).astype(np.float32)[..., None]
            elif key in ("intrinsics", "pose_gt"):
                out[key] = np.stack(vals).astype(np.float32)
            elif key == "flip":
                if self.strict_parity:
                    # batch-level flip from sample 0 (reference kitti_v2.py:219)
                    out[key] = np.full((len(vals),), bool(vals[0]), dtype=bool)
                else:
                    out[key] = np.asarray(vals, dtype=bool)
            else:
                out[key] = vals  # metadata & friends stay host-side lists
        return out


def build_train_loader(cfg, seed: int = 0) -> PrefetchLoader:
    """Epoch-based per-host train loader (reference build.py:96-119)."""
    dataset = DATASET_REGISTRY.get(cfg.DATASETS.TRAIN.NAME)(cfg.DATASETS.TRAIN, cfg)
    assert isinstance(dataset, DatasetBase)

    total_batch = int(cfg.SOLVER.IMS_PER_BATCH)
    world = comm.get_world_size()
    assert total_batch % world == 0, (
        f"IMS_PER_BATCH={total_batch} must be divisible by world size {world}"
    )
    local_batch = total_batch // world

    sampler_name = cfg.DATALOADER.SAMPLER_TRAIN
    logger.info(f"Using training sampler {sampler_name}")
    if sampler_name == "DDPSampler":
        sampler = EpochSampler(
            len(dataset), shuffle=True, seed=seed,
            rank=comm.get_rank(), world_size=world,
        )
    elif sampler_name == "TrainingSampler":
        sampler = TrainingSampler(
            len(dataset), shuffle=True, seed=seed,
            rank=comm.get_rank(), world_size=world,
        )
    else:
        raise ValueError(f"Unknown training sampler: {sampler_name}")

    return PrefetchLoader(
        dataset,
        sampler,
        batch_size=local_batch,
        drop_last=True,
        num_workers=int(cfg.DATALOADER.NUM_WORKERS),
        prefetch=int(cfg.DATALOADER.get("PREFETCH", 2)),
        seed=seed,
    )


def build_test_loader(cfg) -> Optional[PrefetchLoader]:
    """Inference loader: batch size 1, exact-coverage sharding
    (reference build.py:122-146)."""
    if "TEST" not in cfg.DATASETS or not cfg.DATASETS.TEST.get("NAME"):
        return None
    dataset = DATASET_REGISTRY.get(cfg.DATASETS.TEST.NAME)(cfg.DATASETS.TEST, cfg)
    assert isinstance(dataset, DatasetBase)
    sampler = InferenceSampler(
        len(dataset), rank=comm.get_rank(), world_size=comm.get_world_size()
    )
    return PrefetchLoader(
        dataset,
        sampler,
        batch_size=int(cfg.TEST.get("IMS_PER_BATCH", 1)),
        drop_last=False,
        num_workers=int(cfg.DATALOADER.NUM_WORKERS),
        prefetch=int(cfg.DATALOADER.get("PREFETCH", 2)),
        seed=0,
    )
