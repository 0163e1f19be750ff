"""CLI parsing, run setup, and the ``simple_main`` glue.

Parity with reference detectron2/engine/defaults.py:50-156 and
utils/setup.py:13-49: the same ``--cfg/--resume/--eval`` + trailing
``KEY VALUE`` opts interface; multi-host flags map to
``jax.distributed.initialize`` (coordinator address / process count / id)
instead of torch's spawn+NCCL rendezvous — one process per *host*, chips
auto-discovered. RUN_NAME derives from the config path
({project}_{cfgname}), OUTPUT_DIR nests under it, and the merged config is
archived to the output dir.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Callable, Optional

from ..config import get_cfg, CfgNode
from ..utils import comm
from ..utils.env import seed_all_rng, collect_env_info
from ..utils.logger import setup_logger
from ..utils.events import JSONWriter, TensorboardWriter, CommonMetricPrinter

logger = logging.getLogger(__name__)


def default_argument_parser(epilog: Optional[str] = None) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        epilog=epilog
        or """Examples:  python projects/MonoDepth2/train.py --cfg projects/MonoDepth2/configs/resnet18.yaml""",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--cfg", default="", metavar="FILE", help="path to config file")
    parser.add_argument(
        "--resume",
        action="store_true",
        help="resume from the checkpoint directory (if any)",
    )
    parser.add_argument("--eval", action="store_true", help="evaluate only")
    # multi-host SPMD (replaces --num-gpus/--num-machines/--machine-rank/--dist-url)
    parser.add_argument(
        "--coordinator", default="", help="jax.distributed coordinator address host:port"
    )
    parser.add_argument("--num-processes", type=int, default=1, help="number of host processes")
    parser.add_argument("--process-id", type=int, default=0, help="this host's process index")
    parser.add_argument(
        "opts",
        help="Modify config options at the end of the command: KEY VALUE pairs",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser


def honor_jax_platforms_env() -> None:
    """Apply ``JAX_PLATFORMS`` explicitly: the axon TPU plugin ignores the
    env var, so ``JAX_PLATFORMS=cpu python projects/.../train.py`` would
    still grab (or hang on) the tunneled chip without this. Must run before
    any other jax use."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def maybe_init_distributed(args) -> None:
    """Initialize JAX multi-host when coordinator flags are given."""
    honor_jax_platforms_env()
    if args.coordinator and args.num_processes > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )


def assemble_cfg(args) -> CfgNode:
    """Merge defaults ← cfg file ← CLI opts; derive RUN_NAME / OUTPUT_DIR
    (reference utils/setup.py:17-27)."""
    cfg = get_cfg()
    if args.cfg:
        cfg.merge_from_file(args.cfg)
    if args.opts:
        # argparse REMAINDER keeps a literal '--' separator; it's the one
        # legitimate leading "flag-looking" token — strip it
        opts = list(args.opts)
        if opts and opts[0] == "--":
            opts = opts[1:]
        args.opts = opts
        flags = [o for o in args.opts if isinstance(o, str) and o.startswith("--")]
        if flags:
            # argparse REMAINDER swallows anything after the first KEY VALUE
            # pair, including flags — a confusing footgun inherited from the
            # reference parser (defaults.py:50-107); fail with a clear message
            raise SystemExit(
                f"Flags {flags} appeared after KEY VALUE overrides; place "
                "--resume/--eval/--num-processes etc. BEFORE the trailing "
                "config overrides."
            )
        cfg.merge_from_list(list(args.opts))

    if not cfg.RUN_NAME:
        if args.cfg:
            cfg_path = os.path.abspath(args.cfg)
            project = os.path.basename(os.path.dirname(os.path.dirname(cfg_path)))
            cfg_name = os.path.splitext(os.path.basename(cfg_path))[0]
            cfg.RUN_NAME = f"{project}_{cfg_name}"
        else:
            cfg.RUN_NAME = "run"
    cfg.OUTPUT_DIR = os.path.join(cfg.OUTPUT_DIR, cfg.RUN_NAME)
    cfg.freeze()
    return cfg


def enable_compilation_cache(cache_dir: str = "") -> None:
    """Persistent XLA compilation cache: re-launching a run (resume, eval,
    bench) skips the multi-minute first compile. The reference's analog is
    CUDNN_BENCHMARK autotune persistence; here it is a first-class setup step.
    """
    import jax

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "sde_tpu_jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def default_setup(cfg: CfgNode, args=None) -> None:
    """mkdir output (process 0), loggers, env/config dump, seeding,
    persistent compile cache (reference defaults.py:110-156)."""
    enable_compilation_cache()
    output_dir = cfg.OUTPUT_DIR
    if comm.is_main_process() and output_dir:
        os.makedirs(output_dir, exist_ok=True)

    rank = comm.get_rank()
    setup_logger(output_dir, distributed_rank=rank)

    logger.info(f"Process rank {rank} / world size {comm.get_world_size()}")
    logger.info("Environment info:\n" + collect_env_info())
    if args is not None:
        logger.info(f"Command line arguments: {args}")

    if comm.is_main_process() and output_dir:
        path = os.path.join(output_dir, "config.yaml")
        with open(path, "w") as f:
            f.write(cfg.dump())
        logger.info(f"Full config saved to {path}")

    seed = cfg.SEED
    seed_all_rng(None if seed < 0 else seed + rank)


def default_writers(output_dir: str, max_iter: Optional[int] = None):
    """JSON + tensorboard + console writers (reference defaults.py:158-176)."""
    return [
        CommonMetricPrinter(max_iter),
        JSONWriter(os.path.join(output_dir, "metrics.json")),
        TensorboardWriter(output_dir),
    ]


def simple_main(args, train_fn: Callable, test_fn: Optional[Callable] = None):
    """The glue all project entry points use (reference utils/setup.py:13-49):
    cfg assembly → setup → eval short-circuit or train."""
    maybe_init_distributed(args)
    cfg = assemble_cfg(args)
    default_setup(cfg, args)

    if args.eval and test_fn is not None:
        return test_fn(cfg, resume=args.resume)
    return train_fn(cfg, resume=args.resume)
