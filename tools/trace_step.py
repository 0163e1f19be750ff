#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship train step and print the
top HLO ops by self time (xprof hlo_stats), attributing step time at op
granularity — the ground truth the ablation benches approximate.

Usage: python tools/trace_step.py [--scales N] [--outdir DIR]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# Number of steps captured inside the profiler trace; also the divisor that
# turns the trace's total self-time into ms/step.
N_TRACE_STEPS = 3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="/tmp/jax_trace")
    p.add_argument("--scales", type=int, default=0)
    p.add_argument("--batch", type=int, default=0)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--family", default="",
                   help="bench_models CASES family (prefix); default flagship")
    p.add_argument("--no-adaptive", action="store_true",
                   help="skip the adaptive-window narrow variant (halves "
                        "compile time; the warp buckets are identical to the "
                        "wide dispatch path)")
    args = p.parse_args()

    import jax

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache
    enable_compilation_cache()
    from simpledepthestimation_tpu.models import build_model
    from simpledepthestimation_tpu.parallel import (
        build_mesh, create_train_state, make_train_step, data_sharding,
    )
    from simpledepthestimation_tpu.solver import build_optimizer

    if args.family:
        from tools.bench_models import CASES, make_case

        case = next(c for c in CASES
                    if c[0].lower().startswith(args.family.lower()))
        name, meta, dn, pose, B, H, W, case_opts = case
        if args.batch:
            B = args.batch
        cfg, batch = make_case(meta, dn, pose, B, H, W, case_opts)
        print(f"tracing {name} B={B} {H}x{W}")
    else:
        from __graft_entry__ import _tiny_cfg, _train_batch

        cfg = _tiny_cfg("bfloat16")
        if args.scales:
            cfg.LOSS.NUM_SCALES = args.scales
        B, H, W = args.batch or 16, 192, 640
        batch = _train_batch(B, H, W)
    batch = {k: v for k, v in batch.items() if hasattr(v, "shape")}

    mesh = build_mesh(("data",), (len(jax.devices()),))
    model = build_model(cfg)
    opt, _ = build_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, opt, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, mesh, donate=True,
                           remat=bool(cfg.TPU.get("REMAT", False)),
                           adaptive_ywin=0 if args.no_adaptive else -1)
    from simpledepthestimation_tpu.parallel.mesh import replicated

    dsh = data_sharding(mesh)
    rep = replicated(mesh)
    dev = {
        k: jax.device_put(v, dsh if np.ndim(v) >= 1 else rep)
        for k, v in batch.items()
    }
    key = jax.random.PRNGKey(1)

    for i in range(3):  # warmup/compile
        state, m = step(state, dev, jax.random.fold_in(key, i))
    jax.block_until_ready(m["total_loss"])

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for i in range(N_TRACE_STEPS):
            state, m = step(state, dev, jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(m["total_loss"])

    planes = sorted(glob.glob(
        os.path.join(args.outdir, "**", "*.xplane.pb"), recursive=True))
    if not planes:
        print("NO XPLANE CAPTURED", args.outdir)
        return
    path = planes[-1]
    print("xplane:", path)

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([path], "hlo_stats^", {})
    import gzip, io, csv, json

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    try:
        obj = json.loads(data, strict=False)
    except Exception:
        obj = None
    if obj is not None:
        # compact per-op table: self time (ms, per traced step), category,
        # op name, first repo source line. Schema variations fall back to
        # printing the raw payload (still usable by hand).
        import re

        try:
            cols = [c["id"] for c in obj["cols"]]
            idx = {c: i for i, c in enumerate(cols)}
            out = []
            for r in obj["rows"]:
                v = [c.get("v") for c in r["c"]]
                t_ms = (float(v[idx["total_self_time"]] or 0) / 1e3
                        / N_TRACE_STEPS)
                src = v[idx["source_info"]] or ""
                m = re.search(
                    r"simpledepthestimation_tpu/([\w/]+\.py:\d+)", src)
                out.append((t_ms, v[idx["category"]] or "",
                            (v[idx["hlo_op_name"]] or "")[:60],
                            m.group(1) if m else ""))
        except (KeyError, TypeError, ValueError) as e:
            print(f"hlo_stats schema mismatch ({e!r}); raw payload:")
            print(data[:20000])
            return
        out.sort(reverse=True)
        print(f"{'ms/step':>9}  {'category':18} {'hlo op':60} source")
        for t_ms, cat, name, src in out[: args.top]:
            print(f"{t_ms:9.2f}  {cat:18} {name:60} {src}")
        total = sum(t for t, *_ in out)
        print(f"{total:9.2f}  TOTAL device self-time per step")
        return
    rows = list(csv.reader(io.StringIO(data)))
    hdr = rows[0]
    print(",".join(hdr))
    try:
        t_idx = hdr.index("total_time")
    except ValueError:
        t_idx = None
    body = rows[1:]
    if t_idx is not None:
        body.sort(key=lambda r: -float(r[t_idx] or 0))
    for r in body[: args.top]:
        print(",".join(r))


if __name__ == "__main__":
    main()
