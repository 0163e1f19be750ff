#!/usr/bin/env python
"""Parse an xprof hlo_stats table from a captured .xplane.pb and print the
top HLO ops compactly: total time, category, bound-by, and source line.

Usage: python tools/parse_hlo_stats.py [xplane_glob] [top_n]
"""

import glob
import json
import re
import sys


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace/**/*.xplane.pb"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    planes = sorted(glob.glob(pat, recursive=True))
    if not planes:
        print("no xplane under", pat)
        return
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([planes[-1]], "hlo_stats^", {})
    if isinstance(data, bytes):
        import gzip

        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    cols = [c["id"] for c in obj["cols"]]
    idx = {c: i for i, c in enumerate(cols)}
    rows = []
    for r in obj["rows"]:
        v = [c.get("v") for c in r["c"]]

        def g(name, default=None):
            i = idx.get(name)
            return v[i] if i is not None else default

        src = g("source_info") or ""
        m = re.search(r"title='([^']*)'", src)
        frames = (m.group(1).split("\n") if m else [src])
        frames = [f.split("/")[-1] for f in frames if f]
        rows.append(
            dict(
                t=float(g("total_time") or g("avg_time") or 0),
                occ=g("occurrences"),
                cat=g("hlo_category") or g("category"),
                expr=(g("program_id") or ""),
                name=(g("hlo_op_name") or g("hlo_op_expression") or "")[:60],
                src="  <-  ".join(frames[:3]),
                bound=g("bound_by"),
            )
        )
    rows.sort(key=lambda r: -r["t"])
    tot = sum(r["t"] for r in rows)
    print(f"total device time in table: {tot/1e3:.2f} ms  ({len(rows)} ops)")
    acc = 0.0
    for i, r in enumerate(rows[:top]):
        acc += r["t"]
        print(
            f"{i+1:3d} {r['t']/1e3:9.3f}ms {100*r['t']/tot:5.1f}% cum={100*acc/tot:5.1f}% "
            f"x{r['occ']} {str(r['cat']):<18.18s} {str(r['bound']):<8.8s} "
            f"{r['name']:<40.40s} {r['src']}"
        )


if __name__ == "__main__":
    main()
