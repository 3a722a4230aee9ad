#!/usr/bin/env python3
"""Assemble a BENCH_DETAIL-shaped JSON from `[bench] done <gate>
graft=X baseline=Y` progress lines across one or more bench logs
and/or existing BENCH_DETAIL files (later sources win per gate).

Usage: python3 tools/merge_bench_logs.py OUT.json SRC1 [SRC2 ...]
Each SRC is a .json (BENCH_DETAIL shape) or a log file with progress
lines. Baseline -1 entries are kept as -1 (graft-only runs).
"""
import json
import re
import sys

LINE = re.compile(r"\[bench\] done (\S+) graft=([-\d.]+) baseline=([-\d.]+)")


def main() -> None:
    out_path = sys.argv[1]
    queries, baselines = {}, {}
    for src in sys.argv[2:]:
        if src.endswith(".json"):
            d = json.load(open(src))
            queries.update(d.get("queries", {}))
            baselines.update(d.get("baseline_queries", {}))
            continue
        for line in open(src, errors="replace"):
            m = LINE.search(line)
            if m:
                queries[m.group(1)] = float(m.group(2))
                baselines[m.group(1)] = float(m.group(3))
    valid = [(g, b) for g, b in
             ((queries[n], baselines.get(n, -1.0)) for n in queries)
             if g >= 0 and b >= 0]
    total = sum(g for g, _ in valid)
    base_total = sum(b for _, b in valid)
    doc = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": dict(sorted(queries.items())),
        "baseline_total": base_total,
        "baseline_queries": dict(sorted(baselines.items())),
        "ratio": (total / base_total) if base_total else -1.0,
        "failed": sum(1 for n in queries if queries[n] < 0),
        "failed_queries": sorted(n for n in queries if queries[n] < 0),
        "graft_only_queries": sorted(
            n for n in queries
            if queries[n] >= 0 and baselines.get(n, -1.0) < 0),
        "sf": "/tmp/sf1",
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    print(f"{out_path}: {len(queries)} gates, "
          f"{len(doc['graft_only_queries'])} graft-only, "
          f"{doc['failed']} failed, ratio {doc['ratio']:.4f} "
          f"over {len(valid)} paired")


if __name__ == "__main__":
    main()
