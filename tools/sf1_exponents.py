#!/usr/bin/env python3
"""Per-gate scaling exponents from a full-board sf1 bench run.

Reads two BENCH_DETAIL-shaped JSON files (sf0.1 and sf1; each holds
per-query min-of-3 timings for graft and baseline) and prints, per
gate: t(sf0.1), t(sf1), growth at 10x data, exponent log10(growth),
and the sf1 ratio vs the sf1 baseline. Flags exponent >= 0.9 (the
"would not survive a 100x scale-up" line) and sorts by exponent.

Usage: python3 tools/sf1_exponents.py BENCH_DETAIL_SF01.json \
           BENCH_SF1_DETAIL.json [--md]
"""
import json
import math
import sys


def main() -> None:
    lo_path, hi_path = sys.argv[1], sys.argv[2]
    md = "--md" in sys.argv
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    rows = []
    for name, t_lo in lo["queries"].items():
        t_hi = hi["queries"].get(name, -1.0)
        if t_lo <= 0 or t_hi <= 0:
            rows.append((name, t_lo, t_hi, None, None, None))
            continue
        growth = t_hi / t_lo
        expo = math.log10(growth) if growth > 0 else None
        b_hi = hi.get("baseline_queries", {}).get(name, -1.0)
        ratio = (t_hi / b_hi) if b_hi and b_hi > 0 else None
        rows.append((name, t_lo, t_hi, growth, expo, ratio))
    rows.sort(key=lambda r: (-(r[4] if r[4] is not None else 99),))
    flagged = [r for r in rows if r[4] is not None and r[4] >= 0.9]
    sep = "|" if md else "  "
    hdr = ["gate", "t(sf0.1)s", "t(sf1)s", "growth@10x", "exp log10",
           "sf1 ratio"]
    if md:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
    else:
        print(sep.join(h.ljust(28 if h == "gate" else 10) for h in hdr))
    for name, t_lo, t_hi, growth, expo, ratio in rows:
        cells = [name.ljust(0 if md else 28),
                 f"{t_lo:.3f}" if t_lo > 0 else "fail",
                 f"{t_hi:.3f}" if t_hi > 0 else "fail",
                 f"{growth:.2f}x" if growth else "-",
                 f"{expo:.2f}" if expo is not None else "-",
                 f"{ratio:.2f}" if ratio is not None else "-"]
        if md:
            print("| " + " | ".join(cells) + " |")
        else:
            print(sep.join(c.ljust(28 if i == 0 else 10)
                           for i, c in enumerate(cells)))
    print()
    print(f"gates: {len(rows)}; flagged (exponent >= 0.9): "
          f"{[r[0] for r in flagged] or 'none'}")
    tot_lo = sum(r[1] for r in rows if r[1] > 0)
    tot_hi = sum(r[2] for r in rows if r[2] > 0)
    print(f"total wall: {tot_lo:.1f}s (sf0.1) -> {tot_hi:.1f}s (sf1), "
          f"growth {tot_hi / tot_lo:.2f}x, exponent "
          f"{math.log10(tot_hi / tot_lo):.2f}")
    print(f"sf1 board ratio vs baseline: {hi.get('ratio'):.4f} "
          f"(failed: {hi.get('failed')})")


if __name__ == "__main__":
    main()
