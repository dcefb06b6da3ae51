"""Aggregate a JAX profiler trace by op CATEGORY (fusion kind / custom call /
copy / conv / etc.) instead of individual op names — the view that matters
when the graph is op-count-bound rather than kernel-bound.

Usage: python scripts/xplane_groups.py TRACEDIR [pattern...]

With extra args, also prints the per-op lines whose names contain ANY of the
given substrings (for drilling into one category).
"""

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections import defaultdict

from xplane_summary import summarize


def category(name: str) -> str:
    n = name
    if n.startswith("%"):
        n = n[1:]
    base = n.split(" ")[0].split(".")[0]
    lowered = name.lower()
    if "custom-call" in lowered or "CoPoNeRF" in name:
        m = re.search(r"custom_call_target=\"([^\"]+)\"", name)
        return f"pallas:{base}"
    if base in ("copy-start", "copy-done", "copy"):
        return "copy"
    if base.startswith("slice-start") or base.startswith("slice-done"):
        return "async-slice"
    if "dynamic-update-slice" in base or base.startswith("dynamic-slice"):
        return "dyn-slice"
    if "convolution" in lowered or base.startswith("conv") or "conv" in base:
        return "conv"
    if "fusion" in base:
        # keep the fusion flavor (loop/input/output prefix words)
        kind = base.rsplit("_fusion", 1)[0]
        kind = re.sub(r"\d+$", "", kind).strip("._")
        return f"fusion:{kind[:40]}" if kind else "fusion"
    if base.startswith(("all-reduce", "all-gather", "reduce-scatter", "collective")):
        return "collective"
    if base.startswith(("bitcast", "reshape", "transpose")):
        return base.split("_")[0]
    return base[:40]


def main():
    root = sys.argv[1]
    patterns = sys.argv[2:]
    path = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)[0]
    totals, counts = summarize(path)
    planes = sorted(set(p for p, _ in totals))
    for plane in planes:
        if "TPU" not in plane and "tpu" not in plane.lower():
            continue
        agg_t = defaultdict(float)
        agg_c = defaultdict(int)
        for (p, name), t in totals.items():
            if p != plane:
                continue
            c = category(name)
            agg_t[c] += t
            agg_c[c] += counts[(p, name)]
        tot = sum(agg_t.values())
        print(f"\n== {plane} (total {tot:.1f} ms) ==")
        for c, t in sorted(agg_t.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {t:9.2f} ms  x{agg_c[c]:<6d} {c}")
        if patterns:
            print(f"\n-- ops matching {patterns} --")
            items = [
                (name, t, counts[(plane, name)])
                for (p, name), t in totals.items()
                if p == plane and any(pat in name for pat in patterns)
            ]
            items.sort(key=lambda x: -x[1])
            sub = sum(t for _, t, _ in items)
            print(f"  (subtotal {sub:.1f} ms over {len(items)} op names)")
            for name, t, c in items[:60]:
                print(f"  {t:9.2f} ms  x{c:<5d} {name[:140]}")


if __name__ == "__main__":
    main()
