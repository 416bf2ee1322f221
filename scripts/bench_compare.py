"""Round-over-round bench comparison from FULL artifacts (the r9
comparability rule, VERDICT r8 item 2): min-vs-min and median-vs-median
over the common query set, each ratio naming its field. Never parse the
driver's truncated stdout tail for this — use BENCH_SELF_r{N}.json.

Usage: python scripts/bench_compare.py OLD.json NEW.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old, new = (json.load(open(p)) for p in sys.argv[1:3])
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    so = sum(qo[q] for q in common)
    sn = sum(qn[q] for q in common)
    print(
        f"min-sum over {len(common)} common: {sn:.1f}s vs {so:.1f}s "
        f"= {sn / so:.2f}x (new/old, MIN basis)"
    )
    mo = old.get("queries_median") or {}
    mn = new.get("queries_median") or {}
    cm = sorted(set(mo) & set(mn))
    if cm:
        r = sum(mn[q] for q in cm) / sum(mo[q] for q in cm)
        print(
            f"median-sum over {len(cm)} common: {r:.2f}x (MEDIAN basis)"
        )
    ranked = sorted(((qn[q] / qo[q], q) for q in common), reverse=True)
    for r, q in ranked[:8]:
        print(f"  worst {q}: {r:.2f}x ({qo[q]:.2f} -> {qn[q]:.2f}s, min)")
    for r, q in ranked[-5:]:
        print(f"  best  {q}: {r:.2f}x ({qo[q]:.2f} -> {qn[q]:.2f}s, min)")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print(
            "  new entries: "
            + ", ".join(f"{q}={qn[q]:.2f}s(min)" for q in only_new)
        )


if __name__ == "__main__":
    main()
