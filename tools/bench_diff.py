"""Print the per-query delta between the last two bench.py runs
recorded in BENCH/history.jsonl.  Usage: python tools/bench_diff.py
[n_back] — compares run[-1] against run[-1-n_back] (default 1)."""

from __future__ import annotations

import json
import os
import sys

HIST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH", "history.jsonl")


def main() -> int:
    back = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    with open(HIST) as f:
        runs = [json.loads(l) for l in f if l.strip()]
    if len(runs) < back + 1:
        print(f"only {len(runs)} runs recorded; need {back + 1}")
        return 1
    new, old = runs[-1], runs[-1 - back]
    print(f"old: {old.get('ts', '?')} @ {old.get('git', '?')}  "
          f"{old['value']} docs/s")
    print(f"new: {new.get('ts', '?')} @ {new.get('git', '?')}  "
          f"{new['value']} docs/s  "
          f"({(new['value'] / old['value'] - 1) * 100:+.1f}%)")
    print(f"{'query':34s} {'old s':>8s} {'new s':>8s} {'delta':>8s}")
    for k in sorted(set(old["queries"]) | set(new["queries"])):
        o, n = old["queries"].get(k), new["queries"].get(k)
        if o is None or n is None:
            print(f"{k:34s} {o or '-':>8} {n or '-':>8} {'new' if o is None else 'gone':>8}")
        else:
            print(f"{k:34s} {o:8.2f} {n:8.2f} {(n / o - 1) * 100:+7.1f}%")
    eo, en = old["scaling"]["efficiency"], new["scaling"]["efficiency"]
    print(f"scaling efficiency: {eo} -> {en}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
