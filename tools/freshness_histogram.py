"""Merge every CORRECTNESS_r*.json and print each query's NEWEST official
driver row — the evidence behind any "nothing older than rN" freshness
claim (VERDICT r11 "what's wrong" #2: r11 asserted the ratchet had
finished when 11 rows were still r7; this derives the histogram instead
of trusting prose).

Output: one line per round with the count of queries whose newest row is
that round, then the named queries for every round older than the
newest-minus-3 (the tail worth acting on), then any registered query
with NO official row at all.

Run: python tools/freshness_histogram.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter, defaultdict

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    newest: dict[str, int] = {}
    oracled_row: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json", path).group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, rep in rows.items():
            if rnd >= newest.get(name, -1):
                newest[name] = rnd
                # a row with hash_match=None/absent is the weaker
                # rows-only check — record which kind the newest row is
                oracled_row[name] = bool(rep.get("hash_match"))

    from sql_redshift_etl_spark.plans.registry import all_queries

    qs = all_queries()
    hist = Counter(newest[n] for n in qs if n in newest)
    print("newest-official-row histogram (registered queries only):")
    for rnd in sorted(hist, reverse=True):
        print(f"  r{rnd}: {hist[rnd]}")
    cutoff = max(hist) - 3 if hist else 0
    by_round: dict[int, list[str]] = defaultdict(list)
    for n in qs:
        if n in newest and newest[n] <= cutoff:
            by_round[newest[n]].append(n)
    for rnd in sorted(by_round):
        for n in sorted(by_round[rnd]):
            kind = "hash" if oracled_row[n] else "rows-only"
            has_oracle = qs[n].oracle is not None
            print(f"  tail r{rnd}: {n} ({kind} row; oracle={'yes' if has_oracle else 'no'})")
    never = sorted(n for n in qs if n not in newest)
    if never:
        print(f"  NO official row yet: {never}")
    oldest_oracled = min(
        (newest[n] for n in qs if n in newest and qs[n].oracle is not None),
        default=None,
    )
    print(f"oldest newest-row among SQL-oracled queries: r{oldest_oracled}")


if __name__ == "__main__":
    main()
