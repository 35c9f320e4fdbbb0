"""Regenerate the SURVEY.md §8 coverage table from the live registry.

Prints the markdown table (query | module | check) to stdout; the header
prose above it is maintained by hand. Run:  python scripts/gen_coverage.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terasort_spark.registry import oracle_sql, queries  # noqa: E402

qs, os_ = queries(), oracle_sql()
print(f"{len(qs)} queries, {len(os_)} oracles")
print()
print("| query | module | check |")
print("|---|---|---|")
for name in sorted(qs):
    mod = qs[name].__module__.removeprefix("terasort_spark.")
    check = "oracle" if name in os_ else "rows-only"
    print(f"| `{name}` | `{mod}` | {check} |")
