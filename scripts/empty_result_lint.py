#!/usr/bin/env python3
"""Non-empty-result lint over canon-sweep JSONLs (r4 verdict item #3).

The `subq_scalar` incident: a Tier-A key can be hash-green while its
result set is EMPTY at every scale factor — both engines "agree on
nothing" and the driver's hash-match certifies no values at all. The
canon sweep now records `rows` per key; this lint reads one or more
sweep JSONLs (typically sf0.01 + sf0.1) and FAILS any key whose result
is empty in EVERY file it appears in, unless the key is whitelisted
with a written justification.

Usage:  python scripts/empty_result_lint.py sweep_sf001.jsonl sweep_sf01.jsonl
Exit code 0 iff no unexplained always-empty key. Keys whose rows field
is null (pre-lint sweep files, or spark_error rows) are skipped — the
lint only adjudicates keys with at least one recorded row count.
"""

from __future__ import annotations

import json
import sys

#: Keys allowed to be empty at every swept SF, each with the reason the
#: emptiness is the *point* of the key rather than vacuous evidence.
#: Keep this list short — an entry here means the driver's hash-match
#: verifies structure only, and the key's pytest must carry the values.
ALWAYS_EMPTY_OK: dict[str, str] = {
    # (none currently — subq_scalar was fixed to 1.5× mean instead of
    #  being whitelisted; prefer fixing the predicate over listing here)
}


def main(paths: list[str]) -> int:
    rows_by_key: dict[str, list[int]] = {}
    for path in paths:
        with open(path) as fh:
            for line in fh:
                rec = json.loads(line)
                if rec.get("rows") is not None:
                    rows_by_key.setdefault(rec["key"], []).append(rec["rows"])
    bad = sorted(
        k
        for k, counts in rows_by_key.items()
        if counts and all(n == 0 for n in counts) and k not in ALWAYS_EMPTY_OK
    )
    checked = sum(1 for c in rows_by_key.values() if c)
    for k in bad:
        print(f"EMPTY-AT-EVERY-SF: {k} (vacuous evidence — fix the "
              f"predicate or whitelist with justification)")
    print(f"empty_result_lint: {len(bad)} vacuous / {checked} keys checked "
          f"across {len(paths)} sweep file(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1:]))
