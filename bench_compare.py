"""Round-over-round bench diff: flag per-query regressions early.

Usage::

    python bench_compare.py                      # two newest BENCH_r*.json
    python bench_compare.py OLD.json NEW.json    # explicit files
    python bench.py | python bench_compare.py BENCH_r02.json -

Prints a per-query delta table and exits 1 if any query regressed more
than ``THRESHOLD``× (default 1.5, override via env BENCH_THRESHOLD), so
the check can gate commits. Queries present on only one side are listed
but never flagged (coverage changes are not regressions).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

THRESHOLD = float(os.environ.get("BENCH_THRESHOLD", "1.5"))


def _load(path: str) -> dict:
    text = sys.stdin.read() if path == "-" else open(path).read()
    # Accept either bench.py's bare line or the driver's BENCH_r{N}.json
    # wrapper, which nests the parsed line under "parsed".
    try:
        obj = json.loads(text)
        if isinstance(obj, dict):
            if "queries" in obj:
                return obj
            if isinstance(obj.get("parsed"), dict) and "queries" in obj["parsed"]:
                return obj["parsed"]
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in obj:
                return obj
    raise SystemExit(f"bench_compare: no bench JSON line in {path}")


def main(argv: list[str]) -> int:
    if len(argv) == 2:
        old_path, new_path = argv
    elif not argv:
        rounds = sorted(
            glob.glob("BENCH_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
        )
        if len(rounds) < 2:
            raise SystemExit(
                "bench_compare: need two BENCH_r*.json rounds (or pass "
                "two files; '-' reads the new run from stdin)"
            )
        old_path, new_path = rounds[-2], rounds[-1]
    else:
        raise SystemExit(__doc__)

    old, new = _load(old_path), _load(new_path)
    old_q = {k: v for k, v in old["queries"].items() if v >= 0}
    new_q = {k: v for k, v in new["queries"].items() if v >= 0}

    print(f"# bench delta: {old_path} -> {new_path} (flag > {THRESHOLD}x)")
    # Host-load context travels in the record since round 7 (absent in
    # older rounds). A noisy side makes per-query flags advisory: the
    # ratio measures tenancy, not code.
    noisy_side = False
    for tag, rec in (("old", old), ("new", new)):
        if "load" in rec or "noisy" in rec:
            print(f"# {tag}: pre-JVM load={rec.get('load')} "
                  f"noisy={rec.get('noisy')}")
            noisy_side = noisy_side or bool(rec.get("noisy"))
        else:
            print(f"# {tag}: no host-load context (pre-round-7 record)")
    print(f"{'query':32} {'old s':>8} {'new s':>8} {'ratio':>7}")
    flagged = []
    for name in sorted(set(old_q) | set(new_q)):
        o, n = old_q.get(name), new_q.get(name)
        if o is None or n is None:
            side = "new-only" if o is None else "old-only"
            print(f"{name:32} {o or '':>8} {n or '':>8} {side:>9}")
            continue
        ratio = n / o if o > 0 else float("inf")
        mark = ""
        if ratio > THRESHOLD:
            mark = "  << REGRESSION"
            flagged.append((name, o, n, ratio))
        print(f"{name:32} {o:8.3f} {n:8.3f} {ratio:6.2f}x{mark}")
    ot, nt = old.get("value"), new.get("value")
    if ot and nt:
        print(f"{'TOTAL':32} {ot:8.3f} {nt:8.3f} {nt / ot:6.2f}x")
    if flagged:
        if noisy_side:
            print(
                f"\n{len(flagged)} flag(s) over {THRESHOLD}x, but a side "
                "ran under external load (noisy=true) — advisory only",
                file=sys.stderr,
            )
            return 0
        print(f"\n{len(flagged)} regression(s) over {THRESHOLD}x", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
