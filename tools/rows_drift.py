#!/usr/bin/env python3
"""Compare per-query output ROW COUNTS between two BENCHFULL artifacts.

The bench records each query's output rows (Observation-carried, same
execution as the timing). Wall time and the sf0.01 oracle gate can both
miss a silent result-size drift at sf0.1 (e.g. a threshold change that
only manifests at scale); diffing the rows maps across rounds catches
it. Usage:

    python3 tools/rows_drift.py BENCHFULL_r13.json BENCHFULL_r14.json [--allow q63,q64]

Exit 1 when any query's rows changed and is not in --allow (expected,
explained drifts are passed via --allow and should be justified in the
round's SURVEY/commit notes). Queries present in only one artifact are
reported but never fail the check (coverage growth is the normal case).
"""
import json
import sys


def main() -> int:
    # both --allow=q63,q64 and --allow q63,q64 (the docstring's form)
    # must parse; the old prefix-filter dropped only the flag token, so
    # the space form left its VALUE in args and exited 2 on "usage"
    argv = sys.argv[1:]
    args, allow, i = [], set(), 0
    while i < len(argv):
        a = argv[i]
        if a == "--allow":
            if i + 1 >= len(argv):
                print("--allow requires a value (comma-separated query keys)")
                return 2
            allow |= {q.strip() for q in argv[i + 1].split(",") if q.strip()}
            i += 2
        elif a.startswith("--allow="):
            allow |= {q.strip() for q in a.split("=", 1)[1].split(",") if q.strip()}
            i += 1
        else:
            args.append(a)
            i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    prev, cur = (json.load(open(p)) for p in args)
    pr, cr = prev.get("rows", {}), cur.get("rows", {})
    if not pr or not cr:
        print("one of the artifacts has no 'rows' map — nothing to compare")
        return 2
    drifted = []
    for q in sorted(set(pr) & set(cr)):
        if pr[q] != cr[q]:
            drifted.append((q, pr[q], cr[q]))
    only_prev = sorted(set(pr) - set(cr))
    only_cur = sorted(set(cr) - set(pr))
    for q, a, b in drifted:
        tag = "ALLOWED" if q in allow else "DRIFT"
        print(f"{tag:8s} {q:28s} {a} -> {b}")
    for q in only_prev:
        print(f"{'GONE':8s} {q:28s} {pr[q]} -> (absent)")
    for q in only_cur:
        print(f"{'NEW':8s} {q:28s} (absent) -> {cr[q]}")
    bad = [q for q, _, _ in drifted if q not in allow]
    if bad:
        print(f"\nUNEXPLAINED rows drift in {len(bad)} queries: {', '.join(bad)}")
        return 1
    print(f"\nrows stable: {len(set(pr) & set(cr)) - len(drifted)} unchanged, "
          f"{len(drifted)} allowed, {len(only_cur)} new")
    return 0


if __name__ == "__main__":
    sys.exit(main())
