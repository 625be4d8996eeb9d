#!/usr/bin/env python3
"""Per-round bench regression gate.

Compares two Bench summary JSON files (the `bench.json` a Bench run writes,
or a driver-side BENCH_r{N}.json — same shape: {"queries": {name: sec}, ...})
and reports every query slower than THRESHOLD x its prior time, plus new /
removed queries. Intentional regressions get a one-line annotation in
ANNOTATIONS below so a reviewer sees the reason next to the number instead
of discovering the slowdown later.

Usage:
    python3 tools/bench_diff.py <prev.json> <cur.json> [--threshold 1.5]

Exit code: 0 when every regression is annotated (or none), 1 when an
unannotated regression crosses the threshold (the gate), 2 on bad input.
"""
import json
import sys

THRESHOLD = 1.5

# Absolute-time floor: a 0.02 s -> 0.04 s jitter doubling is not a
# regression signal at bench scale; only flag when the slower side costs
# at least this many seconds.
MIN_SECONDS = 0.15

# Absolute-delta floor: sub-second queries routinely swing +-0.2 s run to
# run even with the bench's min-of-two-passes; a ratio crossing alone on a
# tiny delta is noise, not a plan change.
MIN_DELTA_SECONDS = 0.25

# query -> one-line reason, for regressions that are the accepted price of
# a correctness or capability change. Keep entries only while the previous
# round's numbers still reflect the pre-change implementation.
ANNOTATIONS = {
    # round 16 second batch (census-driven): the remaining global-window
    # census ops retired their empty-partition windows — ks/chi2/jsd/gini/
    # t-closeness/uniMax count-frame windows moved to PrefixScan
    # positions/cumulative counts + one-row-aggregate broadcast totals
    # (+1 census materialization +1-2 bounded jobs at sf0.1; -1 Exchange
    # to SinglePartition that goes corpus-sized on continuous columns /
    # domain-grain strata). The loader composites pay the uniMax census
    # checkpoint too. Plans census-pinned (ScaleLintCensusSpec), oracles
    # unchanged.
    "q_ks_profile": "multi-weight PrefixScan CDF + broadcast totals: +checkpoint, -single-task window",
    "q_chi2_homogeneity": "broadcast totals over checkpointed census: +1 bounded job, -whole-frame window",
    "q_jsd_profile": "broadcast totals over checkpointed census: +1 bounded job, -whole-frame window",
    "q_gini": "PrefixScan sorted-count positions: +checkpoint, -global ROW_NUMBER window",
    "q_t_closeness": "broadcast global total over checkpointed census: +1 bounded job, -whole-frame window",
    "q_mix_unimax": "uniMax census rides PrefixScan + broadcast globals: +checkpoint +2 bounded jobs, -2 whole-frame window passes",
    "q_unimax_alloc": "uniMax census rides PrefixScan + broadcast globals: +checkpoint +2 bounded jobs, -2 whole-frame window passes",
    "q_loader_prep": "composes mixUniMax: pays the uniMax census checkpoint (see q_mix_unimax)",
    "q_loader_stream": "composes mixUniMax: pays the uniMax census checkpoint (see q_mix_unimax)",
}


def load(path):
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, ValueError) as e:
        print(f"bench_diff: cannot read {path}: {e}", file=sys.stderr)
        sys.exit(2)
    qs = d.get("queries")
    if not isinstance(qs, dict) or not qs:
        # driver-side BENCH_r{N}.json wrapper: the summary line lives in
        # "tail" (possibly head-truncated mid-JSON) — recover the
        # "q_name":sec pairs by regex
        import re
        tail = d.get("tail", "")
        qs = {m.group(1): float(m.group(2))
              for m in re.finditer(r'"(q_\w+)":([0-9.]+)', tail)}
        m = re.search(r'"recall_at_10":({[^}]*})', tail)
        if m:
            try:
                d["recall_at_10"] = json.loads(m.group(1))
            except ValueError:
                pass
    if not qs:
        print(f"bench_diff: {path} has no 'queries' map", file=sys.stderr)
        sys.exit(2)
    return d, qs


def main():
    threshold = THRESHOLD
    args = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--threshold" or a.startswith("--threshold="):
            # exact-match the flag (prefix matching let --thresholds=2 /
            # --thresholdX silently parse as --threshold); accept
            # --threshold=1.5 and --threshold 1.5; a bare trailing
            # --threshold is a usage error, not a silent default
            if "=" in a:
                raw = a.split("=", 1)[1]
            elif i + 1 < len(argv):
                i += 1
                raw = argv[i]
            else:
                print("bench_diff: --threshold needs a value", file=sys.stderr)
                sys.exit(2)
            try:
                threshold = float(raw)
            except ValueError:
                print(f"bench_diff: --threshold needs a number, got {raw!r}",
                      file=sys.stderr)
                sys.exit(2)
        elif a.startswith("--"):
            print(f"bench_diff: unknown option {a}", file=sys.stderr)
            sys.exit(2)
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    (dprev, prev), (dcur, cur) = load(args[0]), load(args[1])

    added = sorted(set(cur) - set(prev))
    removed = sorted(set(prev) - set(cur))
    regressions = []
    improvements = []
    for name in sorted(set(prev) & set(cur)):
        p, c = prev[name], cur[name]
        if p <= 0:
            continue
        ratio = c / p
        if ratio >= threshold and c >= MIN_SECONDS and c - p >= MIN_DELTA_SECONDS:
            regressions.append((name, p, c, ratio))
        elif ratio <= 1 / threshold and p >= MIN_SECONDS:
            improvements.append((name, p, c, ratio))

    tp, tc = sum(prev.values()), sum(cur.values())
    print(f"bench_diff: {len(prev)} -> {len(cur)} queries, "
          f"total {tp:.1f}s -> {tc:.1f}s ({tc / tp:.2f}x)")
    rp, rc = dprev.get("recall_at_10") or {}, dcur.get("recall_at_10") or {}
    for name in sorted(set(rp) | set(rc)):
        a, b = rp.get(name), rc.get(name)
        drift = "" if a is None or b is None or abs(b - a) < 0.02 \
            else f"  <-- recall drift {b - a:+.3f}"
        print(f"  recall@10 {name}: {a} -> {b}{drift}")
    if dcur.get("recall_ok") is False:
        print("bench_diff: RECALL FLOOR BREACHED in current run", file=sys.stderr)
        sys.exit(1)
    if added:
        print(f"  new queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"  removed queries ({len(removed)}): {', '.join(removed)}")
    for name, p, c, r in sorted(improvements, key=lambda t: t[3]):
        print(f"  improved {r:.2f}x  {name}: {p:.3f}s -> {c:.3f}s")

    unannotated = []
    for name, p, c, r in sorted(regressions, key=lambda t: -t[3]):
        note = ANNOTATIONS.get(name)
        tag = f"  ANNOTATED: {note}" if note else "  <-- UNANNOTATED"
        print(f"  REGRESSED {r:.2f}x  {name}: {p:.3f}s -> {c:.3f}s{tag}")
        if not note:
            unannotated.append(name)

    if unannotated:
        print(f"bench_diff: {len(unannotated)} unannotated regression(s) >= "
              f"{threshold}x: {', '.join(unannotated)} — investigate or "
              "annotate in tools/bench_diff.py", file=sys.stderr)
        sys.exit(1)
    print("bench_diff: OK"
          + ("" if not regressions else " (all regressions annotated)"))
    sys.exit(0)


if __name__ == "__main__":
    main()
