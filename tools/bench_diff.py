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
    # round 15 (verdict ask #1): packSequences/packSequencesByTokens/
    # interleaveByWeight moved from a single-task low-domain window to the
    # distributed PrefixScan regime (range-sort + localCheckpoint + a
    # boundary-offsets job + a partition-local scan). At sf0.1 the extra
    # job launches and the checkpoint materialization cost ~0.2-0.45 s
    # absolute; at 100 TB the removed one-task-per-source window sort is
    # the real cost. Intentional trade, plan spec-pinned WindowExec-free.
    # round 16 (verdict ask #1/#2 class): the last empty-partition corpus
    # windows were retired. targetEncodeSmoothed/frequencyEncode(normalize)
    # now compute their global terms via one ungrouped aggregate broadcast
    # back through a crossJoin (+1 bounded job at sf0.1, -1 Exchange to
    # SinglePartition that funneled the whole corpus through one task at
    # scale); quantileNormalize's reference rank table rides PrefixScan
    # (+checkpoint +bounded offsets job, -single-task ROW_NUMBER sort of
    # the whole reference). Same trade as the round-15 loader family;
    # plans spec-pinned, oracles unchanged.
    "q_target_encode_smoothed": "global terms via agg+broadcast crossJoin: +1 bounded job, -SinglePartition corpus window",
    "q_frequency_encode": "total via agg+broadcast crossJoin: +1 bounded job, -SinglePartition corpus window",
    "q_quantile_normalize": "PrefixScan reference table: +checkpoint +bounded job, -single-task reference sort",
    "q_auc": "ungrouped Mann-Whitney folds over the distinct-score frame via PrefixScan: +checkpoint +bounded job, -single-task rank window",
    "q_spearman": "ungrouped rank tables via PrefixScan + value joins: +2 checkpoints, -2 single-task rank windows",
    "q_pack_sequences_tokens": "PrefixScan regime: +checkpoint +2 bounded jobs, -single-task window",
    "q_pack_sequences": "PrefixScan regime: +checkpoint +2 bounded jobs, -single-task window",
    "q_interleave": "PrefixScan regime: +checkpoint +2 bounded jobs, -single-task window",
    "q_loader_prep": "PrefixScan regime: +checkpoint +2 bounded jobs, -single-task window",
    # round 7: Bernoulli df.sample was replaced by the deterministic
    # md5-hash sampler so q_sample could carry a hard DuckDB oracle; the
    # per-row md5 is the price of cross-engine reproducibility.
    "q_sample": "Bernoulli sample -> deterministic md5 hash sampler (oracle-able)",
    # round 8: stripBoilerplate regroups and rejoins on group ++ id instead
    # of id alone (a doc_id repeated under two sources silently merged both
    # docs before); the wider keys cost ~0.14s at sf0.1.
    "q_strip_boilerplate": "regroup/rejoin on group ++ id (same-id-two-groups fix)",
    # round 12 (verdict ask #8 glance): 0.266 -> 0.322 (1.21x) — but the
    # WHOLE run drifted 1.14x median vs the round-11 baseline on untouched
    # trivial queries (q_cast 1.62x, q_datediff 1.53x), so the residual is
    # ~1.06x: the template path moves with the host, it is not specially
    # regressed. Cost is render + temp view + one aggregate; nothing in
    # the path changed since round 9.
    "q_named_transform": "moves with whole-run host drift (residual ~1.06x); template path unchanged",
    # round 12: the single-reference-scan refactor collects cutoffs and
    # reference bucket counts EAGERLY at op-construction (persist + two
    # bounded driver jobs instead of one lazy two-scan plan). At sf0.1 the
    # extra job launches read as tens of ms; at 100 TB the removed second
    # reference scan is the real cost. Intentional trade.
    "q_psi_quantile": "one-reference-scan refactor: +2 bounded eager jobs, -1 corpus rescan",
    "q_events_drift_quantile": "one-reference-scan refactor: +2 bounded eager jobs, -1 corpus rescan",
    # round 13 (verdict ask #4 adjudication): the r10->r12 upward trend
    # (1.601 -> 1.858 -> 2.229) was re-timed DELIBERATELY — the query runs
    # on a FIXED 21-row fixture, so its cost is planning/codegen, not
    # data. Fresh-JVM steady state measured 1.66 s (4 runs), 1.40-1.81 s
    # after 60 warm queries (JIT helps, never hurts); the r12 status log
    # shows pass 2 hit a localized host stall (9.1 s, with the adjacent
    # q_corr_matrix_listwise 2.6 -> 4.9 and q_mix_by_temperature 0.25 ->
    # 0.96 in the same window), so the kept 2.229 is a single-pass-1
    # sample. Trend = pass-position noise on a codegen-bound query, not a
    # plan change (the plan and fixture are unchanged since round 10).
    "q_fuzzy_pairs": "codegen-bound fixed fixture; re-timed 1.4-1.9s steady, r12 pass2 was a host stall",
    # round 13 (verdict ask #4, second line): the replay guard added one
    # SHOW TBLPROPERTIES + one ALTER TABLE marker write per batch (round
    # 12), and the checkpoint-identity fix adds one tiny metadata-file
    # read per batch (round 13) — per-batch catalog costs that read as
    # ~+0.3 s at sf0.1's batch count and amortize to noise at real batch
    # sizes. Intentional exactly-once hardening.
    "q_events_drift": "replay-guard catalog ops per batch (+identity read); amortizes at real batch sizes",
    # round 14 (verdict ask #3 adjudication): the r11->r13 rise (1.619 ->
    # 1.690 -> 2.381) met the three-same-direction rule and was re-timed
    # DELIBERATELY (the q_fuzzy_pairs playbook): fresh-JVM pass 1 read
    # 8.78 s (cold codegen), steady state 1.15-1.26 s over three runs —
    # BELOW the 1.639 tracked baseline. Output is a fixed 256-pair frame;
    # the candidate-growth hypothesis is not supported (row counts flat),
    # and the plan is unchanged since round 11. Trend = pass-position /
    # warmup noise on a small codegen-bound query, not a real regression.
    "q_dedup_containment": "re-timed steady 1.15-1.26s (< baseline); r13 2.381 was warmup/pass-position noise",
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
