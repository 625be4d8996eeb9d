#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare to the Verify output
(sorted rows, sorted columns, exact for non-floats, tiny tolerance report
for floats so we can see HOW exact we are).

The driver's hash is DTYPE-sensitive (round 13: a DuckDB SUM-promoted
HUGEINT column hash-mismatched against Spark BIGINT with every value
equal), so besides values this also compares the arrow-level column types
of both sides, fetched through the same DuckDB lens.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def values_equal(a, b):
    if a is None and b is None:
        return True, 0.0
    if (a is None) != (b is None):
        return False, float("inf")
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, float("inf")
        if math.isnan(fa) and math.isnan(fb):
            return True, 0.0
        if fa == fb:
            return True, 0.0
        denom = max(abs(fa), abs(fb), 1e-300)
        return False, abs(fa - fb) / denom
    return str(a) == str(b), 0.0 if str(a) == str(b) else float("inf")


def dtype_mismatches(duck_schema, spark_schema):
    """Arrow-level column types must agree, matched by column name (the
    driver canonicalizes column order, so only the name→type map matters).
    Both schemas come through DuckDB's arrow bridge so representational
    noise (string vs large_string) is already normalized away."""
    d = {f.name: str(f.type) for f in duck_schema}
    s = {f.name: str(f.type) for f in spark_schema}
    return [(c, d[c], s[c]) for c in sorted(set(d) & set(s)) if d[c] != s[c]]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck_tab = con.execute(sql).fetch_arrow_table()
            duck_cols = duck_tab.column_names
            duck_rows = [tuple(r.values()) for r in duck_tab.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        try:
            sp_tab = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            sp_cols = sp_tab.column_names
            sp_rows = [tuple(r.values()) for r in sp_tab.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        bad_types = dtype_mismatches(duck_tab.schema, sp_tab.schema)
        if bad_types:
            for c, dt, st in bad_types:
                print(f"FAIL {name}: dtype mismatch col {c}: duck={dt} spark={st}")
            failures += 1
            continue
        if sorted(duck_cols) != sorted(sp_cols):
            print(f"FAIL {name}: columns differ\n  duck:  {sorted(duck_cols)}\n  spark: {sorted(sp_cols)}")
            failures += 1
            continue
        dc, dr = canon(duck_rows, duck_cols)
        sc, sr = canon(sp_rows, sp_cols)
        if len(dr) != len(sr):
            print(f"FAIL {name}: row counts differ duck={len(dr)} spark={len(sr)}")
            failures += 1
            continue
        bad = None
        max_rel = 0.0
        for i, (ra, rb) in enumerate(zip(dr, sr)):
            for j, (va, vb) in enumerate(zip(ra, rb)):
                eq, rel = values_equal(va, vb)
                max_rel = max(max_rel, rel if rel != float("inf") else 0)
                if not eq and rel > 1e-12:
                    bad = (i, dc[j], va, vb, rel)
                    break
            if bad:
                break
        if bad:
            i, cname, va, vb, rel = bad
            print(f"FAIL {name}: row {i} col {cname}: duck={va!r} spark={vb!r} rel={rel:.2e}")
            failures += 1
        else:
            exact = " (exact)" if max_rel == 0.0 else f" (max_rel={max_rel:.1e})"
            print(f"ok   {name}: {len(dr)} rows{exact}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
