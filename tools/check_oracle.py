#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (views over the same parquet
tables), sorts columns by name, and compares cell-by-cell.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def cells_equal(a, b):
    """Cell compare: floats via isclose (summation-order tolerance);
    everything else exact."""
    na, nb = norm(a), norm(b)
    if isinstance(na, float) and isinstance(nb, float):
        return math.isclose(na, nb, rel_tol=1e-9, abs_tol=1e-12)
    return na == nb


# DuckDB types whose physical representation can't match a Spark result
# even when values do (the driver's hash compare is typed): flag early.
SUSPECT_TYPES = {"HUGEINT", "UHUGEINT", "TINYINT", "SMALLINT", "UTINYINT",
                 "USMALLINT", "UINTEGER", "UBIGINT"}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    declared = set(oracles)
    have = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    for name in sorted(have | declared):
        if name not in have:
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        if name not in declared:
            print(f"SKIP {name}: no oracle (rows-only check: "
                  f"{len(spark_rel.fetchall())} rows)")
            continue
        try:
            oracle_rel = con.sql(oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        scols = sorted(spark_rel.columns)
        ocols = sorted(oracle_rel.columns)
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        suspect = [(c, str(t)) for c, t in
                   zip(oracle_rel.columns, oracle_rel.types)
                   if str(t) in SUSPECT_TYPES]
        if suspect:
            print(f"FAIL {name}: oracle column types the driver's typed "
                  f"hash can't match: {suspect} — add explicit CASTs")
            n_fail += 1
            continue
        # The driver's hash compare is typed: a Spark INT vs oracle
        # BIGINT mismatch fails there even when values agree (q14 r1).
        stypes = {c: str(t) for c, t in
                  zip(spark_rel.columns, spark_rel.types)}
        otypes = {c: str(t) for c, t in
                  zip(oracle_rel.columns, oracle_rel.types)}
        tmis = [(c, stypes[c], otypes[cl]) for c in stypes
                for cl in otypes if c.lower() == cl.lower()
                and stypes[c] != otypes[cl]]
        if tmis:
            print(f"FAIL {name}: column type mismatch spark vs oracle: {tmis}")
            n_fail += 1
            continue
        srows = spark_rel.select(*[f'"{c}"' for c in scols]).fetchall()
        orows = oracle_rel.select(*[f'"{c}"' for c in ocols]).fetchall()
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if not all(cells_equal(x, y) for x, y in zip(a, b)):
                bad = (i, tuple(map(norm, a)), tuple(map(norm, b)))
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} oracle={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
