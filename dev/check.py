#!/usr/bin/env python3
"""Dev-side twin of the driver's correctness gate: run each oracle SQL in
DuckDB over the sfDir tables, compare against the Verify parquet dumps
(columns sorted by name, rows sorted, values compared with exact/epsilon)."""
import json, sys, glob, math
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = sys.argv[3:] if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{SF_DIR}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                rr.append(round(v, 9))
            elif hasattr(v, "quantize"):  # Decimal
                rr.append(round(float(v), 9))
            else:
                rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]

n_pass = n_fail = 0
for qname, sql in sorted(oracle.items()):
    if ONLY and qname not in ONLY:
        continue
    res_dir = f"{OUT_DIR}/{qname}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {qname}: no spark output")
        n_fail += 1
        continue
    try:
        # read the WHOLE directory — a multi-part dump must not silently
        # compare a subset of rows
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        s_types = {d[0]: str(t) for d, t in zip(spark_rel.description, spark_rel.types)}
        s_rows, s_cols = canon(spark_rel.fetchall(), [d[0] for d in spark_rel.description])
        duck_rel = con.sql(sql)
        d_types = {d[0]: str(t) for d, t in zip(duck_rel.description, duck_rel.types)}
        d_rows, d_cols = canon(duck_rel.fetchall(), [d[0] for d in duck_rel.description])
    except Exception as e:
        print(f"FAIL {qname}: {str(e)[:200]}")
        n_fail += 1
        continue
    # the driver gate hashes pandas frames, so a type KIND mismatch (e.g.
    # DuckDB HUGEINT→float64 vs Spark int64) fails even when values match —
    # flag it. Integer WIDTH differences (INTEGER vs BIGINT) are tolerated
    # (round-1 evidence: such queries hash-matched).
    def kind(t):
        if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
            return "int"
        if t in ("FLOAT", "DOUBLE"):
            return "float"
        return t  # HUGEINT, DECIMAL(...), VARCHAR, DATE, ... stay distinct
    type_mismatch = [c for c in s_types
                     if c in d_types and kind(s_types[c]) != kind(d_types[c])]
    if type_mismatch:
        print(f"FAIL {qname}: dtype " +
              ", ".join(f"{c}: spark={s_types[c]} duck={d_types[c]}" for c in type_mismatch))
        n_fail += 1
    elif s_cols != d_cols:
        print(f"FAIL {qname}: cols spark={s_cols} duck={d_cols}")
        n_fail += 1
    elif len(s_rows) != len(d_rows):
        print(f"FAIL {qname}: rows spark={len(s_rows)} duck={len(d_rows)}")
        n_fail += 1
    elif s_rows != d_rows:
        diffs = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        print(f"FAIL {qname}: {len(diffs)} differing rows; first: spark={s_rows[diffs[0]]} duck={d_rows[diffs[0]]}")
        n_fail += 1
    else:
        print(f"PASS {qname} ({len(s_rows)} rows)")
        n_pass += 1
print(f"== {n_pass} pass, {n_fail} fail ==")
sys.exit(1 if n_fail else 0)
