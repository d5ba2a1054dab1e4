#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output against DuckDB executing SparkEntry.oracleSql on
the same parquet tables, then compares: schema (column names), row count,
and a hash of values with columns sorted by name and rows sorted.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, math, hashlib
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None or v is getattr(pd, "NaT", ()) or v is getattr(pd, "NA", ()):
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}" if abs(v) < 1e15 else repr(v)
    return str(v)

def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        # Both sides go through pandas, mirroring the driver's bridge
        # symmetrically: date32 -> datetime64 ("... 00:00:00"), null
        # doubles -> NaN on BOTH sides, while DuckDB-only HUGEINT ->
        # float64 widening (uncast integer sums) still mismatches
        # Spark's int64 — the q28/q46/q155 class stays caught locally.
        sdf = pq.read_table(files[0]).to_pandas(date_as_object=False)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.itertuples(index=False, name=None)]
        try:
            # Fetch through the pandas bridge, exactly like the driver's
            # gate: DuckDB HUGEINT (e.g. sum(BIGINT)) widens to float64
            # here, so an oracle missing CAST(... AS BIGINT) fails
            # LOCALLY, not only in the driver run (q28/q46/q155 class).
            df = con.execute(sql).df()
            d_cols = list(df.columns)
            d_rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        issues = []
        if sorted(s_cols) != sorted(d_cols):
            issues.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            issues.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not issues and frame_hash(s_cols, s_rows) != frame_hash(d_cols, d_rows):
            issues.append("value hash mismatch")
            s_ord = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            d_ord = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            sh = {"\x1f".join(canon(r[i]) for i in s_ord) for r in s_rows}
            dh = {"\x1f".join(canon(r[i]) for i in d_ord) for r in d_rows}
            only_s = list(sh - dh)[:3]
            only_d = list(dh - sh)[:3]
            if only_s:
                issues.append(f"  spark-only sample: {only_s}")
            if only_d:
                issues.append(f"  duck-only sample: {only_d}")
        if issues:
            print(f"FAIL {name}: " + "; ".join(issues))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
