#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(dumps each SparkEntry query to outDir/<name>/ parquet + oracle_sql.json),
then this script runs each oracle SQL in DuckDB over the same fixture
parquet and compares values exactly (columns sorted by name, rows in
emitted order). Usage: python3 tools/check.py <sfDir> <outDir> [query...]"""
import duckdb, json, math, sys, os, glob

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    # datetimes compare fine; Decimal -> float-safe string
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    all_dirs = {os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)}
    for name in sorted(all_dirs):
        if only and name not in only: continue
        try:
            sp_cols = [r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchall()]
            cols = ",".join(f'"{c}"' for c in sorted(sp_cols))
            sp = con.execute(
                f"SELECT {cols} FROM read_parquet('{outdir}/{name}/*.parquet')").fetchall()
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"; continue
        if name not in oracle:
            results[name] = f"rows-only ({len(sp)} rows)" + (" EMPTY!" if not sp else "")
            continue
        try:
            con.execute(f"CREATE OR REPLACE VIEW __o AS {oracle[name]}")
            o_cols = [r[0] for r in con.execute("DESCRIBE __o").fetchall()]
            ocols = ",".join(f'"{c}"' for c in sorted(o_cols))
            ora = con.execute(f"SELECT {ocols} FROM __o").fetchall()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {e}"; continue
        if sorted(sp_cols) != sorted(o_cols):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(sp_cols)} oracle={sorted(o_cols)}"
            continue
        if len(sp) != len(ora):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(sp)} oracle={len(ora)}"
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sp, ora)):
            na, nb = tuple(map(norm, a)), tuple(map(norm, b))
            eq = all((x == y) or (isinstance(x,(int,float)) and isinstance(y,(int,float)) and float(x)==float(y))
                     for x, y in zip(na, nb))
            if not eq:
                bad = (i, na, nb); break
        results[name] = "PASS" if bad is None else f"VALUE-MISMATCH row {bad[0]}: spark={bad[1]} oracle={bad[2]} (cols {sorted(sp_cols)})"
    npass = sum(1 for v in results.values() if v == "PASS")
    nro = sum(1 for v in results.values() if v.startswith("rows-only"))
    for k, v in sorted(results.items()):
        flag = "OK " if v == "PASS" or v.startswith("rows-only") else "FAIL"
        print(f"[{flag}] {k}: {v}")
    print(f"\n{npass} oracle-PASS, {nro} rows-only, {len(results)-npass-nro} failing, {len(results)} total")

if __name__ == "__main__":
    main()
