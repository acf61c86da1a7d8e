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
            o_desc = con.execute("DESCRIBE __o").fetchall()
            o_cols = [r[0] for r in o_desc]
            ocols = ",".join(f'"{c}"' for c in sorted(o_cols))
            ora = con.execute(f"SELECT {ocols} FROM __o").fetchall()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {e}"; continue
        if sorted(sp_cols) != sorted(o_cols):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(sp_cols)} oracle={sorted(o_cols)}"
            continue
        # The driver's hasher materializes DuckDB results through pandas,
        # where HUGEINT/DECIMAL columns become float64 (formatted "1.0" vs
        # Spark's int64 "1") — a representation mismatch invisible to the
        # float()-equality compare below. Round 8 lost q_ta3/ta4/ts6/srch3
        # to exactly this: SUM(BIGINT) returns HUGEINT in DuckDB. Flag any
        # oracle column outside the boring type set as a hard failure.
        BORING = {"BIGINT","INTEGER","SMALLINT","TINYINT","DOUBLE","FLOAT",
                  "VARCHAR","DATE","TIMESTAMP","BOOLEAN","BLOB",
                  "TIMESTAMP WITH TIME ZONE"}
        exotic = [(c, t) for c, t, *_ in o_desc if t not in BORING]
        if exotic:
            results[name] = f"TYPE-HAZARD oracle cols {exotic} (cast to BIGINT/DOUBLE in the SQL)"
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
