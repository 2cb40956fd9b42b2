#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

NOT part of the graft library (driver-side tools: duckdb/pandas are
permitted for local verification only). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
    python3 dev/compare_local.py /root/testdata/sf0.01 /tmp/graft_verify
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            results[name] = {"status": "MISSING_SPARK_OUTPUT"}
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{res_dir}/*.parquet"))],
                                 ignore_index=True)
        except Exception as e:
            results[name] = {"status": f"SPARK_READ_FAIL: {e}"}
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            results[name] = {"status": f"ORACLE_FAIL: {type(e).__name__}: {e}"}
            continue
        r = {"spark_rows": len(spark_df), "oracle_rows": len(duck_df)}
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(d.columns):
            r["status"] = f"SCHEMA_COLS: spark={list(s.columns)} oracle={list(d.columns)}"
        elif len(s) != len(d):
            r["status"] = "ROWCOUNT_MISMATCH"
        else:
            # compare cell-by-cell as strings after normalizing dtypes
            mismatch_cols = []
            for c in s.columns:
                sv, dv = s[c], d[c]
                if str(sv.dtype) != str(dv.dtype):
                    # tolerate int32/int64 vs Int, datetime unit diffs — compare values
                    pass
                try:
                    sn = sv.astype(str).reset_index(drop=True)
                    dn = dv.astype(str).reset_index(drop=True)
                    if not sn.equals(dn):
                        bad = (sn != dn)
                        idx = bad[bad].index[:3].tolist()
                        mismatch_cols.append((c, str(sv.dtype), str(dv.dtype),
                                              [(i, sn[i], dn[i]) for i in idx]))
                except Exception as e:
                    mismatch_cols.append((c, str(sv.dtype), str(dv.dtype), f"cmp_error {e}"))
            dtype_diffs = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                           if str(s[c].dtype) != str(d[c].dtype)]
            if mismatch_cols:
                r["status"] = "VALUE_MISMATCH"
                r["cols"] = [str(x) for x in mismatch_cols[:4]]
            else:
                r["status"] = "OK" if not dtype_diffs else "OK_DTYPE_DIFF"
                if dtype_diffs:
                    r["dtypes"] = [str(x) for x in dtype_diffs]
        results[name] = r
    ok = sum(1 for v in results.values() if str(v.get("status", "")).startswith("OK"))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{ok}/{len(results)} OK")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
