#!/usr/bin/env python3
"""Companion to degenerate_probe.py: for every values-differ cell in a
completed probe work dir, print the first differing row (spark output is
already on disk; only DuckDB re-runs). For engine-failure cells, print
the error class so the fix sweep can batch by family.

Usage: python3 tools/degenerate_triage.py [workDir] [variant/query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/degenerate_probe"
    only = set(sys.argv[2:])
    for variant in ("empty", "single", "dups", "nullcol", "extreme"):
        vdir, vout = f"{work}/{variant}/tables", f"{work}/{variant}/out"
        if not os.path.exists(f"{vout}/oracle_sql.json"):
            continue
        oracles = json.load(open(f"{vout}/oracle_sql.json"))
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{vdir}/{t}.parquet'")
        for name, sql in sorted(oracles.items()):
            key = f"{variant}/{name}"
            if only and key not in only:
                continue
            files = sorted(glob.glob(f"{vout}/{name}/*.parquet"))
            if not files:
                continue  # spark-side failure; probe already classified
            try:
                duck = con.execute(sql).df()
            except Exception:
                continue  # duck-side failure; probe already classified
            spark = pd.concat([pd.read_parquet(p) for p in files])
            if len(spark) != len(duck):
                print(f"== {key}: ROWS spark={len(spark)} duck={len(duck)}")
                print("  spark head:", spark.head(2).to_dict("records"))
                print("  duck  head:", duck.head(2).to_dict("records"))
                continue
            if sorted(spark.columns) != sorted(duck.columns):
                continue
            cols = sorted(spark.columns)
            s = spark.reindex(cols, axis=1).sort_values(cols, key=lambda c: c.astype(str)).reset_index(drop=True)
            d = duck.reindex(cols, axis=1).sort_values(cols, key=lambda c: c.astype(str)).reset_index(drop=True)
            for i in range(len(s)):
                srow, drow = s.iloc[i], d.iloc[i]
                diffs = {}
                for c in cols:
                    sv, dv = srow[c], drow[c]
                    if str(sv) != str(dv):
                        if pd.isna(sv) and pd.isna(dv):
                            continue
                        try:
                            if abs(float(sv) - float(dv)) < 5e-7:
                                continue
                        except (TypeError, ValueError):
                            pass
                        diffs[c] = (sv, dv)
                if diffs:
                    print(f"== {key}: row {i} diff (spark, duck): {diffs}")
                    break
        con.close()


if __name__ == "__main__":
    main()
