#!/usr/bin/env python3
"""Driver-mimic correctness check: compare Verify.scala's parquet dumps
against the DuckDB oracle (oracle_sql.json) on the same testdata dir.

Mimics the driver's t2 gate: per query, sort columns by name, require
exact dtype parity, then compare row count and values exactly (every
dtype, floats included — the driver hashes, so near-misses fail there
too).

Usage: python3 scripts/check.py <outDir> <sfDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = None
        for c in exp.columns:
            e, g = exp[c], got[c]
            if e.dtype != g.dtype:
                # strict: physical type parity matters to the driver's
                # schema compare (e.g. Spark DECIMAL vs DuckDB DOUBLE)
                bad = f"col {c}: dtype {got[c].dtype} vs {e.dtype}"
                break
            eq = (e.values == g.values) | (e.isna().values & g.isna().values)
            if not eq.all():
                i = int((~eq).argmax())
                bad = f"col {c} row {i}: spark={g.iloc[i]!r} oracle={e.iloc[i]!r}"
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            failures += 1
        else:
            print(f"OK   {name} ({len(exp)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
