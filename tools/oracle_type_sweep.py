#!/usr/bin/env python3
"""Oracle result-type hazard sweep.

The driver's correctness compare renders DuckDB results through pandas,
where HUGEINT (any uncast sum/window-sum over BIGINT), DECIMAL, and
FLOAT columns change their string rendering (354 -> 354.0) and
hash-mismatch the Spark parquet column even when every value is equal.
This sweep runs every oracle query and flags any result column whose
DuckDB type is outside the safe set — run it whenever a query is added.

Usage: python3 tools/oracle_type_sweep.py <sfDir> <verifyOutDir>
(verifyOutDir = the output of `runMain graft.Verify`, for oracle_sql.json)
"""
import duckdb, glob, json, os, sys

SAFE = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "VARCHAR",
        "BOOLEAN", "DATE", "TIMESTAMP")

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    sqls = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bad = 0
    for name, sql in sorted(sqls.items()):
        try:
            rel = con.sql(sql)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"ERR    {name}: {e}")
            bad += 1
            continue
        for c, t in zip(rel.columns, [str(t) for t in rel.types]):
            if not any(str(t).startswith(s) for s in SAFE):
                print(f"HAZARD {name}.{c}: {t}")
                bad += 1
    print(f"{'FAIL' if bad else 'OK'}: {bad} hazards over {len(sqls)} oracles")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
