#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  (after: sbt "runMain graft.Verify <sfDir> <outDir>")

For each <outDir>/<name>/ parquet result, runs <outDir>/oracle_sql.json[name]
in DuckDB over the sfDir tables, then compares row count, column names, and a
hash over column-name-sorted, row-sorted values.
"""
import sys, json, glob, os, hashlib
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\x00")
    return h.hexdigest()

def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written layout (ScaleUp): a directory of parts
            p = os.path.join(p, "*.parquet")
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "*/"))):
        name = os.path.basename(d.rstrip("/"))
        got = con.execute(f"SELECT * FROM read_parquet('{d}*.parquet')").fetchall()
        got_cols = [c[0] for c in con.description]
        if name not in oracle:
            results[name] = {"status": "rows_only", "rows": len(got)}
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [c[0] for c in con.description]
        except Exception as e:
            results[name] = {"status": "oracle_error", "error": str(e)[:300]}
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got_cols) == sorted(exp_cols)
        ok_hash = ok_cols and table_hash(got, got_cols) == table_hash(exp, exp_cols)
        results[name] = {
            "status": "match" if (ok_rows and ok_cols and ok_hash) else "MISMATCH",
            "rows": len(got), "exp_rows": len(exp),
            "cols_ok": ok_cols, "hash_ok": ok_hash,
        }
        if not ok_cols:
            results[name]["got_cols"] = got_cols
            results[name]["exp_cols"] = exp_cols
    n_ok = sum(1 for r in results.values() if r["status"] == "match")
    for name, r in sorted(results.items()):
        print(f"{r['status']:>12}  {name}  {json.dumps({k: v for k, v in r.items() if k != 'status'})}")
    print(f"\n{n_ok}/{len(results)} match "
          f"({sum(1 for r in results.values() if r['status'] == 'rows_only')} rows-only)")
    return 0 if n_ok + sum(1 for r in results.values() if r['status'] == 'rows_only') == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
