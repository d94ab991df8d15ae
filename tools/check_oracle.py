#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the same parquet tables, compare row-count / schema /
value-multiset against the Spark dump in <outdir>/<name>/.

Usage: check_oracle.py <sfdir> <outdir>
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for line in normed:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(outdir, name)
        entry = {}
        try:
            files = glob.glob(os.path.join(spark_dir, "*.parquet"))
            if not files:
                entry["status"] = "NO_SPARK_OUTPUT"
                results[name] = entry
                continue
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in sdf.description]
            srows = sdf.fetchall()
            odf = con.execute(sql)
            ocols = [d[0] for d in odf.description]
            orows = odf.fetchall()
            entry["spark_rows"] = len(srows)
            entry["oracle_rows"] = len(orows)
            if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
                entry["status"] = "SCHEMA_MISMATCH"
                entry["spark_cols"] = sorted(scols)
                entry["oracle_cols"] = sorted(ocols)
            elif len(srows) != len(orows):
                entry["status"] = "ROWCOUNT_MISMATCH"
            elif table_hash(srows, [c.lower() for c in scols]) != \
                    table_hash(orows, [c.lower() for c in ocols]):
                entry["status"] = "HASH_MISMATCH"
                # show a sample difference
                sh = sorted("\x01".join(norm_cell(r[i]) for i in
                        sorted(range(len(scols)), key=lambda i: scols[i].lower()))
                        for r in srows)
                oh = sorted("\x01".join(norm_cell(r[i]) for i in
                        sorted(range(len(ocols)), key=lambda i: ocols[i].lower()))
                        for r in orows)
                for a, b in zip(sh, oh):
                    if a != b:
                        entry["spark_sample"] = a[:300]
                        entry["oracle_sample"] = b[:300]
                        break
            else:
                entry["status"] = "OK"
        except Exception as e:
            entry["status"] = "ERROR"
            entry["error"] = str(e)[:500]
        results[name] = entry
    ok = sum(1 for v in results.values() if v["status"] == "OK")
    print(json.dumps(results, indent=1))
    print(f"\n{ok}/{len(results)} OK", file=sys.stderr)
    for n, v in sorted(results.items()):
        if v["status"] != "OK":
            print(f"  FAIL {n}: {v['status']}", file=sys.stderr)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
