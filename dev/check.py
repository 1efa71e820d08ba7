#!/usr/bin/env python3
"""Dev-loop correctness check mimicking the driver's DuckDB oracle gate.

Usage: python3 dev/check.py [sfDir] [outDir] [--skip-verify] [names...]

Runs graft.Verify (unless --skip-verify), then for each query: loads the
Spark parquet dump and the DuckDB oracle result, sorts columns by name and
rows by all values, and compares cell-by-cell (exact; floats reported with
diff magnitude when mismatched).
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/root/repo/target/verify_out"
    only = set(args[2:])
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write("\n".join(r.stdout.splitlines()[-15:]) + "\n")
        if r.returncode != 0:
            print("VERIFY FAILED"); print(r.stderr[-3000:]); sys.exit(1)

    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"[MISS] {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_fail += 1; continue

        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"[FAIL] {name}: columns spark={sc} duck={dc}"); n_fail += 1
            continue
        s = spark_df[sc].sort_values(sc, kind="mergesort").reset_index(drop=True)
        d = duck_df[dc].sort_values(dc, kind="mergesort").reset_index(drop=True)
        if len(s) != len(d):
            print(f"[FAIL] {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1
            continue
        bad = []
        for c in sc:
            sv, dv = s[c].tolist(), d[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if (math.isnan(a) and math.isnan(b)):
                        continue
                    bad.append((c, i, a, b, abs(a - b)))
                else:
                    bad.append((c, i, a, b, None))
                if len(bad) > 3:
                    break
            if len(bad) > 3:
                break
        if bad:
            print(f"[FAIL] {name}: {len(s)} rows, first diffs: {bad[:3]}")
            n_fail += 1
        else:
            print(f"[ok  ] {name}: {len(s)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
