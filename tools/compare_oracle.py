#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the declared DuckDB oracle SQL against
the same testdata tables and diff (column-name-sorted, row-sorted) values.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    return v

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetch_arrow_table().to_pylist()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table().to_pylist()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": -1,
                            "oracle_rows": -1, "err": str(e)[:300]}
            n_fail += 1
            continue
        def canon(rows):
            return sorted(
                (tuple(norm(r[k]) for k in sorted(r)) for r in rows),
                key=lambda t: tuple(str(x) for x in t))
        exp_c, got_c = canon(exp), canon(got)
        exp_cols = sorted(exp[0]) if exp else []
        got_cols = sorted(got[0]) if got else []
        entry = {"rows_match": len(exp_c) == len(got_c),
                 "schema_match": exp_cols == got_cols,
                 "hash_match": exp_c == got_c,
                 "spark_rows": len(got_c), "oracle_rows": len(exp_c),
                 "err": None}
        report[name] = entry
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns differ oracle={exp_cols} spark={got_cols}")
            n_fail += 1
        elif exp_c != got_c:
            diffs = [(a, b) for a, b in zip(exp_c, got_c) if a != b]
            print(f"FAIL {name}: {len(exp_c)} vs {len(got_c)} rows, "
                  f"{len(diffs)} differing (first: {diffs[:2] if diffs else 'row-count'})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_c)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        # the driver's CORRECTNESS_r{N}.json shape, so an empty or
        # missing driver artifact is diagnosable against this one at a
        # glance (round-10 verdict: the driver round artifact arrived
        # as {} while the sweep was green)
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    jo = None
    argv = sys.argv[1:]
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: compare_oracle.py <sfDir> <verifyOutDir> "
                     "[--json <reportPath>]")
        jo = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 2:
        sys.exit("usage: compare_oracle.py <sfDir> <verifyOutDir> "
                 "[--json <reportPath>]")
    sys.exit(main(argv[0], argv[1], jo))
