"""Self-check harness replicating the driver's correctness gate:

For each registered query, run the Spark DataFrame AND the DuckDB oracle SQL
on the same parquet tables, then compare row count, column names, and values
(order-insensitive, column-name-sorted) — the same contract the driver's
CORRECTNESS_r{N}.json uses.

Usage: python -m hadoop_bam_spark.tools.check_oracle [sf_dir] [query ...]
       python -m hadoop_bam_spark.tools.check_oracle --json OUT.json [sf_dir]

``--json`` additionally writes the driver-shaped artifact ({name:
{rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}}) —
the round's COMPLETE correctness record over every registered query (the
driver's official file samples ~50; VERDICT r4 item 2).
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rows_to_canon(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = [tuple(_canon(r[i]) for i in order) for r in rows]
    canon.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return canon, [columns[i] for i in order]


def check_query(spark, con, name, spec, sf_dir) -> dict:
    out = {"name": name}
    t0 = time.time()
    sdf = spec.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    out["spark_rows"] = len(srows)
    out["spark_sec"] = round(time.time() - t0, 2)
    if spec.oracle is None:
        out["status"] = "rows_only"
        return out
    t0 = time.time()
    cur = con.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    out["duck_rows"] = len(orows)
    out["duck_sec"] = round(time.time() - t0, 2)
    s_canon, s_cols = _rows_to_canon(scols, [tuple(r) for r in srows])
    o_canon, o_cols = _rows_to_canon(ocols, orows)
    if s_cols != o_cols:
        out["status"] = f"SCHEMA MISMATCH spark={s_cols} duck={o_cols}"
    elif len(s_canon) != len(o_canon):
        out["status"] = f"ROWCOUNT MISMATCH spark={len(s_canon)} duck={len(o_canon)}"
    elif s_canon != o_canon:
        diff = [
            (a, b) for a, b in zip(s_canon, o_canon) if a != b
        ][:3]
        out["status"] = f"VALUE MISMATCH first_diffs={diff}"
    else:
        out["status"] = "OK"
    return out


def parse_args(argv: list) -> tuple:
    """(json_out, sf_dir, only) from CLI args; ``--json OUT`` accepted
    at ANY position (a misplaced flag once parsed as sf_dir + query
    names and vacuously passed; VERDICT r9 item 6). Raises SystemExit
    on a dangling --json or a non-directory sf_dir."""
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            raise SystemExit("--json requires an output path")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        raise SystemExit(
            f"not a directory: {sf_dir!r} (usage: check_oracle "
            f"[--json OUT.json] [sf_dir] [query ...])"
        )
    return json_out, sf_dir, set(argv[1:])


def main():
    json_out, sf_dir, only = parse_args(sys.argv[1:])

    import duckdb

    from hadoop_bam_spark.queries import REGISTRY
    from hadoop_bam_spark.session import TABLES, get_spark

    unknown = only - set(REGISTRY)
    if unknown:
        sys.exit(
            f"unknown query name(s): {sorted(unknown)} — "
            f"registry has {len(REGISTRY)} queries"
        )

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures = 0
    record = {}
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            res = check_query(spark, con, name, spec, sf_dir)
        except Exception as e:
            traceback.print_exc()
            res = {"name": name, "status": f"ERROR {type(e).__name__}: {e}"}
        ok = res["status"] in ("OK", "rows_only")
        if not ok:
            failures += 1
        status = res["status"]
        record[name] = {
            "rows_match": ok or not status.startswith(
                ("ROWCOUNT", "ERROR")
            ),
            "schema_match": ok or not status.startswith(
                ("SCHEMA", "ERROR")
            ),
            "hash_match": ok,
            "spark_rows": res.get("spark_rows"),
            "oracle_rows": res.get("duck_rows"),
            "err": None if ok else status,
            "mode": "rows_only" if status == "rows_only" else "full",
        }
        print(
            f"{'PASS' if ok else 'FAIL'}  {name:32s} {res.get('spark_rows', '-'):>7} rows  "
            f"spark={res.get('spark_sec', '-')}s duck={res.get('duck_sec', '-')}s  {res['status']}"
        )
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}: {len(record)} queries, {failures} failures")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
