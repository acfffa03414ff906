"""Local mirror of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count, schema width, and order-insensitive values.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from bigdata_event_stream_detection_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "8g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"[SPARK-ERR] {name}")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            print(f"[DUCK-ERR] {name}")
            traceback.print_exc()
            failures.append(name)
            continue
        ok_schema = sorted(c.lower() for c in scols) == sorted(
            c.lower() for c in dcols)
        # Typed proxy for the driver's value-hash: a DuckDB HUGEINT /
        # DECIMAL(38,x) sum materializes as a different pandas dtype (or
        # object/Decimal) than Spark's BIGINT/DOUBLE, which renders
        # differently and breaks the hash even when values agree.
        if ok_schema:
            try:
                ddf = con.execute(oracles[name]).df()
                spdf = sdf.toPandas()
                tdiff = []
                for c in scols:
                    sk = spdf[c].dtype.kind
                    dk = ddf[c].dtype.kind
                    if sk != dk:
                        tdiff.append((c, str(spdf[c].dtype), str(ddf[c].dtype)))
                    elif sk == "O" and len(spdf) and len(ddf):
                        st = type(spdf[c].dropna().iloc[0]).__name__ \
                            if spdf[c].notna().any() else None
                        dt = type(ddf[c].dropna().iloc[0]).__name__ \
                            if ddf[c].notna().any() else None
                        if st != dt:
                            tdiff.append((c, f"obj:{st}", f"obj:{dt}"))
                if tdiff:
                    print(f"[TYPE-MISMATCH] {name}: {tdiff}")
                    failures.append(name)
                    continue
            except Exception:
                print(f"[TYPE-CHECK-ERR] {name} (non-fatal)")
                traceback.print_exc()
        s_norm = normalize([r.asDict() for r in srows], scols)
        # reorder duck columns to match spark order by name
        idx = [dcols.index(c) for c in scols] if ok_schema else None
        if idx is not None:
            d_norm = sorted(
                tuple(
                    str(round(r[i], 6) if isinstance(r[i], float) else r[i])
                    for i in idx)
                for r in drows)
        else:
            d_norm = None
        if not ok_schema:
            print(f"[SCHEMA-MISMATCH] {name}: spark={scols} duck={dcols}")
            failures.append(name)
        elif len(s_norm) != len(d_norm):
            print(f"[COUNT-MISMATCH] {name}: spark={len(s_norm)} "
                  f"duck={len(d_norm)}")
            failures.append(name)
        elif s_norm != d_norm:
            diff = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
            print(f"[VALUE-MISMATCH] {name}: first diffs {diff}")
            failures.append(name)
        else:
            print(f"[OK] {name}: {len(s_norm)} rows")
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
