"""Local replica of the driver's correctness gate: runs each queries()
entry on Spark at a given SF and compares row-count + column names +
order-insensitive values against oracle_sql() in DuckDB."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if v is None:
        # sortable sentinel: Python cannot order None against ints when
        # sorting row tuples (both sides map None identically, so
        # equality is unaffected)
        return "\x00null"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:  # decimals -> float
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


def main(sf_dir: str, only: list[str]):
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle-check")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sset = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e!r}"))
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only check, {len(srows)} rows "
                  f"(no oracle)")
            continue
        try:
            orel = con.sql(sql)
            ocols = sorted(orel.columns)
            orows = orel.fetchall()
            colmap = [orel.columns.index(c) for c in ocols]
            oset = sorted(tuple(norm(r[i]) for i in colmap) for r in orows)
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e!r}"))
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            continue
        if scols != ocols:
            failures.append((name, f"schema {scols} vs {ocols}"))
            print(f"FAIL {name}: columns {scols} vs {ocols}")
        elif len(sset) != len(oset):
            failures.append((name, f"rowcount {len(sset)} vs {len(oset)}"))
            print(f"FAIL {name}: rowcount {len(sset)} vs {len(oset)}")
        elif sset != oset:
            diff = [(a, b) for a, b in zip(sset, oset) if a != b][:5]
            failures.append((name, f"values differ, e.g. {diff[:2]}"))
            print(f"FAIL {name}: values differ e.g. {diff[:2]}")
        else:
            print(f"PASS {name}: {len(sset)} rows")
    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    sys.exit(main(sf, sys.argv[1:]))
