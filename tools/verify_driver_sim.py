"""Driver-contract simulator (see .claude/skills/verify): runs entry() +
every queries()/oracle_sql() pair against DuckDB at sf0.01 with the
driver's exact string-equality compare. Pass query names as argv to
check a subset."""
import sys
import duckdb
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[16]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "America/Los_Angeles")
    .getOrCreate()
)
sys.path.insert(0, "/root/repo")
import __spark_entry__ as e

rows = e.entry(spark).collect()
print(f"entry: {len(rows)} rows OK")

qs, os_ = e.queries(), e.oracle_sql()
from activedatawarehouseprototype_spark.catalog import TABLES

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')"
    )

names = sys.argv[1:] or list(qs)
fails = []
for name in names:
    try:
        sdf = qs[name](spark, "/root/testdata/sf0.01")
        scols = sorted(sdf.columns)
        s = sorted(tuple(str(r[c]) for c in scols) for r in sdf.collect())
        if name not in os_:
            print(f"{name}: rows-only {len(s)}")
            continue
        o = sorted(
            tuple(str(v) for v in row)
            for row in con.execute(os_[name]).df()[scols].itertuples(index=False, name=None)
        )
        ok = s == o
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(s)} vs {len(o)})")
        if not ok:
            fails.append(name)
            # first DIFFERING pairs (not the first 3 pairs, which may
            # all agree when the divergence is deep in the sort order)
            diffs = [(a, b) for a, b in zip(s, o) if a != b][:3]
            for a, b in diffs:
                print("  spark:", a)
                print("  oracle:", b)
            if not diffs and len(s) != len(o):
                print("  (row-count difference only; tail rows:)")
                print("  spark tail:", s[-1] if s else None)
                print("  oracle tail:", o[-1] if o else None)
    except Exception as ex:
        fails.append(name)
        print(f"{name}: ERROR {type(ex).__name__}: {ex}")

print(f"\n{len(names) - len(fails)}/{len(names)} green; fails: {fails}")
sys.exit(1 if fails else 0)
