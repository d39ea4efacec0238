"""Round-start testdata preflight: catch physical-schema drift BEFORE
it burns driver rounds.

The driver regenerates /root/testdata each round and has already
shipped timestamp columns in two physical forms (TIMESTAMP(NANOS) in
rounds 1-2, TIMESTAMP(MICROS, isAdjustedToUTC=false) from round 3).
my_weather_spark.tables normalizes the known forms; this script
verifies, per round, that (a) logical column names/types still match
the expectations baked into the engine and oracles, (b) every
timestamp column is in a KNOWN-normalizable physical form, and (c) the
normalization actually agrees with DuckDB's epoch_us on the live data
(one Spark-vs-DuckDB min/max/count spot check per timestamp column).

Usage: python scripts/schema_preflight.py          # all sf dirs
       python scripts/schema_preflight.py --fast   # skip the Spark spot check
Exit 0 = clean; 1 = drift found (fix tables.py / oracles first).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# Logical expectation per table: name -> arrow type string with any
# timestamp physical form collapsed to the token 'TS'. Integer widths
# matter (oracle hashing is type-sensitive), so int32 vs int64 is kept.
EXPECTED = {
    "region": "r_regionkey:int32, r_name:string",
    "nation": "n_nationkey:int32, n_name:string, n_regionkey:int32",
    "customer": "c_custkey:int64, c_name:string, c_nationkey:int32, "
                "c_acctbal:double, c_mktsegment:string",
    "supplier": "s_suppkey:int64, s_name:string, s_nationkey:int32, s_acctbal:double",
    "part": "p_partkey:int64, p_name:string, p_brand:string, p_type:string, "
            "p_size:int32, p_retailprice:double",
    "orders": "o_orderkey:int64, o_custkey:int64, o_orderstatus:string, "
              "o_totalprice:double, o_orderdate:TS, o_orderpriority:string",
    "lineitem": "l_orderkey:int64, l_partkey:int64, l_suppkey:int64, "
                "l_linenumber:int32, l_quantity:double, l_extendedprice:double, "
                "l_discount:double, l_tax:double, l_returnflag:string, "
                "l_linestatus:string, l_shipdate:TS",
    "events": "event_id:int64, ts:TS, user_id:int64, event_type:string, "
              "value:double, props:string",
    "documents": "doc_id:int64, text:string, lang:string, source:string, n_chars:int64",
    "embeddings": "vec_id:int64, embedding:list<element: float>, label:int32",
}

# Physical timestamp forms tables.py knows how to normalize.
KNOWN_TS_FORMS = {
    "timestamp[ns]",            # rounds 1-2 (read as long under nanosAsLong)
    "timestamp[us]",            # round 3+ NTZ (isAdjustedToUTC=false)
    "timestamp[us, tz=UTC]",    # a plausible future flip to instant semantics
    "int64",                    # raw epoch-ns long
}


def check_schemas() -> tuple[int, list[tuple[str, str, str]]]:
    """Returns (n_fail, [(table, col, physical_ts_form), ...])."""
    n_fail = 0
    ts_forms: list[tuple[str, str, str]] = []
    for d in SF_DIRS:
        for table, want in EXPECTED.items():
            path = f"{d}/{table}.parquet"
            if not os.path.exists(path):
                print(f"FAIL {d}/{table}: missing file")
                n_fail += 1
                continue
            sch = pq.read_schema(path)
            parts = []
            for name in sch.names:
                t = str(sch.field(name).type)
                if t.startswith("timestamp") or (
                    "date" in name.lower() or name == "ts"
                ) and t == "int64":
                    if t not in KNOWN_TS_FORMS:
                        print(f"FAIL {d}/{table}.{name}: UNKNOWN ts form {t!r} "
                              f"— teach tables.py before trusting any query")
                        n_fail += 1
                    if d.endswith("sf0.01"):
                        ts_forms.append((table, name, t))
                    parts.append(f"{name}:TS")
                else:
                    parts.append(f"{name}:{t}")
            got = ", ".join(parts)
            if got != want:
                print(f"FAIL {d}/{table}: schema drift\n  want: {want}\n  got:  {got}")
                n_fail += 1
    return n_fail, ts_forms


def spot_check_semantics() -> int:
    """Load every timestamp column through tables.load_table in a
    VANILLA session (driver conditions) and require unix_micros
    min/max/count to match DuckDB epoch_us exactly at sf0.01."""
    import duckdb
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from my_weather_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("schema_preflight")
        .getOrCreate()
    )
    con = duckdb.connect()
    n_fail = 0
    for table, col in [("events", "ts"), ("orders", "o_orderdate"),
                       ("lineitem", "l_shipdate")]:
        df = load_table(spark, sf, table)
        s = df.agg(
            F.min(F.unix_micros(col)).alias("lo"),
            F.max(F.unix_micros(col)).alias("hi"),
            F.count(col).alias("n"),
        ).collect()[0]
        d = con.sql(
            f"SELECT min(epoch_us({col})) lo, max(epoch_us({col})) hi, "
            f"count({col}) n FROM '{sf}/{table}.parquet'"
        ).fetchone()
        if (s["lo"], s["hi"], s["n"]) != d:
            print(f"FAIL semantics {table}.{col}: spark "
                  f"({s['lo']},{s['hi']},{s['n']}) != duckdb {d}")
            n_fail += 1
        else:
            print(f"ok   semantics {table}.{col}: micros agree ({s['n']} rows)")
    return n_fail


def main() -> int:
    n_fail, ts_forms = check_schemas()
    for table, col, form in ts_forms:
        print(f"ok   ts form {table}.{col}: {form}")
    if n_fail == 0:
        print("schemas: all tables match expectations at all sf dirs")
    if "--fast" not in sys.argv and n_fail == 0:
        n_fail += spot_check_semantics()
    print(f"preflight: {'CLEAN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
