"""Driver-style correctness check: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB at sf0.01; compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_correctness.py [name ...]
       python scripts/check_correctness.py --types   # oracle-type preflight only

Every DuckDB oracle output column must be a portable type (BIGINT /
INTEGER / DOUBLE / VARCHAR / BOOLEAN / DATE / TIMESTAMP*): the
driver's value hasher is type-sensitive, and DuckDB silently widens
integer window/aggregate sums to HUGEINT (int128), which hash-
mismatches a bit-identical BIGINT (round-2/3 `sessionize_users` +
`pack_chunks_by_source` failures). The --types mode catches that
locally without running Spark.
"""

from __future__ import annotations

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from _duck import oracle_connect
from my_weather_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


# ONE canonicalization contract for the whole repo: the fingerprint
# module owns it (it also pins the rows-only fixtures), this harness
# imports it — the two must never diverge, and the shared version
# guards NaN/Infinity before the int() fast path.
from my_weather_spark.fingerprint import canon_cell  # noqa: E402


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c.lower() for c in sorted(cols)], out


_PORTABLE_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE",
}


def _bad_oracle_types(rel):
    """Return [(col, type)] for non-portable DuckDB output types."""
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if t in _PORTABLE_TYPES or t.startswith("TIMESTAMP"):
            continue
        bad.append((col, t))
    return bad


def typecheck():
    """Preflight: every oracle's DuckDB output types must be portable.
    No Spark session needed — relation .types is resolved lazily."""
    con = oracle_connect(SF_DIR)
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, sql in oracles.items():
        try:
            bad = _bad_oracle_types(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if bad:
            print(f"FAIL {name}: non-portable oracle types {bad}")
            n_fail += 1
    print(f"types preflight: {len(oracles) - n_fail} clean, {n_fail} fail, {len(oracles)} oracles")
    return 1 if n_fail else 0


def main(names=None):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names or list(qs)
    # Fail fast on names that aren't registry entries (e.g. a stray
    # flag: this script takes NO --sf option — scale comes from
    # SPARK_GRAFT_SF_DIR_T2). Without this, "--sf <dir>" silently
    # becomes two FAIL rows and miscounts a rehearsal readout; checked
    # BEFORE the sessions spin up so a bad invocation fails in
    # seconds, not after a Spark start.
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries (not in the registry): {unknown}")
        print("usage: check_correctness.py [--types] [name ...]; "
              "set SPARK_GRAFT_SF_DIR_T2 to change scale")
        return 2
    # JVM-headroom oracle connection (_duck.py): this process hosts a
    # live Spark JVM, the exact all-cores convoy topology from r10
    con = oracle_connect(SF_DIR)
    spark = get_spark(app_name="check_correctness")
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            bad_types = _bad_oracle_types(rel)
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if bad_types:
            print(f"FAIL {name}: non-portable oracle types {bad_types}")
            n_fail += 1
            continue
        sc, sr = canon_rows(s_cols, s_rows)
        dc, dr = canon_rows(d_cols, d_rows)
        ok = True
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            ok = False
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            ok = False
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            ok = False
        if ok:
            print(f"PASS {name} ({len(sr)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--types"]:
        sys.exit(typecheck())
    else:
        sys.exit(main(sys.argv[1:] or None))
