#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run Verify's parquet dumps
against the DuckDB oracle and diff. Usage:
  python3 tools/compare_oracle.py <verify_out_dir> <sf_dir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_family(t):
    """Collapse an arrow type to the family the driver's hasher treats as
    one equivalence class. int32 vs int64 hash the same raw Python ints;
    Decimal('12') vs 12 and 12.0 vs 12 do NOT (the round-9 failure mode),
    so decimal is its OWN family and int/float never cross-match."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return "list<" + type_family(t.value_type) + ">"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def dtype_drift(spark_schema, duck_schema):
    """Pre-normalization arrow-schema diff: returns a list of
    'col: spark=<fam> duck=<fam>' strings for every shared column whose
    type family drifts, plus any DECIMAL on either side (DuckDB DECIMAL
    never survives the driver's raw-value hash against Spark's
    int64/double — cast the twin instead)."""
    sp = {f.name: f.type for f in spark_schema}
    du = {f.name: f.type for f in duck_schema}
    drift = []
    for c in sorted(set(sp) & set(du)):
        fs, fd = type_family(sp[c]), type_family(du[c])
        if fs != fd:
            drift.append(f"{c}: spark={fs}({sp[c]}) duck={fd}({du[c]})")
        elif "decimal" in fs:
            drift.append(f"{c}: decimal on both sides ({sp[c]} / {du[c]}) — "
                         "driver hashes raw Decimal objects; cast to "
                         "BIGINT/DOUBLE in both twins")
    return drift


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # parquet LIST columns come back as np.ndarray from BOTH
            # pd.read_parquet and duckdb .df() — without ndarray here the
            # tuple conversion never fires and sort_values raises
            # "truth value of an array is ambiguous"
            # DEEP conversion: a list<list<...>> column holds inner
            # ndarrays too, and a shallow tuple() would leave them to
            # blow up sort_values with the same ambiguous-truth error
            def to_tuple(v):
                if isinstance(v, (list, tuple, np.ndarray)):
                    return tuple(to_tuple(x) for x in v)
                return v
            df[c] = df[c].map(to_tuple)
        # normalize ints/floats: int-like floats -> int64. Gate at 2**53
        # (float64's exact-integer ceiling), NOT higher: above it the
        # float path is already lossy, so casting would compare rounded
        # values — a spark-exact int64 vs a duck-rounded float would
        # spuriously fail (or two lossy sides could mask a real diff)
        if str(df[c].dtype).startswith("float"):
            s = df[c].dropna()
            if len(s) and (s == s.round()).all() and s.abs().max() < 2**53:
                df[c] = df[c].astype("Int64")
        if str(df[c].dtype).startswith("datetime"):
            # spark-written TIMESTAMP_MICROS reads back tz-aware
            # (datetime64[ns, UTC]); astype to a naive dtype raises —
            # strip the zone explicitly (UTC sessions, engine contract)
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == bool:
            df[c] = df[c].astype("boolean")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            import pyarrow.parquet as pq
            spark_schema = pq.read_schema(files[0])
            spark_df = norm_df(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}");  n_fail += 1;  continue
        try:
            duck_tbl = con.execute(sql).arrow()
            duck_df = norm_df(duck_tbl.to_pandas())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}");  n_fail += 1;  continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns differ spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1;  continue
        # dtype-strict gate BEFORE norm_df's coercions can mask drift:
        # the driver hashes raw values, so a DECIMAL/DOUBLE oracle column
        # against a Spark int64 fails there even when values are equal
        # (round-9 shipped 6 such reds behind a type-blind local pass)
        drift = dtype_drift(spark_schema, duck_tbl.schema)
        if drift:
            print(f"FAIL {name}: dtype drift: {'; '.join(drift)}")
            n_fail += 1;  continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1;  continue
        try:
            pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(spark_df)} rows)");  n_pass += 1
        except AssertionError as e:
            msg = str(e).splitlines()
            print(f"FAIL {name}: values differ: {' | '.join(msg[:3])}")
            # object-cast before fillna: norm_df coerces int-like floats
            # to nullable Int64, and Int64.fillna("<NA>") raises
            # TypeError on pandas 2.x — that crash would abort every
            # remaining comparison mid-loop
            neq = (spark_df.astype(object).fillna("<NA>")
                   != duck_df.astype(object).fillna("<NA>")).any(axis=1)
            bad = neq[neq].index[:3]
            for i in bad:
                print(f"    spark: {spark_df.loc[i].to_dict()}")
                print(f"    duck : {duck_df.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
