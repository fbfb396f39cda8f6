#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles (mirrors the driver's t2 gate).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet, and
compares: columns sorted by name, rows sorted by all columns, exact match
for non-floats, near-exact (rel 1e-12) report for floats.

Driver-side python only (duckdb/pandas/pyarrow) — not part of the library.
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # list/array cells are unhashable (a list-of-repr shadow still is) —
    # collapse each array cell to ONE scalar string so multi-column
    # sort_values and equality both work
    for col in df.columns:
        if df[col].dtype == object and df[col].map(
                lambda v: isinstance(v, (list, tuple)) or
                hasattr(v, "__array__")).any():
            df[col] = df[col].map(
                lambda v: None if v is None else "|".join(map(repr, v)))
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last",
                            kind="mergesort",
                            key=lambda s: s.map(repr) if s.dtype == object else s
                            ).reset_index(drop=True)
    return df

def compare(name, spark_df, oracle_df):
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"SCHEMA cols spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return f"ROWS spark={len(spark_df)} oracle={len(oracle_df)}"
    a, b = canon(spark_df), canon(oracle_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        # Driver-hash hazard: DuckDB HUGEINT (e.g. SUM over BIGINT) lands in
        # pandas as float64; the driver hashes 500.0 vs 500 as different even
        # though values are numerically equal. Flag any int-vs-float kind
        # split so the oracle SQL gets an explicit CAST(... AS BIGINT).
        if {av.dtype.kind, bv.dtype.kind} == {"i", "f"}:
            return (f"DTYPE col {col}: spark={av.dtype} oracle={bv.dtype} "
                    f"(driver hash would mismatch — CAST the oracle column)")
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float); bv = bv.astype(float)
            bad = ~((av.isna() & bv.isna()) | (av == bv))
            if bad.any():
                close = ((av - bv).abs() <= 1e-9 * (bv.abs() + 1)) | (av.isna() & bv.isna())
                n_exact_bad = int(bad.sum()); n_far = int((~close).sum())
                return (f"FLOAT col {col}: {n_exact_bad} not bit-equal, "
                        f"{n_far} beyond 1e-9 (first: spark={av[bad].iloc[0]!r} oracle={bv[bad].iloc[0]!r})")
        else:
            av2 = av.astype(object).where(pd.notna(av), None)
            bv2 = bv.astype(object).where(pd.notna(bv), None)
            neq = [i for i, (x, y) in enumerate(zip(av2, bv2)) if x != y and not (x is None and y is None)]
            if neq:
                i = neq[0]
                return f"VAL col {col}: {len(neq)} mismatches (first @{i}: spark={av2[i]!r} oracle={bv2[i]!r})"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: write a CORRECTNESS_r{N}.json-format report there
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    report = {}
    # self-describing header: Verify wrote the Spark run's _meta.json
    # (master/mode/git SHA/classes hash) into its dump dir — embed it,
    # plus the oracle side's own provenance, so the artifact names its
    # execution mode in-file (round-12 gap: the cluster artifact was
    # content-indistinguishable from a local run)
    meta_path = os.path.join(out_dir, "_meta.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    meta["oracle"] = f"duckdb {duckdb.__version__}"
    meta["checked_at"] = __import__("datetime").datetime.now(
        __import__("datetime").timezone.utc).isoformat()
    report["_meta"] = meta
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = n_weak = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            status = f"rows-only ({len(spark_df)} rows)"
            if len(spark_df) == 0:
                n_bad += 1; status += "  <-- EMPTY (weak check would fail)"
            else:
                n_weak += 1
            print(f"[weak] {name}: {status}")
            # weak = rows-only check: record it DISTINCTLY (nonempty is
            # not the same claim as "row counts match") so the artifact
            # never overstates what was verified
            report[name] = {"weak": True, "nonempty": len(spark_df) > 0,
                            "rows_match": None,
                            "schema_match": None, "hash_match": None,
                            "spark_rows": len(spark_df), "oracle_rows": None,
                            "err": None if len(spark_df) else "empty result"}
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_bad += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(spark_df),
                            "oracle_rows": None,
                            "err": f"oracle SQL error: {e}"}
            continue
        err = compare(name, spark_df, oracle_df)
        if err:
            print(f"[FAIL] {name}: {err}")
            n_bad += 1
        else:
            print(f"[ok]   {name} ({len(spark_df)} rows)")
            n_ok += 1
        report[name] = {
            "rows_match": len(spark_df) == len(oracle_df),
            "schema_match": sorted(spark_df.columns) == sorted(oracle_df.columns),
            "hash_match": err is None,
            "spark_rows": len(spark_df), "oracle_rows": len(oracle_df),
            "err": err}
    extra = set(oracle) - set(names)
    for name in sorted(extra):
        print(f"[FAIL] {name}: oracle present but no spark output")
        n_bad += 1
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": 0,
                        "oracle_rows": None,
                        "err": "oracle present but no spark output"}
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"[report] wrote {json_out}")
    print(f"\n{n_ok} ok, {n_weak} weak(rows-only), {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
