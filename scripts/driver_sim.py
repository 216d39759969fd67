"""Local simulation of the driver's correctness gate (see
.claude/skills/verify/SKILL.md): entry() smoke + every queries() entry vs its
DuckDB oracle at sf0.01. Usage:
python scripts/driver_sim.py [sf_dir] [name_substr[,name_substr...]]"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from kf_task_fhir_etl_spark.session import get_spark

    spark = get_spark("driver-sim")
    if name_filter is None:
        rows = mod.entry(spark).collect()
        print(f"SMOKE entry(): rows={len(rows)}")
        assert rows, "entry() returned no rows"

    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = mod.queries(), mod.oracle_sql()
    if name_filter is not None:
        qs = {n: f for n, f in qs.items() if any(s in n for s in name_filter)}
    failures = []
    for name in sorted(qs):
        sdf = qs[name](spark, sf)
        scols = sorted(sdf.columns)
        sidx = [sdf.columns.index(c) for c in scols]
        sraw = sdf.collect()
        srows = sorted(
            [tuple(round(v, 6) if isinstance(v, float) else v for v in (r[i] for i in sidx)) for r in sraw],
            key=repr,
        )
        if name not in oracles:
            # the driver still canonicalizes rows-only results through a
            # pandas sort (r02 q57 crashed exactly there on an array column)
            try:
                p = sdf.toPandas()
                p.sort_values(by=list(p.columns), kind="mergesort")
            except TypeError as e:
                print(f"  {name}: CANON-ERROR (rows-only) {e}")
                failures.append(name)
                continue
            print(f"  {name}: rows-only check, rows={len(srows)}")
            continue
        res = con.execute(oracles[name])
        dcols_order = [d[0] for d in res.description]
        dcols = sorted(dcols_order)
        didx = [dcols_order.index(c) for c in dcols]
        draw = res.fetchall()
        drows = sorted(
            [tuple(round(v, 6) if isinstance(v, float) else v for v in (r[i] for i in didx)) for r in draw],
            key=repr,
        )
        # pandas-faithful dtype check: the real driver canonicalizes both
        # sides through pandas (.toPandas() / duckdb .df()) and hashes value
        # reprs, so a DuckDB HUGEINT (object dtype) vs Spark BIGINT (int64)
        # mismatch fails THERE even when python-int equality here passes
        # (r02 q71). Compare the str repr of every cell on the native
        # pandas frames after the same canonical sort.
        dtype_ok = True
        if dcols == scols:
            spd = sdf.toPandas()[scols]
            dpd = con.execute(oracles[name]).df()[scols]
            # exempt a column only when BOTH sides are float (rounded-value
            # equality above already covers it); int64-vs-float64 is exactly
            # the mismatch we must flag.
            import pandas.api.types as pt

            strict = [
                c
                for c in scols
                if not (pt.is_float_dtype(spd[c]) and pt.is_float_dtype(dpd[c]))
            ]

            def _canon_str(df):
                s = df[strict].astype(str) if strict else df.head(0)
                return s.sort_values(by=strict, kind="mergesort").reset_index(drop=True) if strict else s

            try:
                dtype_ok = _canon_str(spd).equals(_canon_str(dpd))
            except TypeError as e:  # unhashable list cell = driver CANON-ERROR
                print(f"  {name}: CANON-ERROR {e}")
                failures.append(name)
                continue
        ok = scols == dcols and srows == drows and dtype_ok
        status = "OK" if ok else ("DTYPE-MISMATCH" if srows == drows and scols == dcols else "MISMATCH")
        print(f"  {name}: cols={'OK' if scols == dcols else scols} rows={len(srows)}/{len(drows)} {status}")
        if not ok:
            failures.append(name)
            for a, b in zip(srows, drows):
                if a != b:
                    print(f"    spark: {a}\n    duck : {b}")
                    break
    spark.stop()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print(f"ALL {len(qs)} queries verified ({len(oracles)} with oracles)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
