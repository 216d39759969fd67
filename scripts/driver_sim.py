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
        ok = scols == dcols and srows == drows
        status = "OK" if ok else "MISMATCH"
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
