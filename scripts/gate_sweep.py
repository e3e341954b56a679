"""Full driver-gate simulation: every __spark_entry__.queries() entry vs
its oracle_sql() twin, compared the way the grading driver does (columns
sorted by name, rows sorted by all columns, float tolerance) — the
pre-round smoke that every registered gated query is green at the
driver's scale factor, not just the pytest sf0.001 replica.

Usage:  PYTHONPATH=. python scripts/gate_sweep.py [sf_dir]
        (default sf_dir: /root/testdata/sf0.01 — the driver's gate SF)

Prints one line per query (OK / MISMATCH / ERROR / rows-only) and exits
non-zero if anything failed. Round-3 run: 103/103 oracle-gated OK at
sf0.01, 5 rows-only ran clean.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from ttmf_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = entry.queries(), entry.oracle_sql()
    fails: list[str] = []
    for name, fn in queries.items():
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                print(
                    f"{name}: rows-only rows={len(got)} "
                    f"({time.time() - t0:.1f}s)",
                    flush=True,
                )
                continue
            exp = con.execute(oracles[name]).fetchdf()
            g, e = normalize(got), normalize(exp)
            ok = len(g) == len(e) and list(g.columns) == list(e.columns)
            why = (
                ""
                if ok
                else f"rows {len(g)} vs {len(e)} / cols "
                f"{list(g.columns)} vs {list(e.columns)}"
            )
            if ok:
                for c in g.columns:
                    a, b = g[c], e[c]
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        good = np.allclose(
                            a.astype(float), b.astype(float),
                            rtol=1e-9, atol=1e-9, equal_nan=True,
                        )
                    else:
                        good = (a.astype(str) == b.astype(str)).all()
                    if not good:
                        ok, why = False, f"col {c} values differ"
                        break
            status = "OK" if ok else f"MISMATCH ({why})"
            print(
                f"{name}: {status} rows={len(g)} ({time.time() - t0:.1f}s)",
                flush=True,
            )
            if not ok:
                fails.append(name)
        except Exception as ex:  # keep sweeping; report at the end
            print(
                f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
            fails.append(name)
    print(f"\nFAILED: {', '.join(fails) if fails else 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
