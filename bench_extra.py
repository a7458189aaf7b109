"""Side benchmarks for the optimization round (bench.py is FROZEN).

Times individual queries()/operators with the noop sink (guide §1.4),
optionally dumping .explain("formatted") per query (guide §1/§7.2).

Usage:
  python bench_extra.py q <name> [<name>...]      # time named queries
  python bench_extra.py plans <dir> <name>...     # write explain files
  python bench_extra.py frontier                  # frontier section only
  python bench_extra.py suite                     # every headline query

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
Each query is timed N times (default 3, SPARK_GRAFT_REPS) after one warm
iteration of the flagship CDX query; results print per-run + min/median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def force(df):
    df.write.mode("overwrite").format("noop").save()


def get_session():
    from cdx_toolkit_spark.session import get_spark

    spark = get_spark("bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def time_queries(spark, names: list[str]) -> dict:
    import __spark_entry__ as E
    from cdx_toolkit_spark import similarity

    qs = E.queries()
    force(qs["iter_window_filter"](spark, SF_DIR))  # warm JVM/Arrow
    out = {}
    for name in names:
        samples = []
        for _ in range(REPS):
            E.release_caches(spark)  # each rep pays full cost (no memo reuse)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            force(df)
            samples.append(round(time.monotonic() - t0, 3))
            similarity.release(df)
        out[name] = {
            "samples": samples,
            "min": min(samples),
            "median": statistics.median(samples),
        }
        print(f"{name}: {out[name]}", flush=True)
    E.release_caches(spark)
    return out


def write_plans(spark, out_dir: str, names: list[str], suffix: str):
    import __spark_entry__ as E

    qs = E.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fd:
            fd.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
        print(f"wrote {path}", flush=True)
        E.release_caches(spark)


def frontier_bench(spark):
    import bench as B

    sf = B.sf_of(SF_DIR)
    n_urls = max(int(5_000_000 * sf), 10_000)
    out = {}
    spark.sparkContext.setJobDescription("bench_extra:frontier_drain")
    dt, n = B.bench_frontier(spark, n_urls)
    out["frontier_drain"] = {"wall": round(dt, 3), "scheduled": n}
    spark.sparkContext.setJobDescription("bench_extra:frontier_serial_3ep")
    dts, ns = B.bench_frontier_epochs(spark, n_urls, overlap=False)
    out["frontier_serial_3ep"] = {"wall": round(dts, 3), "scheduled": ns}
    spark.sparkContext.setJobDescription("bench_extra:frontier_pipelined_3ep")
    dtp, np_ = B.bench_frontier_epochs(spark, n_urls, overlap=True)
    out["frontier_pipelined_3ep"] = {"wall": round(dtp, 3), "scheduled": np_}
    for fpb in (2, 3, 6):
        spark.sparkContext.setJobDescription(f"bench_extra:stream_fpb{fpb}")
        dtq, nq, walls = B.bench_frontier_stream(spark, n_urls, files_per_batch=fpb)
        out[f"frontier_stream_fpb{fpb}"] = {
            "wall": round(dtq, 3), "scheduled": nq, "batch_walls": walls,
        }
    for k, v in out.items():
        print(f"{k}: {v}", flush=True)
    return out


HEADLINE = None  # filled from bench.py


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "suite"
    spark = get_session()
    if mode == "q":
        time_queries(spark, sys.argv[2:])
    elif mode == "plans":
        write_plans(spark, sys.argv[2], sys.argv[4:], sys.argv[3])
    elif mode == "frontier":
        frontier_bench(spark)
    elif mode == "suite":
        import bench as B  # reuse the frozen headline list

        src = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench.py")).read()
        names = []
        import re
        m = re.search(r"headline = \[(.*?)\]", src, re.S)
        for tok in re.findall(r'"([a-z0-9_]+)"', m.group(1)):
            names.append(tok)
        time_queries(spark, names)
    spark.stop()


if __name__ == "__main__":
    main()
