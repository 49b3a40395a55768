"""r18 probe: where does revenue_rollup's wall go, and why is it core-flat?

Runs the query warm, then measured, then dumps per-stage wall/executor time
from the local UI REST API (available in local mode).  Compare with
revenue_by_nation, which scales 1.46x on 8->32 cores while rollup sits at 1.0.

Usage: python tools/r18_rollup_probe.py [query ...]  (default: both)
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_financial_data_pipeline_spark.session import get_spark

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def stage_dump(ui: str, after_ms: int) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    out = []
    for s in stages:
        sub = s.get("submissionTime")
        if not sub:
            continue
        # "2026-08-18T05:20:01.123GMT" -> epoch ms
        t = time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")
        sub_ms = time.mktime(t) * 1000
        if sub_ms < after_ms - 1500:
            continue
        comp = s.get("completionTime")
        tc = time.strptime(comp[:19], "%Y-%m-%dT%H:%M:%S")
        frac = lambda x: int(x[20:23]) if len(x) > 22 else 0
        wall = (time.mktime(tc) * 1000 + frac(comp)) - (sub_ms + frac(sub))
        out.append(
            dict(
                stage=s["stageId"],
                tasks=s["numCompleteTasks"],
                wall_ms=int(wall),
                exec_ms=s["executorRunTime"],
                cpu_ms=s.get("executorCpuTime", 0) // 1_000_000,
                in_mb=round(s["inputBytes"] / 1e6, 1),
                sh_r_mb=round(s["shuffleReadBytes"] / 1e6, 2),
                sh_w_mb=round(s["shuffleWriteBytes"] / 1e6, 2),
                name=s["name"].split("\n")[0][:70],
            )
        )
    return sorted(out, key=lambda d: d["stage"])


def main() -> None:
    qnames = sys.argv[1:] or ["revenue_by_nation", "revenue_rollup"]
    spark = get_spark("r18-rollup-probe", extra_conf={"spark.ui.enabled": "true"})
    ui = "http://localhost:4040"
    qs = {**entrymod.queries(), **entrymod.BENCH_OVERRIDES}
    for name in qnames:
        fn = qs[name]
        noop(fn(spark, SF_DIR))  # warm-up (plan compile, page cache)
        spark.sparkContext.setJobDescription(f"r18probe:{name}")
        t0 = time.time()
        noop(fn(spark, SF_DIR))
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"\n=== {name}: wall {wall:.3f}s ===")
        for d in stage_dump(ui, t0 * 1000):
            print(
                f"  stage {d['stage']:>4} tasks={d['tasks']:>3} wall={d['wall_ms']:>6}ms "
                f"exec={d['exec_ms']:>6}ms cpu={d['cpu_ms']:>6}ms in={d['in_mb']:>6}MB "
                f"shR={d['sh_r_mb']:>7}MB shW={d['sh_w_mb']:>7}MB  {d['name']}"
            )


if __name__ == "__main__":
    main()
