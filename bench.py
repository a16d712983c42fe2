"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "pipeline": {"turns": N, "turns_per_sec": N},
     "scaling": {"n_cores": .., "throughput_n": .., "4n_cores": ..,
                 "throughput_4n": .., "efficiency": ..}}

The scaling block is the sandbox proxy for the north rule's N→4N executor
criterion: the flagship pipeline job runs in TWO SEPARATE PROCESSES
(fresh JVM each) at local[N] and local[4N] on identical input; efficiency
= (throughput_4N / throughput_N) / 4. Disable with SPARK_GRAFT_SCALING=0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "tpch_q1",
    "join_orders_customer",
    "broadcast_dim_join",
    "sessionize",
    "carry_forward",
    "topk_per_group",
    "cube_breakdown",
    "dedup_exact",
    "token_stats",
    "langid",
    "minhash_dedup_pairs",
    "cosine_topk",
]


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _pipeline_sizes(sf: float) -> tuple[int, int]:
    if sf <= 0.001:
        return 50, 10
    if sf <= 0.01:
        return 200, 12
    return 2000, 15


def run_pipeline_job(master_cores: int, n_convs: int, avg_turns: int) -> dict:
    """One flagship pipeline run (no snapshot writes — pure dataflow
    throughput), returns {turns, elapsed_sec}. Called in-process."""
    from nametag3_spark.data.synth import gazetteer_df, synth_transcripts
    from nametag3_spark.operators.canonicalize import canonicalize_mentions
    from nametag3_spark.operators.infer import extract_mentions_flat
    from nametag3_spark.operators.linking import link_mentions
    from nametag3_spark.operators.triples import emit_triples
    from nametag3_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_pipeline_{master_cores}",
        master=f"local[{master_cores}]",
        shuffle_partitions=max(master_cores, 8),
    )
    transcripts = synth_transcripts(
        spark, n_convs=n_convs, avg_turns=avg_turns,
        partitions=max(master_cores * 2, 8),
    ).cache()
    n_turns = transcripts.count()  # materialize input outside the timing

    start = time.perf_counter()
    # persist the fan-out points: emit_triples scans its input 3×
    # (type/anchor/co-mention unions) and canonicalize twice more —
    # without caching, the Python scoring stage would recompute 5×
    mentions = extract_mentions_flat(transcripts).persist()
    linked = link_mentions(mentions, gazetteer_df(spark), fuzzy=False)
    canonical = canonicalize_mentions(linked).persist()
    triples = emit_triples(canonical)
    triples.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - start
    mentions.unpersist()
    canonical.unpersist()
    return {"turns": n_turns, "elapsed_sec": elapsed}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline-job":
        # subprocess mode for the scaling study (fresh JVM per level)
        cores, n_convs, avg_turns = map(int, sys.argv[2:5])
        print(json.dumps(run_pipeline_job(cores, n_convs, avg_turns)))
        return

    import __spark_entry__ as entry_mod
    from nametag3_spark.session import get_spark

    sf = _sf_from_dir(SF_DIR)
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        start = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    # flagship pipeline throughput at full parallelism
    n_convs, avg_turns = _pipeline_sizes(sf)
    pipe = run_pipeline_job(CPUS, n_convs, avg_turns)
    timings["pipeline_triples"] = round(pipe["elapsed_sec"], 3)
    turns_per_sec = round(pipe["turns"] / pipe["elapsed_sec"], 1)

    result = {
        "metric": "bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pipeline": {"turns": pipe["turns"], "turns_per_sec": turns_per_sec},
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        n = max(CPUS // 4, 1)
        runs = {}
        for cores in (n, CPUS):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--pipeline-job",
                 str(cores), str(n_convs), str(avg_turns)],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            runs[cores] = json.loads(out.stdout.strip().splitlines()[-1])
        thr_n = runs[n]["turns"] / runs[n]["elapsed_sec"]
        thr_4n = runs[CPUS]["turns"] / runs[CPUS]["elapsed_sec"]
        result["scaling"] = {
            "n_cores": n,
            "throughput_n": round(thr_n, 1),
            "4n_cores": CPUS,
            "throughput_4n": round(thr_4n, 1),
            "efficiency": round((thr_4n / thr_n) / (CPUS / n), 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
