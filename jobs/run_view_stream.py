"""spark-submit job: maintain a materialized SPARQL view over a
triple-file stream (streaming/stream.py:start_query_stream).

    spark-submit --py-files nametag3_spark.zip jobs/run_view_stream.py \
        --input /stream/in --store /kg/store --view /kg/view \
        --checkpoint /kg/ckpt \
        --sparql "SELECT ?t (COUNT(?x) AS ?n) WHERE { ?x type ?t } GROUP BY ?t"

Runs one availableNow pass (drain everything currently in --input,
update the view, exit) — schedule it like compact_store.py, or loop it
for a long-running maintainer. Exactly-once per epoch: re-running
after a crash rewrites the same store/view partitions. Prints one JSON
line with the current view's row count and latest epoch.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True,
                        help="parquet dir a producer appends triple files to")
    parser.add_argument("--store", required=True,
                        help="epoch-partitioned accumulated fact store")
    parser.add_argument("--view", required=True,
                        help="epoch-partitioned materialized view output")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--sparql", required=True,
                        help="SELECT or CONSTRUCT text query to maintain")
    parser.add_argument("--max-files-per-trigger", type=int, default=4)
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from pyspark.sql import functions as F

    from nametag3_spark.session import get_spark
    from nametag3_spark.streaming.stream import (
        read_query_view,
        start_query_stream,
    )

    start = time.perf_counter()
    spark = get_spark(master=args.master)
    q = start_query_stream(
        spark,
        args.input,
        args.store,
        args.view,
        args.checkpoint,
        args.sparql,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    q.awaitTermination()
    view = spark.read.parquet(args.view)
    latest = view.agg(F.max("epoch_id").alias("m")).collect()[0].m
    rows = read_query_view(spark, args.view).count()
    print(
        json.dumps(
            {
                "view_rows": rows,
                "latest_epoch": int(latest),
                "elapsed_sec": round(time.perf_counter() - start, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
