"""spark-submit maintenance job: fold finalized streaming epochs into
the base partition (small-files compaction for the triple store).

    spark-submit --py-files nametag3_spark.zip jobs/compact_store.py \
        --store /path/to/triples_out [--keep-last 2] [--target-files 4]

Run out-of-band (cron / workflow scheduler) against the directory a
`streaming/stream.py` sink writes. Prints one JSON line with the
epochs folded and the resulting file count. Safe to re-run: the
compaction manifest makes repeated invocations idempotent and repairs
a crash between manifest write and directory deletion.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--store", required=True,
                        help="epoch-partitioned parquet directory")
    parser.add_argument("--keep-last", type=int, default=2,
                        help="newest epochs left un-compacted (replay-safe)")
    parser.add_argument("--target-files", type=int, default=4,
                        help="files in the rewritten base partition")
    parser.add_argument("--epoch-col", default="epoch_id")
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from nametag3_spark.session import get_spark
    from nametag3_spark.sources.triplestore import compact_epochs

    spark = get_spark(app_name="compact_store", master=args.master)
    folded = compact_epochs(
        spark,
        args.store,
        keep_last=args.keep_last,
        target_files=args.target_files,
        epoch_col=args.epoch_col,
    )
    n_files = len(spark.read.parquet(args.store).inputFiles())
    print(json.dumps({"folded_epochs": folded, "files_now": n_files}))


if __name__ == "__main__":
    main()
