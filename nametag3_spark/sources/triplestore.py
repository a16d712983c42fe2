"""Physical layout for a materialized (subj, pred, obj) triple store.

The BGP compiler's two scan-side levers (`operators/bgp.py` module
docstring) both come from layout, not from the query plan:

* **predicate partitioning**: a pattern with a literal predicate reads
  exactly one ``pred=…`` directory (partition pruning) instead of
  scanning the store;
* **subject bucketing** (+ in-bucket sort): every star-join leg arrives
  pre-hashed on ``subj``, so the self-joins the SPARQL core is made of
  run WITHOUT a shuffle exchange — the dominant cost of a 100 TB BGP
  is paid once, at write time.

This is the parquet/metastore analog of the Iceberg layout the north
rule targets (partition spec + sorted write distribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_triple_store(
    df: DataFrame,
    table: str,
    n_buckets: int = 32,
    subj_col: str = "subj",
    pred_col: str = "pred",
) -> None:
    """Persist triples partitioned by predicate and bucketed+sorted on
    subject. ``n_buckets`` should track corpus size (buckets are the
    join parallelism floor; 32 suits the test scale, thousands suit
    100 TB)."""
    (
        df.write.mode("overwrite")
        .partitionBy(pred_col)
        .bucketBy(n_buckets, subj_col)
        .sortBy(subj_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_triple_store(spark: SparkSession, table: str) -> DataFrame:
    """Read back with bucketing metadata intact (``spark.table``, not a
    path read — a plain parquet path read would drop the bucket spec
    and reintroduce the exchange)."""
    return spark.table(table)
