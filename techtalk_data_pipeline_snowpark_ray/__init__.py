"""Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-creation of the *capabilities* of
``scalabreseGD/techtalk-data-pipeline-snowpark`` (a Snowpark/Snowflake
CDC demo: table streams -> merge upserts -> transactional commit ->
derived analytics) on ``ray.data.Dataset`` pipelines over zero-copy
Arrow batches.

Core data flow (one "tick" = one consumed change-stream delta):

    WAL segments (Parquet, lsn-range named)          # stream on TABLE/STAGE
      -> ray.data.read_parquet                       #   SnowflakeUtils.scala:46-66
      -> normalize (schema-registry cast/null-fill)  # jsonToFields, Implicits.scala:13-26
      -> bucket+salt partition (hash conv_id)        # [design: Snowflake micro-partitions]
      -> per-batch combiner collapse                 # pre-aggregation before shuffle
      -> groupby(shard).map_groups(BucketApplier)    # merge, SnowflakeUtilsOld.scala:84-109
      -> delta "runs" written per bucket
      -> atomic manifest publish (files + offset)    # executeInTransaction,
                                                     #   SnowflakeUtils.scala:36-45,68-81

Last-writer-wins resolution happens in a single associative fold
(:func:`techtalk_data_pipeline_snowpark_ray.stages.apply.collapse_events`)
reused by the combiner, the apply stage, compaction and snapshot reads.
"""

__version__ = "0.1.0"
