from cuvs_lucene_spark.streaming.ingest import incremental_add, stream_build

__all__ = ["incremental_add", "stream_build"]
