from cuvs_lucene_spark.sources.catalog import IndexCatalog

__all__ = ["IndexCatalog"]
