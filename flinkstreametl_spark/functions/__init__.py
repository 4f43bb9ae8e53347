from flinkstreametl_spark.functions.exact import dec, dsum

__all__ = ["dec", "dsum"]
