from dmp_crawler_spark.functions import strings, textstats  # noqa: F401
