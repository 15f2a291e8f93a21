"""go_htmldate_spark.sources"""
