"""go_htmldate_spark.streaming"""
