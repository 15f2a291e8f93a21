"""go_htmldate_spark.operators"""
