"""go_htmldate_spark.dom"""
