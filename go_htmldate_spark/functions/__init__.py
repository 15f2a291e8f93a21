"""go_htmldate_spark.functions"""
