"""go_htmldate_spark.plans"""
