from sql_redshift_etl_spark.plans.registry import Query, register, all_queries, query_fns, oracle_map

__all__ = ["Query", "register", "all_queries", "query_fns", "oracle_map"]
