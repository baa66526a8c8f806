"""awswrangler-shaped namespace: ``wr.athena`` -> ``spark.sql``-backed
implementations in :mod:`aws_sdk_pandas_spark.sql` (query dispatch, caching,
executions, prepared statements), :mod:`aws_sdk_pandas_spark.lakehouse`
(Iceberg DML) and :mod:`aws_sdk_pandas_spark.session` (Athena-for-Spark
veneers).  Pure re-export wiring; see each target for reference citations.
"""

from __future__ import annotations

from aws_sdk_pandas_spark.lakehouse import delete_from_iceberg_table, to_iceberg
from aws_sdk_pandas_spark.session import create_spark_session, run_spark_calculation
from aws_sdk_pandas_spark.sql import (
    create_athena_bucket,
    create_ctas_table,
    create_prepared_statement,
    delete_prepared_statement,
    describe_table,
    generate_create_query,
    get_named_query_statement,
    get_prepared_statement,
    get_query_columns_types,
    get_query_execution,
    get_query_executions,
    get_query_results,
    get_work_group,
    list_prepared_statements,
    list_query_executions,
    read_sql_query,
    read_sql_table,
    repair_table,
    show_create_table,
    start_query_execution,
    stop_query_execution,
    unload,
    wait_query,
)

__all__ = [
    "read_sql_query",
    "read_sql_table",
    "create_athena_bucket",
    "describe_table",
    "get_query_columns_types",
    "get_query_execution",
    "get_query_executions",
    "get_query_results",
    "get_named_query_statement",
    "get_prepared_statement",
    "get_work_group",
    "generate_create_query",
    "list_query_executions",
    "repair_table",
    "create_spark_session",
    "run_spark_calculation",
    "create_ctas_table",
    "show_create_table",
    "start_query_execution",
    "stop_query_execution",
    "unload",
    "wait_query",
    "create_prepared_statement",
    "list_prepared_statements",
    "delete_prepared_statement",
    "to_iceberg",
    "delete_from_iceberg_table",
]
