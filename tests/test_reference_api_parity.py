"""Reference API parity: every public name awswrangler 3.17.1 exports in
its in-scope namespaces resolves at the same path in this package.

The export lists below are transcribed from the reference's per-module
``__all__`` (e.g. /root/reference/awswrangler/s3/__init__.py) so a
reference user can port any call-site by swapping the import.  Every
reference namespace is implemented and checked below — emr /
emr_serverless run their steps and job drivers against the local Spark
session (see emr.py / emr_serverless.py docstrings).
"""

from __future__ import annotations

import importlib

import pytest

REFERENCE_EXPORTS: dict[str, list[str]] = {
    # /root/reference/awswrangler/s3/__init__.py
    "s3": [
        "copy_objects", "merge_datasets", "delete_objects", "describe_objects",
        "get_bucket_region", "size_objects", "does_object_exist", "list_buckets",
        "list_directories", "list_objects", "read_deltalake", "read_parquet",
        "read_parquet_metadata", "read_parquet_table", "read_orc",
        "read_orc_metadata", "read_orc_table", "read_csv", "read_fwf",
        "read_json", "wait_objects_exist", "wait_objects_not_exist",
        "select_query", "store_parquet_metadata", "to_parquet", "to_orc",
        "to_csv", "to_json", "to_deltalake", "to_deltalake_streaming",
        "to_excel", "read_excel", "download", "upload", "create_table_bucket",
        "create_namespace", "create_table", "delete_table_bucket",
        "delete_namespace", "delete_table", "from_iceberg", "to_iceberg",
        "create_vector_bucket", "delete_vector_bucket", "list_vector_buckets",
        "get_vector_bucket", "create_vector_index", "delete_vector_index",
        "list_vector_indexes", "get_vector_index", "put_vectors",
        "put_vectors_from_df", "get_vectors", "delete_vectors", "list_vectors",
        "query_vectors",
    ],
    # /root/reference/awswrangler/athena/__init__.py
    "athena": [
        "read_sql_query", "read_sql_table", "create_athena_bucket",
        "describe_table", "get_query_columns_types", "get_query_execution",
        "get_query_executions", "get_query_results",
        "get_named_query_statement", "get_work_group", "generate_create_query",
        "list_query_executions", "repair_table", "create_spark_session",
        "run_spark_calculation", "create_ctas_table", "show_create_table",
        "start_query_execution", "stop_query_execution", "unload", "wait_query",
        "create_prepared_statement", "list_prepared_statements",
        "delete_prepared_statement", "to_iceberg", "delete_from_iceberg_table",
    ],
    # /root/reference/awswrangler/catalog/__init__.py (public subset)
    "catalog": [
        "add_column", "add_csv_partitions", "add_json_partitions",
        "add_parquet_partitions", "add_orc_partitions", "does_table_exist",
        "delete_column", "drop_duplicated_columns", "extract_athena_types",
        "rename_duplicated_columns", "sanitize_column_name",
        "sanitize_dataframe_columns_names", "sanitize_table_name",
        "create_csv_table", "create_database", "create_parquet_table",
        "create_orc_table", "create_json_table", "overwrite_table_parameters",
        "upsert_table_parameters", "databases", "get_columns_comments",
        "get_columns_parameters", "get_connection", "get_csv_partitions",
        "get_databases", "get_parquet_partitions", "get_partitions",
        "get_table_description", "get_table_location",
        "get_table_number_of_versions", "get_table_parameters",
        "get_table_types", "get_table_versions", "get_tables", "search_tables",
        "table", "tables", "delete_database", "delete_table_if_exists",
        "delete_partitions", "delete_all_partitions",
    ],
    # /root/reference/awswrangler/cloudwatch.py
    "cloudwatch": [
        "start_query", "wait_query", "run_query", "read_logs",
        "describe_log_streams", "filter_log_events",
    ],
    # /root/reference/awswrangler/dynamodb/__init__.py
    "dynamodb": [
        "delete_items", "execute_statement", "get_table", "put_csv", "put_df",
        "put_items", "put_json", "read_partiql_query", "read_items",
    ],
    # /root/reference/awswrangler/timestream/__init__.py
    "timestream": [
        "create_database", "create_table", "delete_database", "delete_table",
        "list_databases", "list_tables", "query", "write", "batch_load",
        "batch_load_from_files", "wait_batch_load_task", "unload_to_files",
        "unload",
    ],
    # /root/reference/awswrangler/opensearch/__init__.py
    "opensearch": [
        "connect", "create_collection", "create_index", "delete_index",
        "index_csv", "index_documents", "index_df", "index_json", "search",
        "search_by_sql",
    ],
    # /root/reference/awswrangler/cleanrooms/__init__.py
    "cleanrooms": ["read_sql_query", "wait_query"],
    # /root/reference/awswrangler/data_api/__init__.py (+ rds.py, redshift.py)
    "data_api": ["rds", "redshift"],
    "data_api.rds": ["connect", "read_sql_query", "to_sql"],
    "data_api.redshift": ["connect", "read_sql_query"],
    # /root/reference/awswrangler/secretsmanager.py / sts.py / chime.py
    "secretsmanager": ["get_secret", "get_secret_json"],
    "sts": ["get_account_id", "get_current_identity_arn", "get_current_identity_name"],
    "chime": ["post_message"],
    # /root/reference/awswrangler/emr.py / emr_serverless.py
    "emr": [
        "create_cluster", "get_cluster_state", "terminate_cluster",
        "submit_steps", "submit_step", "build_step", "get_step_state",
        "submit_ecr_credentials_refresh", "build_spark_step",
        "submit_spark_step",
    ],
    "emr_serverless": ["create_application", "run_job", "wait_job"],
    # /root/reference/awswrangler/quicksight/__init__.py
    "quicksight": [
        "get_dashboard_id", "get_dashboard_ids", "get_data_source_arn",
        "get_data_source_arns", "get_data_source_id", "get_data_source_ids",
        "get_dataset_id", "get_dataset_ids", "get_template_id",
        "get_template_ids", "list_dashboards", "list_data_sources",
        "list_datasets", "list_group_memberships", "list_groups",
        "list_iam_policy_assignments", "list_iam_policy_assignments_for_user",
        "list_ingestions", "list_templates", "list_user_groups", "list_users",
        "describe_dashboard", "describe_data_source",
        "describe_data_source_permissions", "describe_dataset",
        "describe_ingestion", "delete_all_dashboards",
        "delete_all_data_sources", "delete_all_datasets",
        "delete_all_templates", "delete_dashboard", "delete_data_source",
        "delete_dataset", "delete_template", "cancel_ingestion",
        "create_athena_data_source", "create_athena_dataset",
        "create_ingestion",
    ],
    # /root/reference/awswrangler/neptune/__init__.py
    "neptune": [
        "execute_gremlin", "execute_opencypher", "execute_sparql",
        "to_property_graph", "to_rdf_graph", "connect", "bulk_load",
        "bulk_load_from_files", "GremlinParser", "flatten_nested_df",
        "BulkLoadParserConfiguration",
    ],
    # /root/reference/awswrangler/redshift/__init__.py
    "redshift": [
        "connect", "connect_temp", "copy", "copy_from_files", "read_sql_query",
        "read_sql_table", "to_sql", "unload", "unload_to_files",
    ],
    # flat connector modules
    "mysql": ["connect", "read_sql_query", "read_sql_table", "to_sql"],
    "postgresql": ["connect", "read_sql_query", "read_sql_table", "to_sql"],
    "oracle": ["connect", "read_sql_query", "read_sql_table", "to_sql"],
    "sqlserver": ["connect", "read_sql_query", "read_sql_table", "to_sql"],
    # /root/reference/awswrangler/data_quality/__init__.py
    "data_quality": [
        "create_recommendation_ruleset", "create_ruleset", "evaluate_ruleset",
        "get_ruleset", "update_ruleset",
    ],
}


@pytest.mark.parametrize("module", sorted(REFERENCE_EXPORTS))
def test_namespace_exports(module: str) -> None:
    mod = importlib.import_module(f"aws_sdk_pandas_spark.{module}")
    missing = [n for n in REFERENCE_EXPORTS[module] if not hasattr(mod, n)]
    assert not missing, f"aws_sdk_pandas_spark.{module} missing: {missing}"


def test_namespaces_reachable_from_package_root() -> None:
    import aws_sdk_pandas_spark as asps

    for module in REFERENCE_EXPORTS:
        assert hasattr(asps, module.split(".")[0]), module
