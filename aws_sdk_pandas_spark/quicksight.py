"""QuickSight BI layer (reference: awswrangler/quicksight/_create.py:190,
272,449, _delete.py, _describe.py, _get_list.py, _cancel.py — ~35 public
functions, 1992 LoC of boto3 wiring).

The reference manages QuickSight account objects over HTTP.  Here the
same surface runs against a LOCAL BI catalog with the semantics that
have engine content made real:

- **data sources** point at the SQL engine (the Athena/workgroup analog
  is the SparkSession);
- **datasets** carry a table or SQL definition plus the logical-table
  transformations (``rename_columns``, ``cast_columns_types``) — and
  those transformations actually APPLY when the dataset is read or
  ingested, exactly what QuickSight's RenameColumnOperation /
  CastColumnTypeOperation do;
- **SPICE ingestions** actually MATERIALIZE: ``create_ingestion``
  executes the dataset and snapshots it as parquet under ``SPICE_ROOT``
  (one directory per ingestion — QuickSight's import-into-SPICE), and a
  SPICE dataset read serves the latest completed snapshot while a
  DIRECT_QUERY dataset always hits the engine live;
- dashboards / templates / users / groups are metadata CRUD over the
  local account model (``register_*`` extensions seed them), with the
  reference's lookup semantics: ``get_*_id`` raises on zero matches and
  on ambiguity, ``get_*_ids`` returns all matches.

``account_id`` / ``boto3_session`` / ``namespace`` parameters are
accepted for call-site parity and ignored (single local account).
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark.exceptions import InvalidArgument

# the local account model
_DATA_SOURCES: dict[str, dict[str, Any]] = {}  # id -> record
_DATASETS: dict[str, dict[str, Any]] = {}
_DASHBOARDS: dict[str, dict[str, Any]] = {}
_TEMPLATES: dict[str, dict[str, Any]] = {}
_INGESTIONS: dict[str, list[dict[str, Any]]] = {}  # dataset_id -> [records]
_USERS: list[dict[str, Any]] = []
_GROUPS: list[dict[str, Any]] = []
_MEMBERSHIPS: dict[str, list[str]] = {}  # group -> [user names]
_POLICY_ASSIGNMENTS: list[dict[str, Any]] = []

SPICE_ROOT = os.path.join(tempfile.gettempdir(), "asps_spice")


def _spark(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise InvalidArgument("no active SparkSession; pass spark=")
    return s


def _arn(kind: str, obj_id: str) -> str:
    return f"arn:aws:quicksight:::{kind}/{obj_id}"


# ---------------------------------------------------------------------------
# create (reference: quicksight/_create.py:190, 272, 449)
# ---------------------------------------------------------------------------


def create_athena_data_source(
    name: str,
    workgroup: str = "primary",
    allowed_to_use: list[str] | None = None,
    allowed_to_manage: list[str] | None = None,
    tags: dict[str, str] | None = None,
    account_id: str | None = None,
    boto3_session: Any = None,
    namespace: str = "default",
) -> None:
    """reference: quicksight/_create.py:190 — the data source points at
    the SQL engine; duplicate names rejected as the service does."""
    if get_data_source_ids(name):
        raise InvalidArgument(f"data source {name!r} already exists")
    ds_id = uuid.uuid4().hex[:16]
    _DATA_SOURCES[ds_id] = {
        "DataSourceId": ds_id,
        "Arn": _arn("datasource", ds_id),
        "Name": name,
        "Type": "ATHENA",
        "Workgroup": workgroup,
        "AllowedToUse": list(allowed_to_use or []),
        "AllowedToManage": list(allowed_to_manage or []),
        "Tags": dict(tags or {}),
    }


def create_athena_dataset(
    name: str,
    database: str | None = None,
    table: str | None = None,
    sql: str | None = None,
    sql_name: str | None = None,
    data_source_name: str | None = None,
    data_source_arn: str | None = None,
    import_mode: str = "DIRECT_QUERY",
    allowed_to_use: list[str] | None = None,
    allowed_to_manage: list[str] | None = None,
    logical_table_alias: str = "LogicalTable",
    rename_columns: dict[str, str] | None = None,
    cast_columns_types: dict[str, str] | None = None,
    tag_columns: dict[str, list[dict[str, Any]]] | None = None,
    tags: dict[str, str] | None = None,
    account_id: str | None = None,
    boto3_session: Any = None,
    namespace: str = "default",
) -> str:
    """reference: quicksight/_create.py:272 — exactly one of
    (database+table) / sql; returns the dataset id.  The logical-table
    rename/cast operations are stored AND applied on every read/
    ingestion (QuickSight's RenameColumnOperation /
    CastColumnTypeOperation)."""
    if (table is None) == (sql is None):
        raise InvalidArgument("supply either database+table or sql, not both")
    if import_mode not in ("SPICE", "DIRECT_QUERY"):
        raise InvalidArgument(f"invalid import_mode {import_mode!r}")
    if get_dataset_ids(name):
        raise InvalidArgument(f"dataset {name!r} already exists")
    if data_source_name is not None and not get_data_source_ids(data_source_name):
        raise InvalidArgument(f"unknown data source {data_source_name!r}")
    dataset_id = uuid.uuid4().hex[:16]
    _DATASETS[dataset_id] = {
        "DataSetId": dataset_id,
        "Arn": _arn("dataset", dataset_id),
        "Name": name,
        "ImportMode": import_mode,
        "Database": database,
        "Table": table,
        "Sql": sql,
        "SqlName": sql_name or name,
        "LogicalTableAlias": logical_table_alias,
        "RenameColumns": dict(rename_columns or {}),
        "CastColumnsTypes": dict(cast_columns_types or {}),
        "TagColumns": dict(tag_columns or {}),
        "AllowedToUse": list(allowed_to_use or []),
        "AllowedToManage": list(allowed_to_manage or []),
        "Tags": dict(tags or {}),
        "DataSourceName": data_source_name,
    }
    _INGESTIONS[dataset_id] = []
    return dataset_id


def _dataset_frame(spark: SparkSession, rec: dict[str, Any]) -> DataFrame:
    """Execute the dataset definition + logical-table transformations."""
    from pyspark.sql import functions as F

    if rec["Sql"] is not None:
        df = spark.sql(rec["Sql"])
    else:
        qual = f"`{rec['Database']}`.`{rec['Table']}`" if rec["Database"] else f"`{rec['Table']}`"
        df = spark.table(qual)
    for old, new in rec["RenameColumns"].items():
        df = df.withColumnRenamed(old, new)
    for col, typ in rec["CastColumnsTypes"].items():
        df = df.withColumn(col, F.col(col).cast(typ))
    return df


def read_dataset(
    name: str | None = None,
    dataset_id: str | None = None,
    *,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Local extension: serve a dataset the way QuickSight's analyses
    consume it — DIRECT_QUERY executes live, SPICE serves the latest
    COMPLETED ingestion snapshot (and errors if none ran yet)."""
    rec = _DATASETS[_resolve_dataset_id(name, dataset_id)]
    s = _spark(spark)
    if rec["ImportMode"] == "DIRECT_QUERY":
        return _dataset_frame(s, rec)
    done = [i for i in _INGESTIONS[rec["DataSetId"]] if i["IngestionStatus"] == "COMPLETED"]
    if not done:
        raise InvalidArgument(
            f"SPICE dataset {rec['Name']!r} has no completed ingestion; run create_ingestion"
        )
    return s.read.parquet(done[-1]["Path"])


def _resolve_dataset_id(name: str | None, dataset_id: str | None) -> str:
    if (name is None) == (dataset_id is None):
        raise InvalidArgument("pass dataset_name OR dataset_id")
    if dataset_id is not None:
        if dataset_id not in _DATASETS:
            raise InvalidArgument(f"unknown dataset id {dataset_id!r}")
        return dataset_id
    return get_dataset_id(name)


def create_ingestion(
    dataset_name: str | None = None,
    dataset_id: str | None = None,
    ingestion_id: str | None = None,
    account_id: str | None = None,
    boto3_session: Any = None,
    *,
    spark: SparkSession | None = None,
) -> str:
    """reference: quicksight/_create.py:449 — a REAL SPICE import: the
    dataset executes and lands as a parquet snapshot under SPICE_ROOT;
    the ingestion record carries status + row count."""
    ds_id = _resolve_dataset_id(dataset_name, dataset_id)
    rec = _DATASETS[ds_id]
    if rec["ImportMode"] != "SPICE":
        raise InvalidArgument("ingestions require ImportMode='SPICE'")
    ing_id = ingestion_id or uuid.uuid4().hex[:16]
    path = os.path.join(SPICE_ROOT, ds_id, ing_id)
    df = _dataset_frame(_spark(spark), rec)
    df.write.mode("overwrite").parquet(path)
    n = _spark(spark).read.parquet(path).count()
    _INGESTIONS[ds_id].append(
        {
            "IngestionId": ing_id,
            "Arn": _arn("ingestion", ing_id),
            "IngestionStatus": "COMPLETED",
            "RowInfo": {"RowsIngested": n, "RowsDropped": 0},
            "Path": path,
        }
    )
    return ing_id


def cancel_ingestion(
    ingestion_id: str,
    dataset_name: str | None = None,
    dataset_id: str | None = None,
    account_id: str | None = None,
    boto3_session: Any = None,
) -> None:
    """reference: quicksight/_cancel.py — completed imports cannot be
    cancelled (the service errors the same way)."""
    ds_id = _resolve_dataset_id(dataset_name, dataset_id)
    for ing in _INGESTIONS[ds_id]:
        if ing["IngestionId"] == ingestion_id:
            if ing["IngestionStatus"] == "COMPLETED":
                raise InvalidArgument(f"ingestion {ingestion_id!r} already completed")
            ing["IngestionStatus"] = "CANCELLED"
            return
    raise InvalidArgument(f"unknown ingestion {ingestion_id!r}")


# ---------------------------------------------------------------------------
# registries for the objects the reference can only list/describe/delete
# (dashboards, templates, users, groups) — local create/register extensions
# ---------------------------------------------------------------------------


def register_dashboard(name: str, **attrs: Any) -> str:
    dash_id = uuid.uuid4().hex[:16]
    _DASHBOARDS[dash_id] = {"DashboardId": dash_id, "Name": name, **attrs}
    return dash_id


def register_template(name: str, **attrs: Any) -> str:
    tpl_id = uuid.uuid4().hex[:16]
    _TEMPLATES[tpl_id] = {"TemplateId": tpl_id, "Name": name, **attrs}
    return tpl_id


def register_user(user_name: str, email: str = "", role: str = "READER") -> None:
    _USERS.append({"UserName": user_name, "Email": email, "Role": role})


def register_group(group_name: str, members: list[str] | None = None) -> None:
    _GROUPS.append({"GroupName": group_name})
    _MEMBERSHIPS[group_name] = list(members or [])


def register_iam_policy_assignment(name: str, users: list[str] | None = None) -> None:
    _POLICY_ASSIGNMENTS.append({"AssignmentName": name, "Users": list(users or [])})


# ---------------------------------------------------------------------------
# get/list (reference: quicksight/_get_list.py — get_*_id raises on 0 and
# on >1 matches; get_*_ids returns every match)
# ---------------------------------------------------------------------------


def _ids_by_name(registry: dict[str, dict[str, Any]], name: str, key: str) -> list[str]:
    return [rec[key] for rec in registry.values() if rec["Name"] == name]


def _one(ids: list[str], kind: str, name: str) -> str:
    if not ids:
        raise InvalidArgument(f"no {kind} named {name!r}")
    if len(ids) > 1:
        raise InvalidArgument(f"multiple {kind}s named {name!r}: {ids}")
    return ids[0]


def get_data_source_ids(name: str, **_ignored: Any) -> list[str]:
    return _ids_by_name(_DATA_SOURCES, name, "DataSourceId")


def get_data_source_id(name: str, **_ignored: Any) -> str:
    return _one(get_data_source_ids(name), "data source", name)


def get_data_source_arns(name: str, **_ignored: Any) -> list[str]:
    return [r["Arn"] for r in _DATA_SOURCES.values() if r["Name"] == name]


def get_data_source_arn(name: str, **_ignored: Any) -> str:
    return _one(get_data_source_arns(name), "data source", name)


def get_dataset_ids(name: str, **_ignored: Any) -> list[str]:
    return _ids_by_name(_DATASETS, name, "DataSetId")


def get_dataset_id(name: str, **_ignored: Any) -> str:
    return _one(get_dataset_ids(name), "dataset", name)


def get_dashboard_ids(name: str, **_ignored: Any) -> list[str]:
    return _ids_by_name(_DASHBOARDS, name, "DashboardId")


def get_dashboard_id(name: str, **_ignored: Any) -> str:
    return _one(get_dashboard_ids(name), "dashboard", name)


def get_template_ids(name: str, **_ignored: Any) -> list[str]:
    return _ids_by_name(_TEMPLATES, name, "TemplateId")


def get_template_id(name: str, **_ignored: Any) -> str:
    return _one(get_template_ids(name), "template", name)


def list_data_sources(**_ignored: Any) -> list[dict[str, Any]]:
    return list(_DATA_SOURCES.values())


def list_datasets(**_ignored: Any) -> list[dict[str, Any]]:
    return list(_DATASETS.values())


def list_dashboards(**_ignored: Any) -> list[dict[str, Any]]:
    return list(_DASHBOARDS.values())


def list_templates(**_ignored: Any) -> list[dict[str, Any]]:
    return list(_TEMPLATES.values())


def list_ingestions(
    dataset_name: str | None = None, dataset_id: str | None = None, **_ignored: Any
) -> list[dict[str, Any]]:
    return [
        {k: v for k, v in i.items() if k != "Path"}
        for i in _INGESTIONS[_resolve_dataset_id(dataset_name, dataset_id)]
    ]


def list_users(**_ignored: Any) -> list[dict[str, Any]]:
    return list(_USERS)


def list_groups(**_ignored: Any) -> list[dict[str, Any]]:
    return list(_GROUPS)


def list_group_memberships(group_name: str, **_ignored: Any) -> list[dict[str, Any]]:
    if group_name not in _MEMBERSHIPS:
        raise InvalidArgument(f"unknown group {group_name!r}")
    return [{"MemberName": m} for m in _MEMBERSHIPS[group_name]]


def list_user_groups(user_name: str, **_ignored: Any) -> list[dict[str, Any]]:
    return [
        {"GroupName": g} for g, members in _MEMBERSHIPS.items() if user_name in members
    ]


def list_iam_policy_assignments(**_ignored: Any) -> list[dict[str, Any]]:
    return list(_POLICY_ASSIGNMENTS)


def list_iam_policy_assignments_for_user(user_name: str, **_ignored: Any) -> list[dict[str, Any]]:
    return [a for a in _POLICY_ASSIGNMENTS if user_name in a["Users"]]


# ---------------------------------------------------------------------------
# describe / delete (reference: quicksight/_describe.py, _delete.py)
# ---------------------------------------------------------------------------


def describe_data_source(
    name: str | None = None, data_source_id: str | None = None, **_ignored: Any
) -> dict[str, Any]:
    if (name is None) == (data_source_id is None):
        raise InvalidArgument("pass name OR data_source_id")
    ds_id = data_source_id or get_data_source_id(name)
    if ds_id not in _DATA_SOURCES:
        raise InvalidArgument(f"unknown data source id {ds_id!r}")
    return dict(_DATA_SOURCES[ds_id])


def describe_data_source_permissions(
    name: str | None = None, data_source_id: str | None = None, **_ignored: Any
) -> list[dict[str, Any]]:
    rec = describe_data_source(name=name, data_source_id=data_source_id)
    return [
        {"Principal": p, "Actions": ["quicksight:UseDataSource"]}
        for p in rec["AllowedToUse"]
    ] + [
        {"Principal": p, "Actions": ["quicksight:ManageDataSource"]}
        for p in rec["AllowedToManage"]
    ]


def describe_dataset(
    name: str | None = None, dataset_id: str | None = None, **_ignored: Any
) -> dict[str, Any]:
    return dict(_DATASETS[_resolve_dataset_id(name, dataset_id)])


def describe_dashboard(
    name: str | None = None, dashboard_id: str | None = None, **_ignored: Any
) -> dict[str, Any]:
    if (name is None) == (dashboard_id is None):
        raise InvalidArgument("pass name OR dashboard_id")
    dash_id = dashboard_id or get_dashboard_id(name)
    if dash_id not in _DASHBOARDS:
        raise InvalidArgument(f"unknown dashboard id {dash_id!r}")
    return dict(_DASHBOARDS[dash_id])


def describe_ingestion(
    ingestion_id: str,
    dataset_name: str | None = None,
    dataset_id: str | None = None,
    **_ignored: Any,
) -> dict[str, Any]:
    for ing in _INGESTIONS[_resolve_dataset_id(dataset_name, dataset_id)]:
        if ing["IngestionId"] == ingestion_id:
            return {k: v for k, v in ing.items() if k != "Path"}
    raise InvalidArgument(f"unknown ingestion {ingestion_id!r}")


def delete_data_source(
    name: str | None = None, data_source_id: str | None = None, **_ignored: Any
) -> None:
    ds_id = data_source_id or get_data_source_id(name)
    _DATA_SOURCES.pop(ds_id, None)


def delete_dataset(
    name: str | None = None, dataset_id: str | None = None, **_ignored: Any
) -> None:
    ds_id = _resolve_dataset_id(name, dataset_id)
    _DATASETS.pop(ds_id, None)
    _INGESTIONS.pop(ds_id, None)


def delete_dashboard(
    name: str | None = None, dashboard_id: str | None = None, **_ignored: Any
) -> None:
    dash_id = dashboard_id or get_dashboard_id(name)
    _DASHBOARDS.pop(dash_id, None)


def delete_template(
    name: str | None = None, template_id: str | None = None, **_ignored: Any
) -> None:
    tpl_id = template_id or get_template_id(name)
    _TEMPLATES.pop(tpl_id, None)


def delete_all_data_sources(**_ignored: Any) -> None:
    _DATA_SOURCES.clear()


def delete_all_datasets(**_ignored: Any) -> None:
    _DATASETS.clear()
    _INGESTIONS.clear()


def delete_all_dashboards(**_ignored: Any) -> None:
    _DASHBOARDS.clear()


def delete_all_templates(**_ignored: Any) -> None:
    _TEMPLATES.clear()
