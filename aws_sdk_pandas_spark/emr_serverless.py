"""EMR Serverless applications + job runs against the LOCAL execution
model (reference: awswrangler/emr_serverless.py — ``create_application``
:46, ``run_job`` :141, ``wait_job`` :228, and the ``SparkSubmitJobArgs``
/ ``HiveRunJobArgs`` TypedDicts :23/:34).

``create_application`` registers the application with the reference's
exact ``create_application`` request shape (assertable via
``describe_application``).  ``run_job`` EXECUTES the job driver:

- Spark jobs (``{"entryPoint": script.py, "entryPointArguments": [...],
  "sparkSubmitParameters": "--conf ..."}``) run the entry point
  IN-PROCESS on the live session via the same runner the EMR step path
  uses (``emr._run_spark_submit``), so ``getOrCreate()`` inside the
  script lands on the local "serverless application".
- Hive jobs (``{"query": path-to-.sql, "parameters": ...}``) read the
  query file and execute each ``;``-separated statement through
  ``spark.sql`` — Spark IS the local HiveQL engine.

Job-run states use the service vocabulary: SUCCESS / FAILED, with
``wait_job`` returning the final ``get_job_run``-shaped response dict.
"""

from __future__ import annotations

import itertools
from typing import Any, TypedDict

from aws_sdk_pandas_spark.exceptions import InvalidArgument

_APPS: dict[str, dict[str, Any]] = {}
_IDS = itertools.count(1)


class SparkSubmitJobArgs(TypedDict, total=False):
    """reference: emr_serverless.py:23."""

    entryPoint: str
    entryPointArguments: list[str]
    sparkSubmitParameters: str


class HiveRunJobArgs(TypedDict, total=False):
    """reference: emr_serverless.py:34."""

    query: str
    initQueryFile: str
    parameters: str


def create_application(
    name: str,
    release_label: str,
    application_type: str = "Spark",
    initial_capacity: dict[str, Any] | None = None,
    maximum_capacity: dict[str, Any] | None = None,
    tags: dict[str, str] | None = None,
    autostart: bool = True,
    autostop: bool = True,
    idle_timeout: int = 15,
    network_configuration: dict[str, Any] | None = None,
    architecture: str = "X86_64",
    image_uri: str | None = None,
    worker_type_specifications: dict[str, Any] | None = None,
    boto3_session: Any = None,
) -> str:
    """reference: emr_serverless.py:46 — the request dict matches the
    service's ``create_application`` shape field for field."""
    if application_type not in ("Spark", "Hive"):
        raise InvalidArgument("application_type must be 'Spark' or 'Hive'")
    args: dict[str, Any] = {
        "name": name,
        "releaseLabel": release_label,
        "type": application_type,
        "autoStartConfiguration": {"enabled": autostart},
        "autoStopConfiguration": {"enabled": autostop, "idleTimeoutMinutes": idle_timeout},
        "architecture": architecture,
    }
    if initial_capacity:
        args["initialCapacity"] = initial_capacity
    if maximum_capacity:
        args["maximumCapacity"] = maximum_capacity
    if tags:
        args["tags"] = tags
    if network_configuration:
        args["networkConfiguration"] = network_configuration
    if worker_type_specifications:
        args["workerTypeSpecifications"] = worker_type_specifications
    if image_uri:
        args["imageConfiguration"] = {"imageUri": image_uri}
    app_id = f"app-{next(_IDS):08d}"
    _APPS[app_id] = {"id": app_id, "request": args, "state": "CREATED", "jobs": {}}
    return app_id


def _app(application_id: str) -> dict[str, Any]:
    if application_id not in _APPS:
        raise InvalidArgument(f"unknown application_id {application_id!r}")
    return _APPS[application_id]


def describe_application(application_id: str) -> dict[str, Any]:
    """Local extension: the assembled create_application request."""
    return _app(application_id)["request"]


def _split_statements(text: str) -> list[str]:
    """Split a HiveQL script on ``;`` with string literals shielded — a
    semicolon inside ``'a;b'`` OR ``"a;b"`` is data (Hive/Spark accept
    both quote styles for strings), and a ``;`` inside a ``--`` line
    comment or a ``/* */`` block comment is not a boundary either.
    Handles backslash and doubled-quote escapes inside literals."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in "'\"":
            j = i + 1
            while j < n:
                if text[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if text[j] == c and j + 1 < n and text[j + 1] == c:
                    j += 2
                    continue
                if text[j] == c:
                    break
                j += 1
            if j >= n:
                raise InvalidArgument("unterminated string literal in SQL script")
            buf.append(text[i : j + 1])
            i = j + 1
        elif c == "-" and i + 1 < n and text[i + 1] == "-":
            nl = text.find("\n", i)
            i = n if nl == -1 else nl  # keep the newline as whitespace
        elif c == "/" and i + 1 < n and text[i + 1] == "*":
            end = text.find("*/", i + 2)
            if end == -1:
                raise InvalidArgument("unterminated /* */ comment in SQL script")
            buf.append(" ")  # preserve a separator where the comment was
            i = end + 2
        elif c == ";":
            stmts.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(c)
            i += 1
    stmts.append("".join(buf))
    return [s for s in (st.strip() for st in stmts) if s]


def _run_hive(job: dict[str, Any], driver: dict[str, Any]) -> None:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise InvalidArgument("Hive job needs an active SparkSession")
    path = driver["query"]
    with open(path.removeprefix("file://")) as fh:
        text = fh.read()
    for stmt in _split_statements(text):
        spark.sql(stmt)
    job["state"] = "SUCCESS"


def run_job(
    application_id: str,
    execution_role_arn: str,
    job_driver_args: dict[str, Any],
    job_type: str = "Spark",
    wait: bool = True,
    configuration_overrides: dict[str, Any] | None = None,
    tags: dict[str, str] | None = None,
    execution_timeout: int | None = None,
    name: str | None = None,
    boto3_session: Any = None,
    **_poll: Any,
) -> str | dict[str, Any]:
    """reference: emr_serverless.py:141 — returns the job-run id, or
    (``wait=True``, the reference's default) the final ``get_job_run``
    response after executing the driver."""
    app = _app(application_id)
    app["state"] = "STARTED"
    job_id = f"jr-{next(_IDS):08d}"
    job: dict[str, Any] = {
        "applicationId": application_id,
        "jobRunId": job_id,
        "name": name,
        "executionRole": execution_role_arn,
        "state": "RUNNING",
        "stateDetails": "",
        "tags": tags or {},
        "jobDriver": (
            {"sparkSubmit": job_driver_args} if job_type == "Spark" else {"hive": job_driver_args}
        ),
    }
    app["jobs"][job_id] = job
    try:
        if job_type == "Spark":
            from aws_sdk_pandas_spark.emr import _run_spark_submit

            argv = ["spark-submit"]
            params = job_driver_args.get("sparkSubmitParameters")
            if params:
                argv += str(params).split()
            argv.append(job_driver_args["entryPoint"])
            argv += list(job_driver_args.get("entryPointArguments") or [])
            shim = {"state": "PENDING"}
            _run_spark_submit(argv, shim)
            job["state"] = "SUCCESS" if shim["state"] == "COMPLETED" else "FAILED"
        elif job_type == "Hive":
            _run_hive(job, job_driver_args)
        else:
            raise InvalidArgument("job_type must be 'Spark' or 'Hive'")
    except Exception as exc:  # noqa: BLE001 — surfaced on the run record
        job["state"] = "FAILED"
        job["stateDetails"] = f"{type(exc).__name__}: {exc}"
    if wait:
        response = wait_job(application_id, job_id)
        if response["jobRun"]["state"] != "SUCCESS":
            raise InvalidArgument(
                f"job run {job_id} finished {response['jobRun']['state']}: "
                f"{response['jobRun']['stateDetails']}"
            )
        return response
    return job_id


def wait_job(
    application_id: str, job_run_id: str, boto3_session: Any = None, **_poll: Any
) -> dict[str, Any]:
    """reference: emr_serverless.py:228 — the ``get_job_run`` response
    (jobs run synchronously locally, so this never actually polls)."""
    app = _app(application_id)
    if job_run_id not in app["jobs"]:
        raise InvalidArgument(f"unknown job_run_id {job_run_id!r}")
    return {"jobRun": dict(app["jobs"][job_run_id])}
