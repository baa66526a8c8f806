"""EMR cluster + step orchestration against a LOCAL execution model
(reference: awswrangler/emr.py — ``create_cluster`` :436,
``_build_cluster_args`` :107, ``build_step`` :886, ``build_spark_step``
:1020, ``submit_steps`` :805, ``get_step_state`` :941,
``terminate_cluster`` :784).

The reference assembles a ``run_job_flow`` request and ships it to the
EMR control plane; the engine content is (a) the request-assembly
semantics — instance groups, classifications, spark-defaults, docker
registries, glue-catalog wiring — and (b) the step contract
(``command-runner.jar`` / ``script-runner.jar`` argv).  Both are real
here: ``create_cluster`` builds and retains the full request dict
(assertable via ``describe_cluster_request``), and submitted steps
EXECUTE against the local Spark "cluster":

- ``spark-submit [--flags] script.py args...`` steps run the script
  IN-PROCESS with ``sys.argv`` patched — ``SparkSession.builder
  .getOrCreate()`` inside the script resolves to the live session, so
  the step genuinely runs on the same "cluster" that owns the step
  queue.  Because an EMR step must never tear down the cluster it runs
  on, ``spark.stop()`` inside a step script is intercepted for the
  duration of the step.
- ``script-runner.jar`` steps and plain commands run via
  ``subprocess`` with stdout/stderr captured on the step record.

States follow the service vocabulary: clusters ``WAITING`` ->
``TERMINATED``; steps ``PENDING`` -> ``RUNNING`` -> ``COMPLETED`` /
``FAILED`` (plus ``CANCELLED`` for the rest of a batch after a FAILED
step whose ActionOnFailure is CANCEL_AND_WAIT).
"""

from __future__ import annotations

import hashlib
import itertools
import subprocess
import sys
from typing import Any

from aws_sdk_pandas_spark.exceptions import InvalidArgument

_CLUSTERS: dict[str, dict[str, Any]] = {}
_IDS = itertools.count(1)


# --------------------------------------------------------------------------
# request assembly (reference: emr.py:107 _build_cluster_args)
# --------------------------------------------------------------------------


def _instance_group(
    role: str, instance_type: str, on_demand: int, spot: int, ebs_gib: int,
    bid_pct: int,
) -> list[dict[str, Any]]:
    groups: list[dict[str, Any]] = []
    ebs = {
        "EbsBlockDeviceConfigs": [
            {
                "VolumeSpecification": {"SizeInGB": ebs_gib, "VolumeType": "gp2"},
                "VolumesPerInstance": 1,
            }
        ],
        "EbsOptimized": True,
    }
    if on_demand > 0:
        groups.append(
            {
                "InstanceRole": role,
                "Market": "ON_DEMAND",
                "InstanceType": instance_type,
                "InstanceCount": on_demand,
                "EbsConfiguration": ebs,
                "Name": f"{role}-ON_DEMAND",
            }
        )
    if spot > 0:
        groups.append(
            {
                "InstanceRole": role,
                "Market": "SPOT",
                "InstanceType": instance_type,
                "InstanceCount": spot,
                "BidPriceAsPercentageOfOnDemandPrice": bid_pct,
                "EbsConfiguration": ebs,
                "Name": f"{role}-SPOT",
            }
        )
    return groups


def build_cluster_request(**pars: Any) -> dict[str, Any]:
    """Assemble the ``run_job_flow``-shaped request from the reference's
    ``create_cluster`` keyword surface (reference: emr.py:107).  Pure
    function — what the reference posts to the service, returned for
    assertion."""
    def p(name: str, default: Any = None) -> Any:
        return pars.get(name, default)

    applications = p("applications") or ["Spark"]
    req: dict[str, Any] = {
        "Name": p("cluster_name", "my-emr-cluster"),
        "ReleaseLabel": p("emr_release", "emr-6.7.0"),
        "LogUri": p("logging_s3_path") or f"file:///tmp/emr-logs/{p('cluster_name', 'my-emr-cluster')}",
        "Applications": [{"Name": a} for a in applications],
        "JobFlowRole": p("emr_ec2_role", "EMR_EC2_DefaultRole"),
        "ServiceRole": p("emr_role", "EMR_DefaultRole"),
        "VisibleToAllUsers": p("visible_to_all_users", True),
        "StepConcurrencyLevel": p("step_concurrency_level", 1),
        "Tags": [
            {"Key": k, "Value": v} for k, v in (p("tags") or {}).items()
        ],
        "Instances": {
            "KeepJobFlowAliveWhenNoSteps": p("keep_cluster_alive_when_no_steps", True),
            "TerminationProtected": p("termination_protected", False),
            "Ec2SubnetId": p("subnet_id", "subnet-local"),
            "InstanceGroups": (
                _instance_group(
                    "MASTER", p("instance_type_master", "r5.xlarge"),
                    p("instance_num_on_demand_master", 1),
                    p("instance_num_spot_master", 0),
                    p("instance_ebs_size_master", 64),
                    p("spot_bid_percentage_of_on_demand_master", 100),
                )
                + _instance_group(
                    "CORE", p("instance_type_core", "r5.xlarge"),
                    p("instance_num_on_demand_core", 0),
                    p("instance_num_spot_core", 0),
                    p("instance_ebs_size_core", 64),
                    p("spot_bid_percentage_of_on_demand_core", 100),
                )
                + _instance_group(
                    "TASK", p("instance_type_task", "r5.xlarge"),
                    p("instance_num_on_demand_task", 0),
                    p("instance_num_spot_task", 0),
                    p("instance_ebs_size_task", 64),
                    p("spot_bid_percentage_of_on_demand_task", 100),
                )
            ),
        },
    }
    if p("key_pair_name"):
        req["Instances"]["Ec2KeyName"] = pars["key_pair_name"]
    if p("security_group_master"):
        req["Instances"]["EmrManagedMasterSecurityGroup"] = pars["security_group_master"]
    if p("security_group_slave"):
        req["Instances"]["EmrManagedSlaveSecurityGroup"] = pars["security_group_slave"]
    if p("security_configuration"):
        req["SecurityConfiguration"] = pars["security_configuration"]
    if p("custom_ami_id"):
        req["CustomAmiId"] = pars["custom_ami_id"]
    if p("auto_termination_policy") is not None:
        req["AutoTerminationPolicy"] = pars["auto_termination_policy"]

    # classifications: the glue-catalog / spark tuning surface
    confs: list[dict[str, Any]] = list(p("custom_classifications") or [])
    glue = "com.amazonaws.glue.catalog.metastore.AWSGlueDataCatalogHiveClientFactory"
    if p("spark_glue_catalog", True):
        confs.append(
            {
                "Classification": "spark-hive-site",
                "Properties": {"hive.metastore.client.factory.class": glue},
            }
        )
    if p("hive_glue_catalog", True):
        confs.append(
            {
                "Classification": "hive-site",
                "Properties": {"hive.metastore.client.factory.class": glue},
            }
        )
    if p("presto_glue_catalog", True):
        confs.append(
            {
                "Classification": "presto-connector-hive",
                "Properties": {"hive.metastore.glue.datacatalog.enabled": "true"},
            }
        )
    spark_defaults = dict(p("spark_defaults") or {})
    if p("spark_jars_path"):
        spark_defaults["spark.jars"] = ",".join(pars["spark_jars_path"])
    if p("maximize_resource_allocation", False):
        confs.append(
            {
                "Classification": "spark",
                "Properties": {"maximizeResourceAllocation": "true"},
            }
        )
    if p("spark_pyarrow", False):
        spark_defaults["spark.sql.execution.arrow.pyspark.enabled"] = "true"
        confs.append(
            {
                "Classification": "spark-env",
                "Properties": {},
                "Configurations": [
                    {
                        "Classification": "export",
                        "Properties": {"ARROW_PRE_0_15_IPC_FORMAT": "1"},
                    }
                ],
            }
        )
    if spark_defaults:
        confs.append({"Classification": "spark-defaults", "Properties": spark_defaults})
    if p("spark_log_level"):
        confs.append(
            {
                "Classification": "spark-log4j",
                "Properties": {"log4j.rootCategory": f"{pars['spark_log_level']}, console"},
            }
        )
    if p("docker", False):
        registries = ["local"] + list(p("extra_public_registries") or [])
        confs.append(
            {
                "Classification": "container-executor",
                "Properties": {},
                "Configurations": [
                    {
                        "Classification": "docker",
                        "Properties": {
                            "docker.privileged-containers.registries": ",".join(registries),
                            "docker.trusted.registries": ",".join(registries),
                        },
                    }
                ],
            }
        )
    if confs:
        req["Configurations"] = confs
    if p("bootstraps_paths"):
        req["BootstrapActions"] = [
            {"Name": path, "ScriptBootstrapAction": {"Path": path}}
            for path in pars["bootstraps_paths"]
        ]
    if p("steps"):
        req["Steps"] = pars["steps"]
    return req


# --------------------------------------------------------------------------
# lifecycle
# --------------------------------------------------------------------------


def create_cluster(subnet_id: str = "subnet-local", **pars: Any) -> str:
    """reference: emr.py:436 ``create_cluster`` — build the full request,
    register the local cluster, and run any inline ``steps``."""
    req = build_cluster_request(subnet_id=subnet_id, **pars)
    cluster_id = f"j-{next(_IDS):08d}"
    _CLUSTERS[cluster_id] = {
        "id": cluster_id,
        "request": req,
        "state": "WAITING",
        "steps": {},
        "step_order": [],
    }
    if req.get("Steps"):
        submit_steps(cluster_id, req["Steps"])
    return cluster_id


def _cluster(cluster_id: str) -> dict[str, Any]:
    if cluster_id not in _CLUSTERS:
        raise InvalidArgument(f"unknown cluster_id {cluster_id!r}")
    return _CLUSTERS[cluster_id]


def describe_cluster_request(cluster_id: str) -> dict[str, Any]:
    """Local extension: the assembled ``run_job_flow`` request — what the
    reference would have posted to the service."""
    return _cluster(cluster_id)["request"]


def get_cluster_state(cluster_id: str, boto3_session: Any = None) -> str:
    """reference: emr.py:754."""
    return _cluster(cluster_id)["state"]


def terminate_cluster(cluster_id: str, boto3_session: Any = None) -> None:
    """reference: emr.py:784."""
    c = _cluster(cluster_id)
    if c["request"]["Instances"].get("TerminationProtected"):
        raise InvalidArgument(
            f"cluster {cluster_id} is termination-protected; disable "
            "TerminationProtected before terminating"
        )
    c["state"] = "TERMINATED"


# --------------------------------------------------------------------------
# steps
# --------------------------------------------------------------------------

_SCRIPT_RUNNER = "script-runner.jar"


def build_step(
    command: str,
    name: str = "my-step",
    action_on_failure: str = "CONTINUE",
    script: bool = False,
    region: str | None = None,
    boto3_session: Any = None,
) -> dict[str, Any]:
    """reference: emr.py:886 — the exact HadoopJarStep contract:
    ``command-runner.jar`` with the whitespace-split command, or the
    regional script-runner jar when ``script=True``."""
    jar = "command-runner.jar"
    if script:
        jar = f"s3://{region or 'us-east-1'}.elasticmapreduce/libs/script-runner/script-runner.jar"
    return {
        "Name": name,
        "ActionOnFailure": action_on_failure,
        "HadoopJarStep": {"Jar": jar, "Args": command.split(" ")},
    }


def build_spark_step(
    path: str,
    args: list[str] | None = None,
    deploy_mode: str = "cluster",
    docker_image: str | None = None,
    name: str = "my-step",
    action_on_failure: str = "CONTINUE",
    region: str | None = None,
    boto3_session: Any = None,
) -> dict[str, Any]:
    """reference: emr.py:1020 — ``spark-submit --deploy-mode <m> <path>
    <args>``; a docker image adds the YARN container-runtime confs."""
    script_args = " ".join(args) if args else ""
    if docker_image is None:
        cmd = f"spark-submit --deploy-mode {deploy_mode} {path} {script_args}"
    else:
        pairs = [
            ("YARN_CONTAINER_RUNTIME_TYPE", "docker"),
            ("YARN_CONTAINER_RUNTIME_DOCKER_IMAGE", docker_image),
        ]
        confs = " ".join(
            f"--conf spark.{scope}.{k}={v}"
            for scope in ("executorEnv", "yarn.appMasterEnv")
            for k, v in pairs
        )
        cmd = f"spark-submit --deploy-mode {deploy_mode} {confs} {path} {script_args}"
    return build_step(
        command=cmd.strip(), name=name, action_on_failure=action_on_failure,
        script=False, region=region,
    )


# spark-submit's real flag inventory (SparkSubmitArguments.scala): flags
# that take no value vs flags that consume the next token.  Guessing
# "every flag takes a value" made --verbose swallow the script path.
_SPARK_SUBMIT_BOOLEAN_FLAGS = {"--verbose", "-v", "--supervise", "--version", "--help", "-h"}
_SPARK_SUBMIT_VALUE_FLAGS = {
    "--master", "--deploy-mode", "--class", "--name", "--jars", "--packages",
    "--exclude-packages", "--repositories", "--py-files", "--files", "--archives",
    "--conf", "-c", "--properties-file", "--driver-memory", "--driver-java-options",
    "--driver-library-path", "--driver-class-path", "--executor-memory",
    "--proxy-user", "--driver-cores", "--total-executor-cores", "--executor-cores",
    "--num-executors", "--queue", "--principal", "--keytab",
}


def _run_spark_submit(argv: list[str], step: dict[str, Any]) -> None:
    """Execute a spark-submit step in-process on the live session."""
    import runpy

    from pyspark.sql import SparkSession

    i = 1
    script = None
    script_args: list[str] = []
    while i < len(argv):
        tok = argv[i]
        if tok.startswith("-"):
            if tok in _SPARK_SUBMIT_BOOLEAN_FLAGS:
                i += 1
            elif tok in _SPARK_SUBMIT_VALUE_FLAGS:
                if i + 1 >= len(argv):
                    raise InvalidArgument(
                        f"spark-submit flag {tok} is missing its value: {argv}"
                    )
                i += 2
            else:
                raise InvalidArgument(
                    f"unrecognized spark-submit flag {tok!r} in {argv}; "
                    "known value flags: " + ", ".join(sorted(_SPARK_SUBMIT_VALUE_FLAGS))
                )
            continue
        script = tok
        script_args = argv[i + 1 :]
        break
    if script is None:
        raise InvalidArgument(f"spark-submit step has no script: {argv}")
    old_argv = sys.argv
    old_stop = SparkSession.stop
    sys.argv = [script] + list(script_args)
    SparkSession.stop = lambda self: None  # a step must not kill the cluster
    try:
        try:
            runpy.run_path(script, run_name="__main__")
        except SystemExit as exc:  # sys.exit(0) is a normal script ending
            if exc.code not in (None, 0):
                raise RuntimeError(f"script exited with code {exc.code}") from exc
        step["state"] = "COMPLETED"
    finally:
        sys.argv = old_argv
        SparkSession.stop = old_stop


def submit_steps(
    cluster_id: str, steps: list[dict[str, Any]], boto3_session: Any = None
) -> list[str]:
    """reference: emr.py:805 — and the steps RUN, synchronously, against
    the local cluster.  FAILED + CANCEL_AND_WAIT/TERMINATE_* honors the
    ActionOnFailure contract (remaining steps cancelled / cluster
    terminated)."""
    c = _cluster(cluster_id)
    if c["state"] == "TERMINATED":
        raise InvalidArgument(f"cluster {cluster_id} is terminated")
    ids: list[str] = []
    cancelled = False
    for spec in steps:
        step_id = "s-" + hashlib.md5(
            f"{cluster_id}:{len(c['step_order'])}:{spec.get('Name')}".encode()
        ).hexdigest()[:16]
        step = {"id": step_id, "spec": spec, "state": "PENDING", "stdout": "", "stderr": ""}
        c["steps"][step_id] = step
        c["step_order"].append(step_id)
        ids.append(step_id)
        if cancelled:
            step["state"] = "CANCELLED"
            continue
        argv = list(spec["HadoopJarStep"]["Args"])
        jar = spec["HadoopJarStep"]["Jar"]
        step["state"] = "RUNNING"
        try:
            if argv and argv[0] == "spark-submit":
                _run_spark_submit(argv, step)
            else:
                if _SCRIPT_RUNNER in jar:
                    argv = ["bash"] + argv
                proc = subprocess.run(argv, capture_output=True, text=True, timeout=600)
                step["stdout"], step["stderr"] = proc.stdout, proc.stderr
                step["state"] = "COMPLETED" if proc.returncode == 0 else "FAILED"
        except Exception as exc:  # noqa: BLE001 — the step record carries the error
            step["state"] = "FAILED"
            step["stderr"] = f"{type(exc).__name__}: {exc}"
        if step["state"] == "FAILED":
            action = spec.get("ActionOnFailure", "CONTINUE")
            if action == "CANCEL_AND_WAIT":
                cancelled = True
            elif action in ("TERMINATE_CLUSTER", "TERMINATE_JOB_FLOW"):
                c["state"] = "TERMINATED"
                cancelled = True
    return ids


def submit_step(
    cluster_id: str,
    command: str,
    name: str = "my-step",
    action_on_failure: str = "CONTINUE",
    script: bool = False,
    boto3_session: Any = None,
) -> str:
    """reference: emr.py:835."""
    step = build_step(command=command, name=name, action_on_failure=action_on_failure, script=script)
    return submit_steps(cluster_id, [step])[0]


def submit_spark_step(
    cluster_id: str,
    path: str,
    args: list[str] | None = None,
    deploy_mode: str = "cluster",
    docker_image: str | None = None,
    name: str = "my-step",
    action_on_failure: str = "CONTINUE",
    region: str | None = None,
    boto3_session: Any = None,
) -> str:
    """reference: emr.py:1093."""
    step = build_spark_step(
        path=path, args=args, deploy_mode=deploy_mode, docker_image=docker_image,
        name=name, action_on_failure=action_on_failure, region=region,
    )
    return submit_steps(cluster_id, [step])[0]


def get_step_state(cluster_id: str, step_id: str, boto3_session: Any = None) -> str:
    """reference: emr.py:941."""
    c = _cluster(cluster_id)
    if step_id not in c["steps"]:
        raise InvalidArgument(f"unknown step_id {step_id!r}")
    return c["steps"][step_id]["state"]


def describe_step(cluster_id: str, step_id: str) -> dict[str, Any]:
    """Local extension: the full step record (spec, state, stdout/stderr)."""
    c = _cluster(cluster_id)
    if step_id not in c["steps"]:
        raise InvalidArgument(f"unknown step_id {step_id!r}")
    return c["steps"][step_id]


def submit_ecr_credentials_refresh(
    cluster_id: str,
    path: str,
    action_on_failure: str = "CONTINUE",
    boto3_session: Any = None,
) -> str:
    """reference: emr.py:972 — the reference uploads a docker-login
    refresh script and submits it through script-runner; locally there
    is no ECR to log into, so the step is recorded with the reference's
    exact shape and completes as a no-op."""
    step = build_step(
        command=f"{path.rstrip('/')}/ecr_credentials_refresh.py",
        name="ECR Credentials Refresh",
        action_on_failure=action_on_failure,
        script=True,
    )
    c = _cluster(cluster_id)
    step_id = "s-" + hashlib.md5(
        f"{cluster_id}:{len(c['step_order'])}:ecr".encode()
    ).hexdigest()[:16]
    c["steps"][step_id] = {"id": step_id, "spec": step, "state": "COMPLETED", "stdout": "", "stderr": ""}
    c["step_order"].append(step_id)
    return step_id
