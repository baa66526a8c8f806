"""EMR + EMR Serverless local execution model (emr.py, emr_serverless.py)."""

from __future__ import annotations

import pytest

from aws_sdk_pandas_spark import emr, emr_serverless
from aws_sdk_pandas_spark.exceptions import InvalidArgument


def test_build_step_contract():
    step = emr.build_step('echo "Hello!"', name="greet", action_on_failure="CANCEL_AND_WAIT")
    assert step == {
        "Name": "greet",
        "ActionOnFailure": "CANCEL_AND_WAIT",
        "HadoopJarStep": {"Jar": "command-runner.jar", "Args": ["echo", '"Hello!"']},
    }
    scripted = emr.build_step("s3://b/x.sh a b", script=True, region="eu-west-1")
    assert scripted["HadoopJarStep"]["Jar"] == (
        "s3://eu-west-1.elasticmapreduce/libs/script-runner/script-runner.jar"
    )
    assert scripted["HadoopJarStep"]["Args"] == ["s3://b/x.sh", "a", "b"]


def test_build_spark_step_contract():
    step = emr.build_spark_step("s3://b/app.py", args=["--x", "1"], deploy_mode="client")
    args = step["HadoopJarStep"]["Args"]
    assert args[:3] == ["spark-submit", "--deploy-mode", "client"]
    assert args[-3:] == ["s3://b/app.py", "--x", "1"]
    docker = emr.build_spark_step("app.py", docker_image="reg/img:1")
    flat = " ".join(docker["HadoopJarStep"]["Args"])
    assert "YARN_CONTAINER_RUNTIME_DOCKER_IMAGE=reg/img:1" in flat
    assert "spark.executorEnv" in flat and "spark.yarn.appMasterEnv" in flat


def test_cluster_request_assembly():
    cid = emr.create_cluster(
        subnet_id="subnet-1",
        cluster_name="c1",
        instance_num_on_demand_core=2,
        instance_num_spot_task=3,
        spot_bid_percentage_of_on_demand_task=55,
        spark_defaults={"spark.sql.shuffle.partitions": "64"},
        tags={"team": "data"},
        docker=True,
        extra_public_registries=["ecr.example"],
        spark_pyarrow=True,
        termination_protected=True,
    )
    req = emr.describe_cluster_request(cid)
    groups = {(g["InstanceRole"], g["Market"]): g for g in req["Instances"]["InstanceGroups"]}
    assert groups[("MASTER", "ON_DEMAND")]["InstanceCount"] == 1
    assert groups[("CORE", "ON_DEMAND")]["InstanceCount"] == 2
    assert groups[("TASK", "SPOT")]["BidPriceAsPercentageOfOnDemandPrice"] == 55
    confs = {c["Classification"]: c for c in req["Configurations"]}
    assert confs["spark-defaults"]["Properties"]["spark.sql.shuffle.partitions"] == "64"
    assert "spark-hive-site" in confs and "hive-site" in confs  # glue defaults on
    assert "ecr.example" in confs["container-executor"]["Configurations"][0][
        "Properties"
    ]["docker.trusted.registries"]
    assert confs["spark-env"]["Configurations"][0]["Properties"][
        "ARROW_PRE_0_15_IPC_FORMAT"
    ] == "1"
    assert req["Tags"] == [{"Key": "team", "Value": "data"}]
    # termination protection is honored
    with pytest.raises(InvalidArgument, match="termination-protected"):
        emr.terminate_cluster(cid)
    assert emr.get_cluster_state(cid) == "WAITING"


def test_shell_steps_and_action_on_failure():
    cid = emr.create_cluster(cluster_name="steps")
    sid = emr.submit_step(cid, 'echo hello-emr')
    assert emr.get_step_state(cid, sid) == "COMPLETED"
    assert "hello-emr" in emr.describe_step(cid, sid)["stdout"]
    # FAILED + CANCEL_AND_WAIT cancels the rest of the batch
    steps = [
        emr.build_step("false", name="boom", action_on_failure="CANCEL_AND_WAIT"),
        emr.build_step("echo never", name="after"),
    ]
    ids = emr.submit_steps(cid, steps)
    assert emr.get_step_state(cid, ids[0]) == "FAILED"
    assert emr.get_step_state(cid, ids[1]) == "CANCELLED"
    # FAILED + TERMINATE_CLUSTER takes the cluster down
    cid2 = emr.create_cluster(cluster_name="dies")
    emr.submit_steps(cid2, [emr.build_step("false", action_on_failure="TERMINATE_CLUSTER")])
    assert emr.get_cluster_state(cid2) == "TERMINATED"
    with pytest.raises(InvalidArgument, match="terminated"):
        emr.submit_step(cid2, "echo nope")


def test_spark_step_executes_on_live_session(spark, tmp_path):
    src = tmp_path / "in.parquet"
    out = tmp_path / "out.parquet"
    spark.range(100).withColumnRenamed("id", "v").write.parquet(str(src))
    script = tmp_path / "job.py"
    script.write_text(
        "import sys\n"
        "from pyspark.sql import SparkSession, functions as F\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "src, out, lim = sys.argv[1], sys.argv[2], int(sys.argv[3])\n"
        "df = spark.read.parquet(src).where(F.col('v') < lim)\n"
        "df.agg(F.sum('v').alias('s'), F.count('*').alias('n')).write.parquet(out)\n"
        "spark.stop()\n"  # must NOT kill the shared cluster
    )
    cid = emr.create_cluster(cluster_name="sparky")
    sid = emr.submit_spark_step(cid, str(script), args=[str(src), str(out), "10"])
    assert emr.get_step_state(cid, sid) == "COMPLETED", emr.describe_step(cid, sid)["stderr"]
    row = spark.read.parquet(str(out)).first()  # session survived spark.stop()
    assert (row.s, row.n) == (45, 10)


def test_spark_step_sys_exit_semantics(spark, tmp_path):
    """sys.exit(0) is a normal script ending; a nonzero exit fails the
    step without killing the submitter."""
    ok = tmp_path / "ok.py"
    ok.write_text("import sys\nsys.exit(0)\n")
    bad = tmp_path / "bad.py"
    bad.write_text("import sys\nsys.exit(3)\n")
    cid = emr.create_cluster(cluster_name="exits")
    s1 = emr.submit_spark_step(cid, str(ok))
    assert emr.get_step_state(cid, s1) == "COMPLETED"
    s2 = emr.submit_spark_step(cid, str(bad))
    assert emr.get_step_state(cid, s2) == "FAILED"
    assert "code 3" in emr.describe_step(cid, s2)["stderr"]


def test_emr_serverless_application_and_spark_job(spark, tmp_path):
    app_id = emr_serverless.create_application(
        "my-app", "emr-6.10.0", initial_capacity={"DRIVER": {"workerCount": 1}},
        tags={"env": "dev"}, architecture="ARM64",
    )
    req = emr_serverless.describe_application(app_id)
    assert req["releaseLabel"] == "emr-6.10.0" and req["architecture"] == "ARM64"
    assert req["autoStartConfiguration"] == {"enabled": True}
    out = tmp_path / "sl.parquet"
    script = tmp_path / "sl.py"
    script.write_text(
        "import sys\nfrom pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "spark.range(int(sys.argv[1])).write.parquet(sys.argv[2])\n"
    )
    resp = emr_serverless.run_job(
        app_id,
        "arn:aws:iam::000000000000:role/emr-serverless",
        {"entryPoint": str(script), "entryPointArguments": ["7", str(out)]},
    )
    assert resp["jobRun"]["state"] == "SUCCESS"
    assert spark.read.parquet(str(out)).count() == 7
    # failure surfaces as an exception carrying the state details
    bad = tmp_path / "bad.py"
    bad.write_text("raise RuntimeError('kaput')\n")
    with pytest.raises(InvalidArgument, match="kaput"):
        emr_serverless.run_job(app_id, "role", {"entryPoint": str(bad)})
    jr = emr_serverless.run_job(app_id, "role", {"entryPoint": str(bad)}, wait=False)
    assert emr_serverless.wait_job(app_id, jr)["jobRun"]["state"] == "FAILED"


def test_emr_serverless_hive_job(spark, tmp_path):
    app_id = emr_serverless.create_application("hive-app", "emr-6.10.0", "Hive")
    sql = tmp_path / "q.sql"
    sql.write_text(
        "CREATE OR REPLACE TEMPORARY VIEW emrless_tv AS SELECT 42 AS x;\n"
        "CREATE OR REPLACE TEMPORARY VIEW emrless_tv2 AS SELECT x + 1 AS y FROM emrless_tv;\n"
    )
    resp = emr_serverless.run_job(app_id, "role", {"query": str(sql)}, job_type="Hive")
    assert resp["jobRun"]["state"] == "SUCCESS"
    assert spark.table("emrless_tv2").first().y == 43
    # a semicolon inside a string literal is data, not a boundary
    sql2 = tmp_path / "q2.sql"
    sql2.write_text(
        "CREATE OR REPLACE TEMPORARY VIEW emrless_tv3 AS SELECT 'a;b' AS s;\n"
    )
    resp = emr_serverless.run_job(app_id, "role", {"query": str(sql2)}, job_type="Hive")
    assert resp["jobRun"]["state"] == "SUCCESS"
    assert spark.table("emrless_tv3").first().s == "a;b"


def test_spark_submit_boolean_and_unknown_flags(spark, tmp_path):
    """round-2 advice: --verbose takes no value and must not swallow the
    script path; unknown flag shapes fail loudly instead of guessing."""
    import pytest

    from aws_sdk_pandas_spark.emr import _run_spark_submit
    from aws_sdk_pandas_spark.exceptions import InvalidArgument

    script = tmp_path / "job.py"
    out = tmp_path / "flag_probe.txt"
    script.write_text(
        "import sys\n"
        f"open({str(out)!r}, 'w').write(','.join(sys.argv))\n"
    )
    step = {}
    argv = ["spark-submit", "--verbose", "--deploy-mode", "cluster", str(script), "arg1"]
    _run_spark_submit(argv, step)
    assert step["state"] == "COMPLETED"
    assert out.read_text() == f"{script},arg1"
    with pytest.raises(InvalidArgument, match="unrecognized spark-submit flag"):
        _run_spark_submit(["spark-submit", "--frobnicate", str(script)], {})
    with pytest.raises(InvalidArgument, match="missing its value"):
        _run_spark_submit(["spark-submit", "--deploy-mode"], {})


def test_split_statements_double_quotes_and_comments():
    """round-2 advice: double-quoted literals and -- comments also shield
    ';' from the statement splitter."""
    from aws_sdk_pandas_spark.emr_serverless import _split_statements

    got = _split_statements(
        'SELECT "a;b" AS s;\n'
        "-- a comment; with a semicolon\n"
        "SELECT 'c;d' AS t -- trailing; comment\n;\n"
        "SELECT 1"
    )
    assert got == ['SELECT "a;b" AS s', "SELECT 'c;d' AS t", "SELECT 1"]
    # doubled-quote escape inside a double-quoted literal
    assert _split_statements('SELECT "x"";y" AS s') == ['SELECT "x"";y" AS s']


def test_split_statements_block_comments():
    """round-3 advice: a ';' inside a /* */ block comment is not a
    statement boundary; unterminated block comments fail loudly."""
    from aws_sdk_pandas_spark.emr_serverless import _split_statements

    got = _split_statements(
        "SELECT 1 /* a block; comment */ AS x;\n"
        "/* leading; comment\nspanning lines; */ SELECT 2"
    )
    # the comment collapses to a separator space
    assert [s.split() for s in got] == [["SELECT", "1", "AS", "x"], ["SELECT", "2"]]
    # a /* inside a string literal is data, not a comment opener
    assert _split_statements("SELECT '/*;*/' AS s") == ["SELECT '/*;*/' AS s"]
    with pytest.raises(InvalidArgument, match="unterminated"):
        _split_statements("SELECT 1 /* never closed")
