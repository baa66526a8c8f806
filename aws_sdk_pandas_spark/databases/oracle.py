"""Oracle connector surface (reference: awswrangler/oracle.py).

Modes (oracle.py:502): append/overwrite/upsert (MERGE INTO).
"""

from __future__ import annotations

from aws_sdk_pandas_spark.databases import postgresql as _pg

connect = _pg.connect
read_sql_query = _pg.read_sql_query
read_sql_table = _pg.read_sql_table
to_sql = _pg.to_sql
