"""SQL Server connector surface (reference: awswrangler/sqlserver.py).

Modes (sqlserver.py:426): append/overwrite/upsert (MERGE).
"""

from __future__ import annotations

from aws_sdk_pandas_spark.databases import postgresql as _pg

connect = _pg.connect
read_sql_query = _pg.read_sql_query
read_sql_table = _pg.read_sql_table
to_sql = _pg.to_sql
