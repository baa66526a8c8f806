"""Excel read/write (reference: awswrangler/s3/_read_excel.py:17,
_write_excel.py:17).

Excel files are single-object, driver-sized by nature (the reference
reads the whole object into pandas).  Spark-side: driver pandas ->
``createDataFrame`` (Arrow).  Requires an Excel engine (openpyxl); this
container ships none, so the functions gate behind an import-try with a
clear error — the Spark plumbing is real and tested via monkeypatched
pandas I/O.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark.exceptions import InvalidArgument


def _require_engine() -> None:
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise InvalidArgument(
            "read_excel/to_excel require an Excel engine (openpyxl); "
            "not installed in this environment"
        ) from exc


def read_excel(
    spark: SparkSession, path: str, *, pandas_reader: Any = None, **pandas_kwargs: Any
) -> DataFrame:
    """reference: s3/_read_excel.py:17 — driver-side pandas read, then
    distribute.  ``pandas_reader`` injects the reader (tests)."""
    import pandas as pd

    reader = pandas_reader
    if reader is None:
        _require_engine()
        reader = pd.read_excel
    pdf = reader(path, **pandas_kwargs)
    return spark.createDataFrame(pdf)


def to_excel(
    df: DataFrame, path: str, *, pandas_writer: Any = None, max_rows: int = 1_048_576, **pandas_kwargs: Any
) -> str:
    """reference: s3/_write_excel.py:17 — collect to driver (bounded by
    Excel's own 1,048,576-row format limit), write one object."""
    n = df.count()
    if n > max_rows:
        raise InvalidArgument(
            f"DataFrame has {n} rows; Excel format caps at {max_rows} "
            "(use a dataset format for anything bigger)"
        )
    pdf = df.toPandas()
    if pandas_writer is not None:
        pandas_writer(pdf, path, **pandas_kwargs)
        return path
    _require_engine()
    pdf.to_excel(path, **pandas_kwargs)
    return path
