"""Excel read/write (reference: awswrangler/s3/_read_excel.py:17,
_write_excel.py:17).

Excel files are single-object, driver-sized by nature (the reference
reads the whole object into pandas).  Spark-side: driver pandas ->
``createDataFrame`` (Arrow).  When an Excel engine (openpyxl) is on the
path, pandas does the parsing with its full kwarg surface; in THIS
container — which ships no engine — the stdlib SpreadsheetML codec
(``xlsx_lite``) reads and writes real .xlsx files directly, so the
entry points are fully executable rather than import-gated.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark.exceptions import InvalidArgument

_LITE_READ_KWARGS = {"sheet_name", "header"}
_LITE_WRITE_KWARGS = {"sheet_name", "header", "index"}


def _engine_available() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:  # pragma: no cover - env-dependent
        return False


def read_excel(
    spark: SparkSession, path: str, *, pandas_reader: Any = None, **pandas_kwargs: Any
) -> DataFrame:
    """reference: s3/_read_excel.py:17 — driver-side pandas read, then
    distribute.  ``pandas_reader`` injects the reader (tests); without
    an engine the stdlib codec parses the SpreadsheetML parts itself
    (``sheet_name``/``header`` supported — other pandas kwargs need the
    real engine and are refused loudly)."""
    import pandas as pd

    if pandas_reader is not None:
        pdf = pandas_reader(path, **pandas_kwargs)
    elif _engine_available():
        pdf = pd.read_excel(path, **pandas_kwargs)
    else:
        extra = set(pandas_kwargs) - _LITE_READ_KWARGS
        if extra:
            raise InvalidArgument(
                f"read_excel kwargs {sorted(extra)} need the openpyxl "
                "engine (not installed); the built-in codec supports "
                f"{sorted(_LITE_READ_KWARGS)}"
            )
        from aws_sdk_pandas_spark.sources.xlsx_lite import read_xlsx

        pdf = read_xlsx(path, **pandas_kwargs)
    return spark.createDataFrame(pdf)


def to_excel(
    df: DataFrame, path: str, *, pandas_writer: Any = None, max_rows: int = 1_048_576, **pandas_kwargs: Any
) -> str:
    """reference: s3/_write_excel.py:17 — collect to driver (bounded by
    Excel's own 1,048,576-row format limit), write one object.  Engine
    absent -> the stdlib codec writes the .xlsx (``sheet_name`` /
    ``header`` / ``index`` supported)."""
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
    if _engine_available():
        pdf.to_excel(path, **pandas_kwargs)
        return path
    extra = set(pandas_kwargs) - _LITE_WRITE_KWARGS
    if extra:
        raise InvalidArgument(
            f"to_excel kwargs {sorted(extra)} need the openpyxl engine "
            f"(not installed); the built-in codec supports "
            f"{sorted(_LITE_WRITE_KWARGS)}"
        )
    from aws_sdk_pandas_spark.sources.xlsx_lite import write_xlsx

    write_xlsx(pdf, path, **pandas_kwargs)
    return path
