"""Hive/Java-compatible hash expressions.

The reference computes Hive-compatible bucket numbers client-side with a
Java ``String.hashCode``-style loop and 32-bit overflow simulation
(awswrangler/s3/_write_dataset.py:34-72).  Spark's built-in ``hash`` is
Murmur3 (what ``bucketBy`` uses) and is NOT Hive/Athena-compatible, so we
port the Java semantics as pure Column expressions — higher-order
functions over the char array, evaluated JVM-side, no Python in the loop.

32-bit overflow is simulated by computing in LongType and masking with
``& 0xFFFFFFFF`` at every step (ANSI mode in Spark 4 would otherwise raise
on genuine int overflow).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_sdk_pandas_spark.exceptions import InvalidDataType

_MASK32 = 0xFFFFFFFF
_SIGN32 = 0x80000000
_MOD32 = 0x100000000


def _to_signed32(col: Column) -> Column:
    m = col.bitwiseAND(F.lit(_MASK32))
    return F.when(m >= F.lit(_SIGN32), m - F.lit(_MOD32)).otherwise(m).cast(T.LongType())


def hive_hash_string(col: Column) -> Column:
    """Java ``String.hashCode`` of a string column:
    ``h = 31*h + charAt(i)`` with 32-bit wraparound
    (reference loop: awswrangler/s3/_write_dataset.py:49-66).

    Uses code points (``ascii``) rather than UTF-16 units — identical for
    BMP/ASCII data, which is what Hive bucketing keys are in practice.
    """
    chars = F.split(col, "")
    acc = F.aggregate(
        chars,
        F.lit(0).cast(T.LongType()),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)).bitwiseAND(F.lit(_MASK32)),
    )
    return _to_signed32(acc)


def _hive_hash_one(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, (T.StringType, T.VarcharType, T.CharType)):
        return hive_hash_string(col)
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType)):
        return col.cast(T.LongType())
    if isinstance(dtype, T.LongType):
        # Java Long.hashCode: (int)((v >>> 32) ^ v)
        return _to_signed32(F.shiftrightunsigned(col, 32).bitwiseXOR(col))
    if isinstance(dtype, T.BooleanType):
        # Java Boolean.hashCode
        return F.when(col, F.lit(1231)).otherwise(F.lit(1237)).cast(T.LongType())
    if isinstance(dtype, T.DateType):
        # Hive hashes DATE as days-since-epoch int
        return F.datediff(col, F.lit("1970-01-01")).cast(T.LongType())
    raise InvalidDataType(
        f"hive_hash does not support {dtype} bucketing keys "
        "(reference supports string/int/bool keys: s3/_write_dataset.py:34-72)"
    )


def hive_hash(*cols: str | Column, df: DataFrame | None = None, dtypes: list[T.DataType] | None = None) -> Column:
    """Combined Hive bucket hash over one or more key columns:
    ``h = 31*h + hash(col_i)`` with 32-bit wraparound.

    When called with plain column names inside ``write_dataset`` the dtype
    is resolved from the DataFrame; callers can also pass Columns plus
    explicit ``dtypes``.
    """
    resolved: list[tuple[Column, T.DataType]] = []
    for i, c in enumerate(cols):
        if isinstance(c, str):
            if df is None:
                # dtype resolved lazily: assume string unless told otherwise —
                # write_dataset always passes df
                resolved.append((F.col(c), None))  # type: ignore[arg-type]
            else:
                dtype = df.schema[c].dataType
                resolved.append((F.col(c), dtype))
        else:
            dtype = dtypes[i] if dtypes else T.StringType()
            resolved.append((c, dtype))

    acc = F.lit(0).cast(T.LongType())
    for col, dtype in resolved:
        h = _hive_hash_one(col, dtype) if dtype is not None else hive_hash_string(col.cast("string"))
        acc = (acc * F.lit(31) + h).bitwiseAND(F.lit(_MASK32))
    return _to_signed32(acc)


def hive_bucket(
    n_buckets: int,
    *cols: str | Column,
    df: DataFrame | None = None,
    dtypes: list[T.DataType] | None = None,
) -> Column:
    """Bucket id = ``(hash & Integer.MAX_VALUE) % n`` (Hive's bucket
    assignment; reference: s3/_write_dataset.py:67-72).  Pass ``df`` (for
    column names) or ``dtypes`` (for Column expressions) so non-string
    keys hash with their Java type's hashCode — a bare Column without
    either falls back to string hashing."""
    h = hive_hash(*cols, df=df, dtypes=dtypes)
    return F.pmod(h.bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(n_buckets)).cast(T.IntegerType())


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    *,
    seed: int = 42,
    out_col: str = "split",
    algo: str = "xxhash64",
) -> DataFrame:
    """Deterministic dataset split by key hash — the train/val/test
    assignment for training-data pipelines.  Unlike ``randomSplit`` the
    assignment is a pure function of the key (stable across runs, Spark
    versions, and partitionings, and all rows sharing a key land in the
    same split — no leakage between train and test for duplicated keys).

    ``weights`` maps split name -> fraction (must sum to ~1).

    ``algo``: ``"xxhash64"`` (default — fastest, JVM-native) or
    ``"md5"`` — a portable assignment any engine can reproduce from the
    key's string form (``md5(key || ':' || seed)`` first 8 hex digits,
    scaled to [0,1)); use it when the split must be re-derivable outside
    Spark (audits, cross-engine pipelines).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise InvalidDataType(f"split weights must sum to 1, got {total}")
    if algo == "md5":
        # uniform in [0,1): first 32 hash bits of md5(key:seed), scaled
        u = F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(seed)))), 1, 8),
            16,
            10,
        ).cast("long") / F.lit(float(1 << 32))
    elif algo == "xxhash64":
        # uniform in [0,1): xxhash64 seeded, sign-masked, scaled
        u = (F.xxhash64(F.col(key_col), F.lit(seed)).bitwiseAND(F.lit((1 << 63) - 1))) / F.lit(
            float(1 << 63)
        )
    else:
        raise InvalidDataType(f"unknown hash_split algo: {algo!r}")
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(out_col, expr)


def kfold_split(
    df: DataFrame,
    key_col: str,
    k: int,
    *,
    seed: int = 42,
    out_col: str = "fold",
    algo: str = "md5",
) -> DataFrame:
    """Deterministic k-fold assignment by key hash — cross-validation
    folds with the same guarantees as :func:`hash_split`: stable across
    runs/partitionings/engines, and every row sharing a key lands in the
    same fold (no leakage across folds for duplicated keys).

    ``algo='md5'`` folds are re-derivable by any engine from the key's
    string form; ``'xxhash64'`` is the faster JVM-native variant.
    """
    if k < 2:
        raise InvalidDataType("k must be >= 2")
    if algo == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    elif algo == "xxhash64":
        h = F.xxhash64(F.col(key_col), F.lit(seed)).bitwiseAND(F.lit((1 << 63) - 1))
    else:
        raise InvalidDataType(f"unknown kfold algo: {algo!r}")
    return df.withColumn(out_col, F.pmod(h, F.lit(k)).cast("int"))
