"""Exception hierarchy (reference: awswrangler/exceptions.py)."""

from __future__ import annotations


class ASPSError(Exception):
    """Base error."""


class InvalidArgument(ASPSError):
    """Invalid argument value."""


class InvalidArgumentCombination(ASPSError):
    """Mutually-incompatible arguments (reference: InvalidArgumentCombination)."""


class InvalidDataType(ASPSError):
    """Unsupported / unconvertible data type."""


class UndetectedType(ASPSError):
    """Column type could not be inferred (all-null column without dtype
    override; reference: awswrangler/_data_types.py:64-67)."""


class NoFilesFound(ASPSError):
    """Path/glob matched no files (reference: exceptions.NoFilesFound)."""


class EmptyDataFrame(ASPSError):
    """Write called with an empty DataFrame (reference: exceptions.EmptyDataFrame)."""


class QueryFailed(ASPSError):
    """SQL execution failed."""


class TableNotFound(ASPSError):
    """Catalog table does not exist."""
