"""Typed error taxonomy with stable error codes.

Spark-first re-expression of the reference's error model
(markdown_lab/core/errors.py:15-70 base-class contract, 408-533
normalization helpers): every error carries an ``error_code`` —
defaulting to the upper-cased class name — plus a details dict, and
serializes via ``to_dict`` for the engine's per-row error columns and
metrics tables. In a distributed engine errors are DATA, not control
flow: a batch never fails because one row did (P5), so the taxonomy's
main consumer is ``normalize_error``, which turns any exception raised
inside a UDF into the ``[CODE] message`` string stored in the ``error``
column.
"""

from __future__ import annotations

from typing import Any, Dict, Optional


class MarkdownLabSparkError(Exception):
    """Base error: code + message + structured details."""

    def __init__(
        self,
        message: str,
        error_code: Optional[str] = None,
        details: Optional[Dict[str, Any]] = None,
    ):
        super().__init__(message)
        self.message = message
        self.error_code = error_code or self.__class__.__name__.upper()
        self.details = details or {}

    def __str__(self) -> str:
        return f"[{self.error_code}] {self.message}"

    def to_dict(self) -> Dict[str, Any]:
        return {
            "error_type": self.__class__.__name__,
            "error_code": self.error_code,
            "message": self.message,
            "details": self.details,
        }


class NetworkError(MarkdownLabSparkError):
    """Fetch-layer failures (in this engine: corpus-join misses exhausting
    retries surface as status='fetch_miss' rows, not exceptions; this
    class exists for live-fetch sources)."""


class ParsingError(MarkdownLabSparkError):
    """HTML tree construction / selector failures."""


class ConversionError(MarkdownLabSparkError):
    """Document -> markdown/json/xml serialization failures."""


class ChunkingError(MarkdownLabSparkError):
    """RAG chunker failures."""


class ConfigurationError(MarkdownLabSparkError):
    """Invalid EngineConfig values or environment overrides."""


class CheckpointError(MarkdownLabSparkError):
    """Wave checkpoint write/resume failures."""


# exception type -> stable code, mirroring the reference's normalization
# (markdown_lab/core/errors.py:408-459: timeouts/connection/HTTP buckets,
# catch-all UNEXPECTED_ERROR)
_CODE_BY_TYPE = {
    "TimeoutError": "REQUEST_TIMEOUT",
    "ConnectionError": "CONNECTION_FAILED",
    "UnicodeDecodeError": "DECODE_FAILED",
    "UnicodeError": "DECODE_FAILED",
    "RecursionError": "PARSING_FAILED",
    "ValueError": "PARSING_FAILED",
    "KeyError": "PARSING_FAILED",
    "IndexError": "PARSING_FAILED",
    "MemoryError": "MEMORY_LIMIT_EXCEEDED",
}


def normalize_error(exc: BaseException, max_len: int = 500) -> str:
    """Any exception -> '[CODE] message' for the per-row error column."""
    if isinstance(exc, MarkdownLabSparkError):
        return str(exc)[:max_len]
    code = _CODE_BY_TYPE.get(type(exc).__name__, "UNEXPECTED_ERROR")
    return f"[{code}] {type(exc).__name__}: {exc}"[:max_len]
