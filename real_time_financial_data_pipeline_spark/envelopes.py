"""Request/response envelope validation — the reference's Pydantic models
(schema.py:49-90) as dependency-free dataclasses.

The container ships no pydantic, so validation is hand-rolled but keeps
the same contract: required fields must be present with the right type,
optional fields default, unknown fields are ignored (pydantic v1
behavior), and failures raise :class:`EnvelopeError` carrying
FastAPI-style ``[{loc, msg, type}]`` detail suitable for a 422 body.

Entity RECORD schemas (StockPrice, ForexRate, ... — schema.py:13-46) live
as Spark StructTypes in :mod:`.schemas`; this module covers the API
envelopes.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, get_args, get_origin


class EnvelopeError(ValueError):
    """Validation failure; ``.detail`` matches FastAPI's 422 body shape."""

    def __init__(self, detail: list[dict[str, Any]]):
        super().__init__(f"{len(detail)} validation error(s): {detail}")
        self.detail = detail


_SIMPLE = {str: "string", int: "integer", float: "number", bool: "boolean", dict: "object", list: "array"}


def _check(value: Any, tp: Any) -> bool:
    origin = get_origin(tp)
    if origin is None:
        if tp is Any:
            return True
        if tp is float:
            return isinstance(value, (int, float)) and not isinstance(value, bool)
        if tp is int:
            return isinstance(value, int) and not isinstance(value, bool)
        return isinstance(value, tp)
    if origin is list:
        (item_tp,) = get_args(tp) or (Any,)
        return isinstance(value, list) and all(_check(v, item_tp) for v in value)
    if origin is dict:
        return isinstance(value, dict)
    # Optional[X] / unions
    return any(v is type(None) and value is None or _check(value, v) for v in get_args(tp))


def parse_envelope(cls: type, payload: Any) -> Any:
    """Validate ``payload`` (a decoded JSON object) into dataclass ``cls``."""
    errors: list[dict[str, Any]] = []
    if not isinstance(payload, dict):
        raise EnvelopeError([{"loc": ["body"], "msg": "value is not a valid dict", "type": "type_error.dict"}])
    kwargs: dict[str, Any] = {}
    hints = {f.name: f.type for f in dataclasses.fields(cls)}
    import typing

    resolved = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        tp = resolved.get(f.name, hints[f.name])
        required = f.default is dataclasses.MISSING and f.default_factory is dataclasses.MISSING
        if f.name not in payload:
            if required:
                errors.append({"loc": ["body", f.name], "msg": "field required", "type": "value_error.missing"})
            continue
        v = payload[f.name]
        if not _check(v, tp):
            errors.append(
                {
                    "loc": ["body", f.name],
                    "msg": f"value is not a valid {getattr(tp, '__name__', str(tp))}",
                    "type": "type_error",
                }
            )
            continue
        kwargs[f.name] = v
    if errors:
        raise EnvelopeError(errors)
    return cls(**kwargs)


# --- the envelopes (schema.py:49-90) --------------------------------------


@dataclass
class DataIngestionRequest:  # schema.py:49-55
    source: str
    data_type: str
    symbols: list[str] = field(default_factory=list)
    start_date: str | None = None
    end_date: str | None = None
    params: dict[str, Any] = field(default_factory=dict)


@dataclass
class DataIngestionResponse:  # schema.py:58-63
    request_id: str
    status: str
    message: str
    records_count: int | None = None
    errors: list[str] = field(default_factory=list)


@dataclass
class TransformationRequest:  # schema.py:66-70
    source_path: str
    destination_path: str
    transformation_type: str
    params: dict[str, Any] = field(default_factory=dict)


@dataclass
class QueryRequest:  # schema.py:73-76
    dataset: str
    query_type: str
    params: dict[str, Any] = field(default_factory=dict)
