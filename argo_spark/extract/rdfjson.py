"""RDF/JSON parser — PARSE side of the JSON format.

Beyond the reference (serializer-only registration, argo.go:117-140;
and the reference's serializer emits invalid single-quoted JSON it
could never have read back, json.go:38,58,80-92). Accepts BOTH key
flavors:

* the repo writer's NT lexical keys (``{"<s>": {"<p>": [...]}}``,
  sinks/writers.py::rdfjson_lines — the reference IndexStore shape
  with valid JSON), and
* the W3C RDF/JSON form with bare IRI keys
  (``{"http://s": {"http://p": [...]}}``).

``_:label`` marks blank nodes in either flavor. Object cells carry
``{"type": "uri"|"bnode"|"literal", "value": ..., "lang"?, "datatype"?}``;
unknown types are per-document errors. A document is either ONE JSON
object or a SEQUENCE of newline-delimited objects (the distributed
writer's one-subject-per-line output) — the parser tries whole-doc
first, then JSON-lines.

Distribution: whole-file documents through the same wholetext +
Arrow ``mapInPandas`` stage as the other readers; json.loads is C
speed and per-document, zero shuffles.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argo_spark.extract.rdfa import FlatTriple
from argo_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL


class RdfJsonError(Exception):
    pass


def _subject(key: str) -> Tuple[int, str]:
    if key.startswith("<") and key.endswith(">"):
        key = key[1:-1]
    if key.startswith("_:"):
        return KIND_BLANK, key[2:]
    return KIND_IRI, key


def _predicate(key: str) -> str:
    if key.startswith("<") and key.endswith(">"):
        return key[1:-1]
    if key.startswith("_:"):
        raise RdfJsonError("blank node in predicate position")
    return key


def _object(cell) -> Tuple[int, str, Optional[str], Optional[str]]:
    if not isinstance(cell, dict) or "value" not in cell:
        raise RdfJsonError(f"bad object cell {cell!r}")
    typ = cell.get("type", "literal")
    value = cell["value"]
    if not isinstance(value, str):
        raise RdfJsonError(f"non-string value {value!r}")
    if typ == "uri":
        return KIND_IRI, value, None, None
    if typ == "bnode":
        return KIND_BLANK, value[2:] if value.startswith("_:") else value, None, None
    if typ == "literal":
        lang = cell.get("lang") or None
        dt = cell.get("datatype") or None
        return KIND_LITERAL, value, lang, dt
    raise RdfJsonError(f"unknown object type {typ!r}")


def _emit_doc(obj, out: List[FlatTriple]) -> None:
    if not isinstance(obj, dict):
        raise RdfJsonError("top level is not a JSON object")
    for s_key, preds in obj.items():
        s_kind, s_value = _subject(s_key)
        if not isinstance(preds, dict):
            raise RdfJsonError(f"subject {s_key!r} maps to non-object")
        for p_key, cells in preds.items():
            p_value = _predicate(p_key)
            if not isinstance(cells, list):
                raise RdfJsonError(f"predicate {p_key!r} maps to non-array")
            for cell in cells:
                o = _object(cell)
                out.append((s_kind, s_value, p_value) + o)


def parse_rdfjson(text: str) -> Tuple[List[FlatTriple], Optional[str]]:
    """-> (triples, error). Whole-document JSON object, or a sequence
    of newline-delimited objects (the lines writer's output).
    All-or-nothing per document, same contract as the other parsers."""
    out: List[FlatTriple] = []
    try:
        try:
            _emit_doc(json.loads(text), out)
            return out, None
        except json.JSONDecodeError:
            pass
        for i, line in enumerate(text.splitlines(), 1):
            if not line.strip():
                continue
            try:
                _emit_doc(json.loads(line), out)
            except json.JSONDecodeError as e:
                raise RdfJsonError(f"line {i}: invalid JSON ({e.msg})")
        return out, None
    except RdfJsonError as e:
        return [], str(e)


RDFJSON_SCHEMA = (
    "s_kind tinyint, s_value string, p_value string, o_kind tinyint, "
    "o_value string, o_lang string, o_dt string, key string, error string"
)


def parse_rdfjson_col(
    df: DataFrame, text_col: str = "value", key_col: str = "key"
) -> DataFrame:
    """Arrow-batched distributed parse, one document per input row."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["s_kind", "s_value", "p_value", "o_kind", "o_value",
                "o_lang", "o_dt", "key", "error"]
        for pdf in batches:
            rows = []
            for text, key in zip(pdf[text_col], pdf[key_col]):
                triples, error = parse_rdfjson(text)
                for t in triples:
                    rows.append(t + (key, None))
                if error is not None:
                    rows.append(
                        (None, None, None, None, None, None, None, key, error)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(text_col, key_col).mapInPandas(fn, schema=RDFJSON_SCHEMA)


def read_rdfjson(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read RDF/JSON files (one document or JSON-lines per file) into
    (triples_df, errors_df)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.col("value"), F.input_file_name().alias("key")
    )
    parsed = parse_rdfjson_col(raw)
    triples = parsed.where("error IS NULL").drop("error")
    errors = parsed.where("error IS NOT NULL").select(
        F.col("key").alias("path"), "error"
    )
    return triples, errors
