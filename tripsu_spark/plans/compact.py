"""Prefix-compacted graph-table storage.

Every IRI this engine mints shares the KG base prefix
(operators/extract.py::KG), and rdf:type shares the RDF namespace.
Storing full IRIs per row makes the materialized graph table carry
20-45 redundant bytes per value — bytes that flow through the
pre-write sort, the parquet encoder, the page cache, and every pass-2
scan. At 10^12 turns that is tens of terabytes of pure prefix.

``compact_triples`` strips known prefixes into tiny code columns
(RLE-encoded to ~nothing by parquet); ``expand_triples`` restores the
exact original frame with codegen `concat`s at read time, fused by
Catalyst into whatever consumes it (hash input assembly, N-Triples
serialization). Round-trip is exact for ANY input — values with no
known prefix pass through untouched — so this is a storage-layer
change, not a semantic one (tests/test_compact.py asserts frame
equality on minted AND foreign IRIs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.extract import KG, RDF_TYPE
from ..schemas import KIND_IRI

RDF_NS = RDF_TYPE[: RDF_TYPE.rindex("#") + 1]
# code 0 = verbatim, 1 = KG base, 2 = RDF namespace
_PREFIXES = [(1, KG), (2, RDF_NS)]

COMPACT_COLS = [
    "s_kind", "s_value", "s_pfx", "predicate", "p_pfx",
    "o_kind", "o_value", "o_pfx", "o_datatype", "o_lang",
]


def _strip(value: Column) -> tuple[Column, Column]:
    """value -> (compact_value, prefix_code)."""
    compact = value
    code = F.lit(0)
    for c, pfx in _PREFIXES:
        hit = value.startswith(pfx)
        compact = F.when(
            hit, value.substr(F.lit(len(pfx) + 1), F.length(value))
        ).otherwise(compact)
        code = F.when(hit, F.lit(c)).otherwise(code)
    return compact, code.cast("tinyint")


def _restore(value: Column, code: Column) -> Column:
    out = value
    for c, pfx in _PREFIXES:
        out = F.when(code == c, F.concat(F.lit(pfx), value)).otherwise(out)
    return out


def compact_triples(triples: DataFrame) -> DataFrame:
    """Standard triple frame -> compact storage frame (adds *_pfx codes)."""
    s_v, s_c = _strip(F.col("s_value"))
    p_v, p_c = _strip(F.col("predicate"))
    o_v, o_c = _strip(F.col("o_value"))
    is_iri = F.col("o_kind") == KIND_IRI
    return triples.select(
        F.col("s_kind"),
        s_v.alias("s_value"),
        s_c.alias("s_pfx"),
        p_v.alias("predicate"),
        p_c.alias("p_pfx"),
        F.col("o_kind"),
        F.when(is_iri, o_v).otherwise(F.col("o_value")).alias("o_value"),
        F.when(is_iri, o_c).otherwise(F.lit(0).cast("tinyint")).alias("o_pfx"),
        F.col("o_datatype"),
        F.col("o_lang"),
    )


def maybe_expand(df: DataFrame) -> DataFrame:
    """Expand iff the frame carries compact-storage columns — lets read
    paths work against both storage formats."""
    return expand_triples(df) if "s_pfx" in df.columns else df


def expand_triples(compact: DataFrame) -> DataFrame:
    """Compact storage frame -> exact original triple frame."""
    return compact.select(
        F.col("s_kind"),
        _restore(F.col("s_value"), F.col("s_pfx")).alias("s_value"),
        _restore(F.col("predicate"), F.col("p_pfx")).alias("predicate"),
        F.col("o_kind"),
        _restore(F.col("o_value"), F.col("o_pfx")).alias("o_value"),
        F.col("o_datatype"),
        F.col("o_lang"),
    )
