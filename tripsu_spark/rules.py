"""Rules config: YAML load, CURIE expansion, URI validation (O11).

Semantics from reference src/rules.rs:83-150 and src/uris.rs:
- a rules doc has ``invert`` (bool), ``prefixes`` (map prefix->"<uri>",
  with "" or null key as the default prefix), ``nodes.of_type`` (set),
  ``objects.on_predicate`` (set), ``objects.on_type_predicate``
  (map type -> set of predicates);
- every URI is either a full URI in angle brackets (validated) or a
  CURIE matched by ``([A-Za-z_][A-Za-z0-9_.\\-]*)?:([^\\s:/][^\\s]*)``
  (uris.rs:45) expanded against the prefix map at load time;
- loading fails fast on anything invalid (io.rs:46-55).

Expanded rule URIs are kept in *serialized* form ("<full-uri>"),
because that is what the reference compares against: the type index
stores ``term.to_string()`` (index.rs:87) and rule matching compares
those serializations (rules.rs:220-252).

This all runs on the driver (the config is tiny); the result is
broadcast implicitly as literal columns by the mask builder.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import yaml

_CURIE_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_.\-]*)?\:([^\s:/][^\s]*)$")


class RuleConfigError(ValueError):
    """Invalid rules config — mirrors the reference's fail-fast panics."""


def _validate_full_iri(iri: str) -> str:
    # Full RFC 3987 grammar — the same production the reference's
    # sophia_iri::Iri::new enforces (uris.rs:47-50); fail-fast parity.
    from .functions.iri import is_valid_iri

    if not is_valid_iri(iri):
        raise RuleConfigError(f"Invalid URI: {iri}")
    return iri


def _parse_uri(value: str) -> tuple[str, str]:
    """Classify as ('full', bare_iri) or ('curie', text); raise otherwise.

    Mirrors uris.rs:42-60 (TryFrom<String> for Uri).
    """
    if value.startswith("<") and value.endswith(">"):
        return "full", _validate_full_iri(value[1:-1])
    if _CURIE_RE.match(value):
        return "curie", value
    raise RuleConfigError(
        "Input should be either a URI enclosed in '<>' or a CURIE. "
        f"Found: {value}"
    )


class PrefixMap:
    """Prefix -> base-IRI map; '' / null prefix is the default (uris.rs:130-152)."""

    def __init__(self, mapping: dict[str | None, str] | None = None):
        self._map: dict[str, str] = {}
        self._default: str | None = None
        for key, value in (mapping or {}).items():
            kind, _ = _parse_uri(value)
            if kind != "full":
                raise RuleConfigError(f"Invalid URI provided for prefix: {value}")
            bare = value[1:-1]
            if key in (None, ""):
                self._default = bare
            elif key == "_":
                raise RuleConfigError(f'Prefix "_" not allowed: {value}')
            else:
                self._map[str(key)] = bare

    def expand(self, value: str) -> str:
        """Expand a full URI or CURIE to serialized '<full-uri>' form."""
        kind, body = _parse_uri(value)
        if kind == "full":
            return f"<{body}>"
        prefix, local = body.split(":", 1)
        if prefix == "":
            if self._default is None:
                raise RuleConfigError(f"No default prefix provided for: {value}")
            return f"<{self._default}{local}>"
        if prefix not in self._map:
            raise RuleConfigError(f"Invalid prefix: {value}")
        return f"<{self._map[prefix]}{local}>"


@dataclass
class Rules:
    """Expanded, validated rules. All URIs in serialized '<...>' form."""

    invert: bool = False
    node_of_type: frozenset[str] = frozenset()
    object_on_predicate: frozenset[str] = frozenset()
    object_on_type_predicate: dict[str, frozenset[str]] = field(default_factory=dict)

    @staticmethod
    def from_dict(doc: dict) -> "Rules":
        doc = doc or {}
        prefixes = PrefixMap(doc.get("prefixes"))
        nodes = doc.get("nodes") or {}
        objects = doc.get("objects") or {}
        of_type = frozenset(prefixes.expand(u) for u in (nodes.get("of_type") or []))
        on_pred = frozenset(
            prefixes.expand(u) for u in (objects.get("on_predicate") or [])
        )
        on_type_pred = {
            prefixes.expand(k): frozenset(prefixes.expand(p) for p in v or [])
            for k, v in (objects.get("on_type_predicate") or {}).items()
        }
        return Rules(
            invert=bool(doc.get("invert", False)),
            node_of_type=of_type,
            object_on_predicate=on_pred,
            object_on_type_predicate=on_type_pred,
        )

    @staticmethod
    def from_yaml(text: str) -> "Rules":
        return Rules.from_dict(yaml.safe_load(text))

    @staticmethod
    def load(path: str) -> "Rules":
        with open(path, "r", encoding="utf-8") as fh:
            return Rules.from_yaml(fh.read())

    def is_empty(self) -> bool:
        return not (
            self.node_of_type
            or self.object_on_predicate
            or self.object_on_type_predicate
        )
