"""RFC 3987 IRI validation (fail-fast parity with the reference).

The reference validates every full URI in the rules config with
``sophia_iri::Iri::new`` (uris.rs:47-50), i.e. the RFC 3987 ``IRI``
production (absolute, scheme required, fragment allowed). Round-1
shipped a pragmatic "scheme + no whitespace" regex that accepted
strings the reference fails fast on; this module encodes the actual
grammar (public spec: RFC 3987 §2.2, which layers ucschar/iprivate on
the RFC 3986 ABNF).

Driver-side only — rules configs are tiny; triples terms are validated
by the N-Triples parser, not here.
"""

from __future__ import annotations

import re

# --- RFC 3987 character classes -------------------------------------
# ucschar = %xA0-D7FF / %xF900-FDCF / %xFDF0-FFEF / %x10000-1FFFD
#         / %x20000-2FFFD / %x30000-3FFFD / %x40000-4FFFD
#         / %x50000-5FFFD / %x60000-6FFFD / %x70000-7FFFD
#         / %x80000-8FFFD / %x90000-9FFFD / %xA0000-AFFFD
#         / %xB0000-BFFFD / %xC0000-CFFFD / %xD0000-DFFFD
#         / %xE1000-EFFFD
_UCSCHAR = (
    " -퟿豈-﷏ﷰ-￯"
    "\U00010000-\U0001fffd\U00020000-\U0002fffd\U00030000-\U0003fffd"
    "\U00040000-\U0004fffd\U00050000-\U0005fffd\U00060000-\U0006fffd"
    "\U00070000-\U0007fffd\U00080000-\U0008fffd\U00090000-\U0009fffd"
    "\U000a0000-\U000afffd\U000b0000-\U000bfffd\U000c0000-\U000cfffd"
    "\U000d0000-\U000dfffd\U000e1000-\U000efffd"
)
# iprivate = %xE000-F8FF / %xF0000-FFFFD / %x100000-10FFFD
_IPRIVATE = "-\U000f0000-\U000ffffd\U00100000-\U0010fffd"

_IUNRESERVED = rf"A-Za-z0-9\-._~{_UCSCHAR}"
_SUB_DELIMS = r"!$&'()*+,;="
_PCT = r"%[0-9A-Fa-f]{2}"

_IPCHAR = rf"(?:[{_IUNRESERVED}{_SUB_DELIMS}:@]|{_PCT})"

# --- host -------------------------------------------------------------
_DEC_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
_IPV4 = rf"(?:{_DEC_OCTET}\.){{3}}{_DEC_OCTET}"
_H16 = r"[0-9A-Fa-f]{1,4}"
_LS32 = rf"(?:{_H16}:{_H16}|{_IPV4})"
_IPV6 = (
    rf"(?:(?:{_H16}:){{6}}{_LS32}"
    rf"|::(?:{_H16}:){{5}}{_LS32}"
    rf"|(?:{_H16})?::(?:{_H16}:){{4}}{_LS32}"
    rf"|(?:(?:{_H16}:)?{_H16})?::(?:{_H16}:){{3}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,2}}{_H16})?::(?:{_H16}:){{2}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}"
    rf"|(?:(?:{_H16}:){{0,4}}{_H16})?::{_LS32}"
    rf"|(?:(?:{_H16}:){{0,5}}{_H16})?::{_H16}"
    rf"|(?:(?:{_H16}:){{0,6}}{_H16})?::)"
)
_IPVFUTURE = rf"[Vv][0-9A-Fa-f]+\.[{_IUNRESERVED}{_SUB_DELIMS}:]+"
_IP_LITERAL = rf"\[(?:{_IPV6}|{_IPVFUTURE})\]"
_IREG_NAME = rf"(?:[{_IUNRESERVED}{_SUB_DELIMS}]|{_PCT})*"
_IHOST = rf"(?:{_IP_LITERAL}|{_IPV4}|{_IREG_NAME})"

_IUSERINFO = rf"(?:[{_IUNRESERVED}{_SUB_DELIMS}:]|{_PCT})*"
_IAUTHORITY = rf"(?:{_IUSERINFO}@)?{_IHOST}(?::[0-9]*)?"

# --- paths ------------------------------------------------------------
_ISEGMENT = rf"{_IPCHAR}*"
_ISEGMENT_NZ = rf"{_IPCHAR}+"
_IPATH_ABEMPTY = rf"(?:/{_ISEGMENT})*"
_IPATH_ABSOLUTE = rf"/(?:{_ISEGMENT_NZ}(?:/{_ISEGMENT})*)?"
_IPATH_ROOTLESS = rf"{_ISEGMENT_NZ}(?:/{_ISEGMENT})*"

_IHIER_PART = (
    rf"(?://{_IAUTHORITY}{_IPATH_ABEMPTY}"
    rf"|{_IPATH_ABSOLUTE}"
    rf"|{_IPATH_ROOTLESS}"
    rf"|)"  # ipath-empty
)

_IQUERY = rf"(?:{_IPCHAR}|[{_IPRIVATE}/?])*"
_IFRAGMENT = rf"(?:{_IPCHAR}|[/?])*"

_SCHEME = r"[A-Za-z][A-Za-z0-9+.\-]*"

IRI_RE = re.compile(
    rf"^{_SCHEME}:{_IHIER_PART}(?:\?{_IQUERY})?(?:#{_IFRAGMENT})?$"
)


def is_valid_iri(s: str) -> bool:
    """RFC 3987 absolute-IRI-with-optional-fragment check, the same
    production sophia_iri::Iri::new enforces."""
    return bool(IRI_RE.match(s))
