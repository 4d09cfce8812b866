"""Primitive lexical grammar suite — mirrors the reference's per-type grammar
tests (``Validation/JsonNodeStructuralValidator.cs:84-97`` dispatch table;
grammar impls ``:738-829``, ``:1209-1290``; the reference ships 117 grammar
tests across its Phase-1 suites). Valid/invalid example lists per type, plus
kernel-level dispatch through a compiled profile."""

import pyarrow as pa
import pytest

from helpers import make_docs, profile_of, rows, validate

from fhir_data_validation_ray.functions.kernels import (
    calendar_ok,
    primitive_invalid_mask,
)

# (primitive, valid values, invalid values). Deliberate parity pins:
# - "2021-13" date: partial dates are regex-only (ValidateDate checks the
#   calendar ONLY for length-10 values, ``:738-754``)
# - "" string: empty is VALID for string (``:779-790``), INVALID for
#   code/id/uri/url/canonical/date/boolean/integer/decimal
GRAMMAR_CASES = [
    ("boolean", ["true", "false"],
     ["True", "FALSE", "1", "0", "yes", "", " true", "true ", "truefalse"]),
    ("integer", ["0", "42", "-7", "+13", "00120", "+0", "-0", "007"],
     ["1.5", "abc", "1e3", " 1", "", "1 ", "+-1", "4 2", "0x1F"]),
    ("decimal", ["0", "3.14", "-0.5", "+2.75", ".5", "0.0", ".0", "-.25", "100"],
     ["1.", "abc", "1e3", "1,5", "", "0..1", "1.2.3", "+", "."]),
    (
        "date",
        ["2021-03-14", "2020-02-29", "1999-12-31", "2024", "2024-06", "2021-13",
         "0001", "9999-12-31", "2400-02-29", "2000-02-29", "2023-01-31",
         "2023-04-30", "2023-12"],
        ["2021-02-30", "2021-13-05", "2021-04-31", "2023-02-29", "21-01-01",
         "2021/01/01", "2021-1-1", "not-a-date", "", "1900-02-29",
         "2023-06-31", "2023-09-31", "2023-11-31", "2023-00-01", "2023-01-00",
         "2023-01-32", "202", "20231-01-01"],
    ),
    (
        "dateTime",
        ["2021-03-14T08:30:00Z", "2019-07-01T23:59:59.123+08:00", "2021-03-14",
         "2024-06", "2024", "2038-01-19T03:14:07-05:00",
         "2024-02-29T23:59:59Z", "2021-03-14T00:00:00+00:00",
         "2021-03-14T08:30:00.000001Z", "2021-12-31T23:59:59-13:59",
         "2021-03-14T08:30:00+14:00", "2021-03-14T08:30:00-14:00"],
        ["2021-03-14T24:00:00Z", "2021-03-14T08:30:00", "2021-02-30T08:30:00Z",
         "14-03-2021T08:30:00Z", "2021-03-14 08:30:00Z", "2021-03-14T08:30Z", "",
         "2023-02-29T00:00:00Z", "2021-03-14t08:30:00Z", "2021-03-14T08:30:60Z",
         "2021-03-14T08:60:00Z", "2021-03-14T08:30:00+14:01",
         "2021-03-14T08:30:00+15:00", "2021-03-14T08:30:00."],
    ),
    ("id", ["abc", "a.b-c", "A" * 64, "123", "a", "A-1.b"],
     ["", "A" * 65, "a_b", "a b", "a/b", "a@b", "ümlaut"]),
    ("string", ["hello world", "", "tabs\tok", "  padded  ", "ünïcode"],
     ["line\nbreak", "cr\rhere", "both\r\nends"]),
    ("code", ["active", "a-b.c", "x|y", "日本語", "UPPER_lower-1.2"],
     ["", "a b", " a", "a ", "a\tb", "a\nb", "\x01", "a\x7fb"]),
    ("uri", ["https://example.org/x", "Patient/123", "urn:oid:1.2.3", "a|b",
             "ünïcode-path", "#fragment", "?q=1"],
     ["", "a b", "with\ttab", "\x01ctl", "two  spaces"]),
    (
        "url",
        ["https://example.org/x", "urn:oid:1.2.3", "ftp://f.example.org/x.bin",
         "http://example.org/vs|2.0", "HTTPS://UPPER.example", "x+y.z-1:rest"],
        ["", "Patient/123", "relative/path", "http://a b", "http:", "1http://x",
         ":noscheme", "-x://y"],
    ),
    (
        "canonical",
        ["https://example.org/vs", "https://example.org/vs|2.0.0", "urn:oid:1.2.3",
         "https://example.org/vs|2.0.0-beta.1"],
        ["", "Patient/123", "https://example.org/vs|1|2", "https://example.org/vs|",
         "https://example.org/a b|1", "urn:oid:1|2|3", "|2.0"],
    ),
]


@pytest.mark.parametrize("prim,valid,invalid", GRAMMAR_CASES,
                         ids=[c[0] for c in GRAMMAR_CASES])
def test_grammar(prim, valid, invalid):
    arr = pa.array(valid + invalid + [None], pa.string())
    bad = primitive_invalid_mask(prim, arr)
    got_valid = [v for v, b in zip(valid + invalid, bad[:-1]) if not b]
    got_invalid = [v for v, b in zip(valid + invalid, bad[:-1]) if b]
    assert got_valid == valid, f"{prim}: false positives {set(valid) - set(got_valid)}"
    assert got_invalid == invalid, f"{prim}: misses {set(invalid) - set(got_invalid)}"
    assert not bad[-1], f"{prim}: null must never be flagged"


def test_calendar_ok_leap_years():
    arr = pa.array(
        ["2000-02-29", "1900-02-29", "2400-02-29", "2100-02-29", "2024-02-29",
         "2023-02-28", "no-date-prefix"]
    )
    assert list(calendar_ok(arr)) == [True, False, True, False, True, True, True]


def test_primitive_kernel_dispatch():
    docs = make_docs(
        [
            ("d1", [("date", "2021-03-14", "", 0), ("uri", "ok:/x", "", 1)]),
            ("d2", [("date", "2021-02-30", "", 0), ("date", None, "", 1)]),
            ("d3", [("uri", "has space", "", 0), ("text", "has space", "", 1)]),
        ]
    )
    p = profile_of(
        {"id": "P1", "type": "Primitive", "kind": "date", "fieldPath": "text",
         "params": {"primitive": "date"}},
        {"id": "P2", "type": "Primitive", "kind": "uri", "fieldPath": "text",
         "params": {"primitive": "uri"}},
    )
    v = validate(docs, p)
    assert rows(v) == [
        ("d2", 0, "FHIR_INVALID_PRIMITIVE", "error"),
        ("d3", 0, "FHIR_INVALID_PRIMITIVE", "error"),
    ]
    # STRUCTURE source (grammar errors come from the structural authority)
    assert set(v["source"].to_pylist()) == {"STRUCTURE"}


def test_primitive_unknown_type_rejected():
    from fhir_data_validation_ray.profile import ProfileError, parse_profile

    with pytest.raises(ProfileError):
        parse_profile(
            profile_of({"id": "P", "type": "Primitive", "kind": "x",
                        "params": {"primitive": "instant"}})
        )
