"""Presidio-builtin parity decisions, pinned (COVERAGE.md "Builtin
recognizer parity" table is the prose form of this test).

The reference builds a DEFAULT presidio ``AnalyzerEngine``
(``common/common.py:31-51``) and adds its custom AU recognizers on top, so
presidio's predefined recognizers for ``en`` are implicitly enabled. This
engine re-implements the subset the reference actually SURFACES (its
severity map, ``entity_config.py:5-38``, drives every UI/report path) and
documents each deliberate divergence. Every decision below is an assertion,
so a drive-by change to the bank fails this test, not just the docs."""

from pii_detection_redaction_spark.core.entities import ENTITY_SEVERITY
from pii_detection_redaction_spark.core.recognizers import (
    _builtin_specs,
    analyze,
    iban_ok,
    luhn_ok,
)

# presidio-analyzer's predefined recognizers for language='en' (public
# presidio source, the set the reference's default AnalyzerEngine loads)
PRESIDIO_EN_DEFAULTS = {
    "CREDIT_CARD", "CRYPTO", "DATE_TIME", "EMAIL_ADDRESS", "IBAN_CODE",
    "IP_ADDRESS", "MEDICAL_LICENSE", "PHONE_NUMBER", "URL", "UK_NHS",
    "US_BANK_NUMBER", "US_ITIN", "US_DRIVER_LICENSE", "US_PASSPORT",
    "US_SSN",
    # SpacyRecognizer NER surfaces (LOC/GPE map to LOCATION)
    "PERSON", "NRP", "LOCATION",
}

# decision: implemented builtins = presidio defaults ∩ the reference's
# surfaced severity map, with spaCy's PERSON replaced by the declared
# deterministic gazetteer + title/greeting/role heuristics (SURVEY §2.8 C5)
IMPLEMENTED = {
    "EMAIL_ADDRESS", "PHONE_NUMBER", "CREDIT_CARD", "IP_ADDRESS", "URL",
    "IBAN_CODE", "DATE_TIME",
}

# decision: NOT implemented — presidio defaults the reference never
# surfaces: absent from its severity map, so its UI/report paths drop them
# even when the engine emits them
OUT_OF_SCOPE = {
    "CRYPTO", "MEDICAL_LICENSE", "UK_NHS", "US_BANK_NUMBER", "US_ITIN",
    "US_DRIVER_LICENSE", "US_PASSPORT", "US_SSN", "NRP",
}


# decision: spaCy NER surfaces replaced by the declared deterministic
# gazetteer + title/greeting/role heuristics (SURVEY §2.8 C5-C7) — these
# specs live in the builtin bank next to the regex builtins
NER_REPLACEMENTS = {
    "PERSON", "PERSON_WITH_TITLE", "PERSON_AFTER_GREETING", "NAME_TITLE",
    "LOCATION", "ORGANIZATION", "AU_ADDRESS",
}


def test_builtin_entity_set_decisions():
    spec_types = {s.entity_type for s in _builtin_specs()}
    assert spec_types == IMPLEMENTED | NER_REPLACEMENTS
    # every implemented type is one the reference surfaces
    assert IMPLEMENTED <= set(ENTITY_SEVERITY)
    assert NER_REPLACEMENTS <= set(ENTITY_SEVERITY)
    # every skipped presidio default is one the reference does NOT surface
    assert OUT_OF_SCOPE & set(ENTITY_SEVERITY) == set()
    # the partition is exhaustive over presidio's en defaults (PERSON and
    # LOCATION are implemented via the gazetteer replacements, not spaCy)
    assert PRESIDIO_EN_DEFAULTS == (
        IMPLEMENTED | OUT_OF_SCOPE | {"PERSON", "LOCATION"}
    )


def _types(text, entities=None):
    return {d.entity_type for d in analyze(text, entities=entities)}


def test_email_parity():
    """Presidio: long RFC-ish pattern + tldextract validation. Ours: one
    RE2-safe regex (no lookaround — the same literal runs in Python, the
    JVM, and DuckDB). Same matches on conventional addresses."""
    assert "EMAIL_ADDRESS" in _types("reach me at jo.smith+tag@example.co")


def test_phone_divergence_library_vs_regex():
    """DELIBERATE divergence: presidio's PhoneRecognizer wraps the
    ``phonenumbers`` library (stateful parser, not a pattern). This engine
    uses a deterministic international regex — shareable with the SQL
    oracle — and +61 is owned by the AU recognizer, so the generic pattern
    excludes it (one span, one owner)."""
    assert "PHONE_NUMBER" in _types("call +1 415 555 0199 today")
    got = _types("call +61 2 9374 4000 today")
    assert "AU_PHONE_NUMBER" in got and "PHONE_NUMBER" not in got


def test_credit_card_parity_and_divergence():
    """Parity: Luhn mod-10 gating, exactly presidio's checksum. DELIBERATE
    divergence: only 4-4-4-3/4 groupings match — amex's 4-6-5 print format
    does not (the reference corpus plants 4-4-4-4; adding 4-6-5 would need
    a second pattern whose digit count collides with AU_ACCOUNT_NUMBER)."""
    assert luhn_ok("4111 1111 1111 1111")
    assert not luhn_ok("4111 1111 1111 1112")
    assert "CREDIT_CARD" in _types("card 4111 1111 1111 1111 on file")
    # Luhn-invalid candidates are rejected by the validator, not the regex
    assert "CREDIT_CARD" not in _types("card 4111 1111 1111 1112 on file")
    # amex 4-6-5 grouping: documented non-match
    assert "CREDIT_CARD" not in _types("card 3782 822463 10005 on file")


def test_ip_divergence_v4_only():
    """DELIBERATE divergence: IPv4 only. Presidio's IPv6 pattern is a
    ~1,500-char alternation that RE2 (the DuckDB oracle engine) compiles
    differently around zone-id/embedded-v4 corners; the planted corpus and
    the reference's own tests exercise IPv4."""
    assert "IP_ADDRESS" in _types("server at 10.1.2.3 responded")
    assert "IP_ADDRESS" not in _types("server at 2001:db8::8a2e:370:7334 x")


def test_url_divergence_scheme_required():
    """DELIBERATE divergence: URLs must carry an http(s) scheme. Presidio
    also matches bare domains via tldextract; a TLD table is a moving
    dependency and bare-domain matching floods prose with false positives
    at corpus scale."""
    assert "URL" in _types("see https://example.com/a?b=1 for details")
    assert "URL" not in _types("see example.com for details")


def test_iban_parity_and_divergence():
    """Parity: ISO 13616 mod-97 == 1, exactly presidio's checksum.
    DELIBERATE divergence: generic 2-letter/2-digit/11-30-alnum shape
    instead of presidio's per-country length table — the checksum already
    rejects virtually all malformed candidates and the table is another
    moving dependency."""
    assert iban_ok("GB82 WEST 1234 5698 7654 32")
    assert not iban_ok("GB82 WEST 1234 5698 7654 33")
    assert "IBAN_CODE" in _types("pay to GB82WEST12345698765432 now")
    assert "IBAN_CODE" not in _types("pay to GB83WEST12345698765432 now")


def test_date_time_parity():
    """Presidio's DateRecognizer shapes (iso, slashed, dashed, textual
    month, time-of-day) are covered one-for-one by the six patterns."""
    for s in (
        "2024-01-31", "31/01/2024", "31-01-2024", "31 January 2024",
        "January 31, 2024", "14:30:05",
    ):
        assert "DATE_TIME" in _types(f"due {s} sharp"), s
