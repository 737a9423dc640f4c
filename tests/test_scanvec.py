"""Batched candidate-scan equivalence (core.scanvec).

The ScanBundle path may only change WHERE regexes are tried, never what
they match: every candidate list is a superset of true match starts that
``analyze`` re-verifies with anchored ``rx.match``, and the gate prescreen
sets are sound necessary conditions for literal containment. These tests
pin (1) bundle fields == the per-document regex scans they replace, and
(2) analyze(text) == analyze(text, scans=bundle) — on the corpus and on
adversarial/hypothesis inputs (unicode digits, acronyms, run edges).
"""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pii_detection_redaction_spark.core import recognizers as R
from pii_detection_redaction_spark.core import scanvec as SV
from pii_detection_redaction_spark.core.chunker import analyze_long_text
from pii_detection_redaction_spark.testing.corpus import pages_df

_UA = re.compile(r"[A-Z0-9]+")
_UU = re.compile(r"(?=([A-Z]{2}))")


def _ref(t):
    ds = [m.start() for m in SV.DIGIT_RUN_RE.finditer(t)]
    cw = [(m.start(), m.group()) for m in SV.CAPWORD_RE.finditer(t)]
    ua = [
        m.start()
        for m in _UA.finditer(t)
        if m.end() - m.start() >= SV.UPPER_RUN_MIN
    ]
    uub = {m.group(1) for m in _UU.finditer(t)}
    cwp = {w[:2] for _, w in cw}
    return ds, cw, ua, uub, cwp


def _assert_bundle_matches(texts):
    bundles = SV.batch_scan(texts)
    assert bundles is not None and len(bundles) == len(texts)
    for t, b in zip(texts, bundles):
        ds, cw, ua, uub, cwp = _ref(t)
        if not t:
            assert b is None
            continue
        assert b.digit_starts == ds
        assert b.capwords == cw
        assert b.upper_run_starts == ua
        assert set(b.uu_bigrams) == uub
        assert set(b.cw_prefixes) == cwp


def test_bundle_fields_equal_regex_scans_on_corpus():
    _assert_bundle_matches(pages_df(300)["text"].tolist())


def test_bundle_edge_shapes():
    _assert_bundle_matches(
        [
            "",
            "A",
            "Abc",
            "ABCDEF",  # exactly UPPER_RUN_MIN
            "ABCDE",  # one short of it
            "ABCDEF123456ghi",  # long run ending in lowercase
            "xABCDEF1",  # run preceded by a word char
            "NSW VIC QLD",  # acronyms
            "Wales",  # capword at end of batch-joined buffer
            "123 456789",  # digit runs
            "٣٤٥٦٧٨ and ١٢",  # unicode decimal digits are \d
            "McDonald's Ma'am",  # apostrophes split capwords
            "ends with lower run abc",
        ]
    )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="AB12ab _-.XYZ09z\nQ\t٣٤ÀàΩω'NSWales",
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_bundle_fields_equal_regex_scans_fuzz(texts):
    _assert_bundle_matches(texts)


def test_analyze_identical_with_and_without_bundle_on_corpus():
    texts = pages_df(300)["text"].tolist()
    bundles = SV.batch_scan(texts)
    for t, b in zip(texts, bundles):
        assert R.analyze(t) == R.analyze(t, scans=b)
        assert analyze_long_text(t) == analyze_long_text(t, scans=b)


@pytest.mark.parametrize(
    "min_score,entities",
    [(0.4, None), (0.0, ["financial"]), (0.6, ["PERSON", "EMAIL_ADDRESS"])],
)
def test_analyze_identical_under_subsetting(min_score, entities):
    texts = pages_df(120)["text"].tolist()
    bundles = SV.batch_scan(texts)
    for t, b in zip(texts, bundles):
        assert R.analyze(t, entities=entities, min_score=min_score) == R.analyze(
            t, entities=entities, min_score=min_score, scans=b
        )


# PII-shaped fragments so fuzz inputs actually exercise recognizers, plus
# gate-literal heads so the prescreen sets see hits and near-misses.
_FRAGMENTS = st.sampled_from(
    [
        "Mr John Smith",
        "mr john",
        "NSW",
        "USA",
        "Dear Anna,",
        "dear anna",
        "jane@example.com",
        "ABN 51 824 753 556",
        "TFN 123 456 782",
        "call 0412 345 678",
        "XK72ND9Q",
        "Applicant: Bob Lee",
        "applicant bob",
        "Acme Pty Ltd",
        "LLC",
        "12 Mar 2024",
        "Victoria",
        "ustralia",
        "Ma'am",
        "driver licence 123456A",
    ]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_FRAGMENTS, min_size=0, max_size=6), st.text(max_size=20))
def test_analyze_identical_fuzz(frags, noise):
    t = " ".join(frags + [noise])
    bundles = SV.batch_scan([t])
    b = bundles[0] if bundles else None
    assert R.analyze(t) == R.analyze(t, scans=b)


def test_gate_hit_equals_plain_containment():
    """_gate_hit over a bundle == any(lit in text) for every gate tuple in
    the bank, on corpus docs and crafted near-misses."""
    tuples = set()
    for spec in R.default_bank():
        for pre in [spec.precondition] + [p.precondition for p in spec.patterns]:
            if type(pre) is tuple:
                tuples.add(pre)
    assert tuples, "expected any-of tuple gates in the bank"
    texts = pages_df(200)["text"].tolist() + [
        "USA TAS",  # uu bigram present ("TA"/"AS"/"US"/"SA")
        "Mrx",  # "Mr" head present via capword? 'r' lower yes -> hit
        "mr ms dr",  # lowercase: no capword heads
        "Prof. X",
        "Ltd",
        "xLtd",
    ]
    bundles = SV.batch_scan(texts)
    for t, b in zip(texts, bundles):
        if b is None:
            continue
        for pre in tuples:
            want = any(lit in t for lit in pre)
            got = R._gate_hit(R._classified_gate(pre), t, b)
            assert got == want, (pre, t[:60])
