"""Unit tests for the recognizer bank (the pinned detection spec).

The reference ships no tests (SURVEY.md §5.1); these tests freeze our
reimplementation of its recognizer semantics (au_recognizers.py patterns,
scores, checksums, context boost)."""

from pii_detection_redaction_spark.core.recognizers import (
    CONTEXT_BOOST,
    analyze,
    is_valid_abn,
    iban_ok,
    luhn_ok,
)


def _types(dets):
    return {d.entity_type for d in dets}


def _by_type(dets, t):
    return [d for d in dets if d.entity_type == t]


def test_abn_checksum():
    # 51 824 753 556 is the well-known valid example ABN (public ATO docs).
    assert is_valid_abn("51824753556")
    assert not is_valid_abn("51824753557")
    assert not is_valid_abn("1234567890")  # wrong length


def test_luhn():
    assert luhn_ok("4242424242424242")
    assert not luhn_ok("4242424242424241")
    assert not luhn_ok("1234")


def test_iban():
    assert iban_ok("DE89370400440532013000")
    assert not iban_ok("DE89370400440532013001")


def test_abn_detection_requires_valid_checksum():
    ok = analyze("Our abn is 51 824 753 556 for invoices.")
    assert "AU_ABN" in _types(ok)
    bad = analyze("Our abn is 51 824 753 557 for invoices.")
    assert "AU_ABN" not in _types(bad)


def test_context_boost_applied_and_capped():
    with_ctx = analyze("tax file number: 123-456-789")
    no_ctx = analyze("ref 123-456-789")
    tfn_with = _by_type(with_ctx, "AU_TFN")
    tfn_without = _by_type(no_ctx, "AU_TFN")
    assert tfn_with and tfn_without
    assert abs(tfn_with[0].score - (0.6 + CONTEXT_BOOST)) < 1e-9
    assert abs(tfn_without[0].score - 0.6) < 1e-9


def test_au_phone_and_generic_phone_disjoint():
    au = analyze("call 0412 345 678 now")
    assert _by_type(au, "AU_PHONE_NUMBER")
    gen = analyze("call +1 212 555 0123 now")
    assert _by_type(gen, "PHONE_NUMBER")
    assert not _by_type(gen, "AU_PHONE_NUMBER")


def test_credit_card_luhn_gate():
    assert "CREDIT_CARD" in _types(analyze("card 4242 4242 4242 4242 ok"))
    assert "CREDIT_CARD" not in _types(analyze("card 4242 4242 4242 4241 ok"))


def test_email_url_ip_date():
    t = "see https://ex.example.com/a?b=1 or mail bob.smith@ex.com from 10.0.0.1 on 2025-03-04"
    types = _types(analyze(t))
    assert {"URL", "EMAIL_ADDRESS", "IP_ADDRESS", "DATE_TIME"} <= types


def test_person_patterns():
    assert _by_type(analyze("Dear Mr. John Smith, welcome"), "PERSON_WITH_TITLE")
    d = _by_type(analyze("Hello Olivia Baker, hi"), "PERSON_AFTER_GREETING")
    assert d and d[0].start == 6 and d[0].end == len("Hello Olivia Baker")


def test_same_span_conflict_keeps_best_score():
    # 9-digit plain: AU_TFN(0.4) vs AU_ACN(0.4) vs CRN(0.35) — tie on score,
    # entity_type ascending → AU_ACN wins.
    dets = analyze("ref 123456789 end")
    span_dets = [d for d in dets if (d.start, d.end) == (4, 13)]
    assert len(span_dets) == 1 and span_dets[0].entity_type == "AU_ACN"
    # with tfn context the TFN recognizer is boosted and wins; tfn_spaced
    # (\s? optional) also matches the plain form, so base score is 0.5.
    dets2 = analyze("tfn 123456789 end")
    span2 = [d for d in dets2 if d.entity_type == "AU_TFN"]
    assert span2 and abs(span2[0].score - 0.85) < 1e-9


def test_containment_drops_lower_score_inner():
    # mobile 0412 345 678: inner '0412' postcode match is contained in the
    # higher-scoring phone span and must be dropped.
    dets = analyze("number 0412 345 678 listed")
    assert "AU_POSTCODE" not in _types(dets)
    assert _by_type(dets, "AU_PHONE_NUMBER")


def test_entity_subsetting():
    t = "tfn 123-456-789 and bob@ex.com"
    only_email = analyze(t, entities=["EMAIL_ADDRESS"])
    assert _types(only_email) == {"EMAIL_ADDRESS"}


def test_min_score_filter():
    dets = analyze("ref 123456789 end", min_score=0.5)
    assert all(d.score >= 0.5 for d in dets)


def test_au_state_deny_list():
    dets = analyze("Office in New South Wales and QLD today")
    states = _by_type(dets, "AU_STATE")
    assert len(states) == 2


def test_deterministic_ordering():
    t = "tfn 123-456-789, bob@ex.com, 0412 345 678, NSW 2000"
    a, b = analyze(t), analyze(t)
    assert [d.as_tuple() for d in a] == [d.as_tuple() for d in b]
    starts = [d.start for d in a]
    assert starts == sorted(starts)


def test_precondition_gating_is_lossless():
    """The per-spec AND per-pattern precondition gates are necessary
    conditions — analysis with gates must equal analysis with every gate
    stripped, over the full corpus plus adversarial strings around each
    gate boundary."""
    import dataclasses

    from pii_detection_redaction_spark.core.chunker import analyze_long_text
    from pii_detection_redaction_spark.core.recognizers import default_bank
    from pii_detection_redaction_spark.testing.corpus import pages_df

    ungated = default_bank()
    for s in ungated:
        s.precondition = None
        s.patterns = [
            dataclasses.replace(p, precondition=None) for p in s.patterns
        ]

    samples = list(pages_df(300).text)
    samples += [
        "No digits here at all, Mr. Smith said to Elizabeth Brown.",
        "ABCDEFG plain uppercase run without numbers",  # driver-license alnum pattern
        "email without at sign john dot smith example com",
        "contact j.s@x.io",  # minimal email
        "HTTP://UPPER.CASE/url and https://ok.example/x",
        "plus sign but no number + alone",
        "New South Wales and Victoria",  # AU_STATE, digit-free
        # any-of tuple-gate boundaries: each title/role/greeting/org cover
        # literal exercised with and without its full pattern context
        "Professor Plum met Madam Curie and a borrower, the Applicant Jane Doe.",
        "the customer waited; Patient Robert Brown arrived",  # role-word either case
        "Hello Alice Smith, and Good    evening Bob Jones",  # greeting gate
        "High noon hit her, hey there",  # contains 'Hi' substring, no greeting match
        "Acme Pty. Ltd and Beta Incorporated own Gamma Corporation",  # org suffixes
        "mrs mr ms dr prof lowercase titles never match",  # case-sensitive gate
        "Mx Taylor and Ma'am without names following",  # bare-title branch
        "no titles, no orgs, no greetings, just plain prose here",  # all gates skip
    ]
    for t in samples:
        gated = [d.as_tuple() for d in analyze_long_text(t)]
        full = [d.as_tuple() for d in analyze_long_text(t, bank=ungated)]
        assert gated == full, t[:80]


def test_anchor_prefilters_are_lossless():
    """The gazetteer token prefilter and the digit-run anchor are candidate
    SUPERSETS — analysis with them must equal a bank with every prefilter,
    anchor, and precondition stripped (pure finditer), over the corpus plus
    adversarial strings at each anchor boundary (mid-word names, digit runs
    abutting separators, boundary-free contexts)."""
    import dataclasses

    from pii_detection_redaction_spark.core.chunker import analyze_long_text
    from pii_detection_redaction_spark.core.recognizers import default_bank

    from pii_detection_redaction_spark.testing.corpus import pages_df

    brute = default_bank()
    for s in brute:
        s.precondition = None
        s.patterns = [
            dataclasses.replace(p, precondition=None, token_prefilter=None,
                                digit_anchor=False)
            for p in s.patterns
        ]

    samples = list(pages_df(300).text)
    samples += [
        # gazetteer anchor boundaries: names inside longer tokens, glued
        # casing, hyphen/apostrophe continuations, overlapping candidates
        "McDonald visited Sydney", "JamesBond", "Jamestown is near Perth",
        "Anna Lee-Smith met J. Smith", "Oliver Twist and Oliver",
        "Emma Watson Emma Stone Emma", "Liam O'Brien", "Label: Jack Ryan.",
        "James John Smith and John James",  # candidate inside a prior match
        # digit-run anchor boundaries: runs split by separators (each piece
        # is its own run start), runs inside words, run-final positions
        "call 0412 345 678 or (02) 9123 4567", "ABN 51 824 753 556",
        "ip 192.168.0.1 and 10.0.0.255", "card 4111 1111 1111 1111",
        "x-12345678-y", "a123456789b", "1.2.3.4.5", "ends with 1234",
        "12345678901234567890",  # one long run: only its start anchors
        "2021-03-04 12/31/99 01-02-2003 5 May 2021 May 5, 2021 10:30:15pm",
        "TFN 123 456 782 with AB1234567 passport",
    ]
    for t in samples:
        fast = [d.as_tuple() for d in analyze_long_text(t)]
        full = [d.as_tuple() for d in analyze_long_text(t, bank=brute)]
        assert fast == full, t[:80]


def test_token_prefilter_members_are_capword_shaped():
    """Structural soundness guard for PatternSpec.token_prefilter: the shared
    candidate scan emits maximal ``[A-Z][a-z]+`` tokens, so a prefilter is a
    sound anchor ONLY if every gazetteer alternative is exactly that shape.
    A future edit adding e.g. a two-word city ("St Kilda"), an all-caps
    entry, or a hyphenated name to a prefiltered gazetteer would silently
    drop matches — the behavioral lossless test above only sees the current
    corpus; this pins the invariant for any member set."""
    import re

    from pii_detection_redaction_spark.core.recognizers import default_bank

    capword = re.compile(r"[A-Z][a-z]+")
    seen = 0
    for spec in default_bank():
        for p in spec.patterns:
            if p.token_prefilter is None:
                continue
            seen += 1
            bad = [t for t in p.token_prefilter
                   if capword.fullmatch(t) is None]
            assert not bad, (
                f"{spec.entity_type}/{p.name}: token_prefilter members not "
                f"of [A-Z][a-z]+ shape (anchor would miss them): {bad[:5]}")
            # and the prefilter must COVER the regex's alternatives: every
            # capword literally present in the pattern source must be a
            # member (the alternation is built from the same gazetteer)
            for alt in capword.findall(p.regex):
                assert alt in p.token_prefilter, (
                    f"{spec.entity_type}/{p.name}: regex alternative {alt!r} "
                    f"missing from its token_prefilter — anchor would skip it")
    assert seen >= 2  # LOCATION city gazetteer + PERSON first-name gazetteer


def test_typed_person_entities():
    """Title/greeting/role-word persons are emitted as the reference's
    distinct entity types (entity_config.py:20-23); the gazetteer path stays
    PERSON."""
    dets = analyze("Dr Jane Doe met Miss Mary Smith.")
    assert {d.entity_type for d in dets if "PERSON" in d.entity_type} == {
        "PERSON_WITH_TITLE"
    }
    dets = analyze("Dear Alice Wonder, your parcel shipped.")
    assert _by_type(dets, "PERSON_AFTER_GREETING")
    dets = analyze("The patient Henry Ford was discharged.")
    assert [d.pattern_name for d in _by_type(dets, "PERSON_WITH_TITLE")] == [
        "person_after_role_word"
    ]
    dets = analyze("Oliver Twist asked for more.")
    assert _by_type(dets, "PERSON")


def test_name_title_bare_titles_and_role_words():
    """NAME_TITLE (reference entity_config.py:35, COMMON_TITLE matcher
    analyzer.py:226-250): bare titles/role words with no following name are
    their own low-severity type; title+name stays PERSON_WITH_TITLE."""
    text = "Each applicant and patient must sign; thanks, Sir."
    got = {(d.entity_type, text[d.start:d.end]) for d in analyze(text)}
    assert {("NAME_TITLE", "applicant"), ("NAME_TITLE", "patient"),
            ("NAME_TITLE", "Sir")} <= got
    # a following name suppresses the bare match — the typed person owns it
    text = "Mr. Smith met the applicant Jane Doe."
    dets = analyze(text)
    assert not [d for d in dets if d.entity_type == "NAME_TITLE"]
    assert {text[d.start:d.end]
            for d in dets if d.entity_type == "PERSON_WITH_TITLE"} == {
        "Smith", "Jane Doe"}
    # dotted bare title: backtracking must not shed the dot to evade the
    # name lookahead, and a genuine bare "Dr." matches with its dot
    text2 = "Ask the Dr. about dosage."
    spans = [(text2[d.start:d.end], d.pattern_name)
             for d in analyze(text2) if d.entity_type == "NAME_TITLE"]
    assert spans == [("Dr.", "bare_title_abbrev")]
    # plurals and lowercase title words are NOT titles
    assert not [d for d in analyze("Our customers are happy, said the professor.")
                if d.entity_type == "NAME_TITLE"]


def test_person_span_trimming():
    """C11 (pdf_redactor/analyzer.py:186-198): trailing .,;: stripped and a
    label-colon prefix re-anchors the span start."""
    from pii_detection_redaction_spark.core.recognizers import trim_person_span

    text = "Name:   Dr Jane Doe., rest"
    dets = analyze(text)
    spans = [(text[d.start : d.end]) for d in dets if d.entity_type == "PERSON_WITH_TITLE"]
    assert spans == ["Jane Doe"]
    # direct trim contract
    assert trim_person_span("label: Bob.,;:", 7, 14) == (7, 10)
    assert trim_person_span("x Bob", 2, 5) == (2, 5)


def test_name_variants():
    from pii_detection_redaction_spark.core.recognizers import name_variants

    assert set(name_variants("Doe, Jane")) == {"jane doe", "doe, jane"}
    v = name_variants("J. R. Hartley")
    assert "j r hartley" in v  # all-dots-stripped form
    # reverse-swap extension: plain First Last also yields the comma form
    assert "doe, jane" in name_variants("Jane Doe")


def test_repeated_name_propagation_and_scrub():
    """A titled name's later bare occurrences (any case, comma-swapped) are
    detected as REPEATED_NAME and masked with the SAME owner machinery —
    golden literal pins the flagship leak-class fix."""
    from pii_detection_redaction_spark.core.chunker import analyze_long_text
    from pii_detection_redaction_spark.core.scrub import scrub_document

    text = (
        "Dr Jane Doe approved the claim.\n"
        "Later jane doe confirmed, and Doe, Jane signed."
    )
    dets = analyze_long_text(text)
    rep = [(text[d.start : d.end]) for d in dets if d.entity_type == "REPEATED_NAME"]
    assert rep == ["jane doe", "Doe, Jane"]
    assert scrub_document(text, dets) == (
        "Dr PERSON_1 approved the claim.\n"
        "Later PERSON_2 confirmed, and PERSON_3 signed."
    )


def test_repeated_name_propagation_crosses_chunks():
    """Propagation is document-level: a name detected in chunk 1 masks a bare
    occurrence thousands of chars later (the reference's find-all machinery,
    analyzer.py:128-136, grafted onto the long-text path)."""
    from pii_detection_redaction_spark.core.chunker import analyze_long_text

    filler = "plain filler words here. " * 300  # ~7500 chars > chunk size
    text = f"Mr Walter Plinge arrived.\n{filler}\nwalter plinge left quietly."
    dets = analyze_long_text(text)
    rep = [d for d in dets if d.entity_type == "REPEATED_NAME"]
    assert len(rep) == 1 and text[rep[0].start : rep[0].end] == "walter plinge"


def test_repeated_name_not_blocked_by_weak_overlap():
    """A low-score false positive (all-caps surname as driver-license 0.3)
    must not block propagation; the scrubber then prefers the repeated name."""
    from pii_detection_redaction_spark.core.chunker import analyze_long_text
    from pii_detection_redaction_spark.core.scrub import scrub_document

    text = "Miss Mary Quant spoke. MARY QUANT returned."
    dets = analyze_long_text(text)
    assert any(
        d.entity_type == "REPEATED_NAME" and text[d.start : d.end] == "MARY QUANT"
        for d in dets
    )
    assert scrub_document(text, dets) == "Miss PERSON_1 spoke. PERSON_2 returned."


def test_entity_group_subsetting():
    """Group names expand to member types (entity_config.py:77-125 UX)."""
    text = (
        "Dr Jane Doe pays with card 4242 4242 4242 4242, "
        "BSB 062-000, email jane@x.example.com"
    )
    fin = analyze(text, entities=["financial"])
    assert _types(fin) <= {"AU_ABN", "AU_ACN", "AU_BANK_ACCOUNT", "AU_BSB",
                           "CREDIT_CARD", "IBAN_CODE"}
    assert "CREDIT_CARD" in _types(fin) and "AU_BSB" in _types(fin)
    pers = analyze(text, entities=["personal"])
    assert "EMAIL_ADDRESS" in _types(pers)
    assert not _types(pers) & {"CREDIT_CARD", "AU_BSB"}
    # literal type names still work alongside groups
    both = analyze(text, entities=["financial", "EMAIL_ADDRESS"])
    assert "EMAIL_ADDRESS" in _types(both) and "CREDIT_CARD" in _types(both)


def test_new_datetime_and_phone_formats():
    dets = analyze("Meeting 14-02-2025 at 9:45 pm, call 02 9876 5432.")
    names = {d.pattern_name for d in dets}
    assert {"date_dashed", "time_of_day", "phone_landline_domestic"} <= names


def test_safe_filename():
    from pii_detection_redaction_spark.core.sanitize import safe_filename

    assert safe_filename('a<b>c:d"e/f\\g|h?i*j.txt') == "a_b_c_d_e_f_g_h_i_j.txt"
    assert safe_filename("plain-name_ok.parquet") == "plain-name_ok.parquet"


def test_org_address_location_heuristics():
    """Deterministic ORG/ADDRESS/LOCATION spec closing the spaCy taxonomy
    (entity_config.py:71-72; severity rows exist for all three)."""
    dets = analyze("Invoices from Acme Widgets Pty Ltd were sent.")
    assert [
        ("ORGANIZATION", "Acme Widgets Pty Ltd")
    ] == [(d.entity_type, "Acme Widgets Pty Ltd") for d in _by_type(dets, "ORGANIZATION")]
    t = "Office: 12 George Street, Sydney NSW 2000."
    types = _types(analyze(t))
    assert {"AU_ADDRESS", "LOCATION", "AU_STATE", "AU_POSTCODE"} <= types
    assert "LOCATION" in _types(analyze("He moved to Melbourne last week."))
    assert not _types(analyze("plain lowercase text with ltd inside"))


def test_person_alias_expands_to_person_class():
    """entities=['PERSON'] must keep catching titled/greeted/repeated names
    (pre-split those patterns were PERSON — narrowing the request to the
    gazetteer alone would be a silent recall regression)."""
    from pii_detection_redaction_spark.core.chunker import analyze_long_text
    from pii_detection_redaction_spark.core.entities import (
        PERSON_TYPES,
        expand_entities,
    )

    assert expand_entities(["PERSON"]) == set(PERSON_TYPES)
    text = "Dr Zanthippe Quorl approved it. Later zanthippe quorl left."
    dets = analyze_long_text(text, entities=["PERSON"])
    got = {d.entity_type for d in dets}
    assert {"PERSON_WITH_TITLE", "REPEATED_NAME"} <= got
    # precise typed subsetting still possible with literal type names
    only_title = analyze_long_text(text, entities=["PERSON_WITH_TITLE"])
    assert {d.entity_type for d in only_title} == {"PERSON_WITH_TITLE"}


def test_severity_color_dim_parity():
    """C17 (reference entity_config.py:41-47): every severity level carries
    its display color; every dim row resolves to a non-default color and
    unknown types fall back to the severity default (medium/orange)."""
    from pii_detection_redaction_spark.core.entities import (
        SEVERITY_COLORS,
        SEVERITY_DIM_WITH_COLORS,
        color_of,
    )

    assert SEVERITY_COLORS["critical"] == (0.90, 0.00, 0.00)
    assert SEVERITY_COLORS["low"] == (0.10, 0.40, 0.85)
    assert len(SEVERITY_DIM_WITH_COLORS) == 29
    for _etype, sev, r, g, b in SEVERITY_DIM_WITH_COLORS:
        assert (r, g, b) == SEVERITY_COLORS[sev]
    assert color_of("AU_TFN") == SEVERITY_COLORS["critical"]
    assert color_of("NO_SUCH_TYPE") == SEVERITY_COLORS["medium"]


def test_compiled_bank_cache_guards_id_reuse():
    """_get_compiled keys on id(bank): a stale entry whose address was
    recycled by a DIFFERENT bank object must be rebuilt, not served (the
    cache stores the bank reference and verifies identity)."""
    from pii_detection_redaction_spark.core import recognizers as R

    bank_a = [
        R.RecognizerSpec(
            entity_type="ONLY_A",
            patterns=[R.PatternSpec("a", r"\balpha\b", 0.9)],
        )
    ]
    flat_a = R._get_compiled(bank_a)
    assert flat_a[0][0] == "ONLY_A"
    stored_bank, stored_flat = R._COMPILED[id(bank_a)]
    assert stored_bank is bank_a and stored_flat is flat_a

    bank_b = [
        R.RecognizerSpec(
            entity_type="ONLY_B",
            patterns=[R.PatternSpec("b", r"\bbeta\b", 0.9)],
        )
    ]
    # simulate CPython address reuse: plant bank A's compiled form under
    # bank B's id — the identity guard must reject it and rebuild
    R._COMPILED[id(bank_b)] = (bank_a, flat_a)
    flat_b = R._get_compiled(bank_b)
    assert flat_b[0][0] == "ONLY_B"
    # analyze() through the custom bank sees B's patterns, not A's
    dets = R.analyze("alpha beta", bank=bank_b)
    assert [d.entity_type for d in dets] == ["ONLY_B"]


def test_compiled_cache_bounded_lru_keeps_default():
    """The strong bank ref in _COMPILED defeats id() reuse but must not
    make every transient per-request bank immortal: the cache is a bounded
    LRU that never evicts the default bank."""
    from pii_detection_redaction_spark.core import recognizers as R

    R.analyze("warm the default bank")  # ensure default is compiled+cached
    default_key = next(
        k for k, v in R._COMPILED.items() if v[0] is R._DEFAULT_BANK
    )
    for i in range(3 * R._COMPILED_MAX):
        bank = [
            R.RecognizerSpec(
                entity_type=f"T{i}",
                patterns=[R.PatternSpec("p", r"\bzz\b", 0.5)],
            )
        ]
        R._get_compiled(bank)
    assert len(R._COMPILED) <= R._COMPILED_MAX
    assert default_key in R._COMPILED
    assert R._COMPILED[default_key][0] is R._DEFAULT_BANK


def test_group_expansion_widens_person_class():
    """A group whose member list carries PERSON ('all_au', 'personal')
    means person names like a literal PERSON request — narrowing it to the
    gazetteer pattern would skip titled/greeting/repeated-name recognizers
    and ship names unredacted."""
    from pii_detection_redaction_spark.core import recognizers as R
    from pii_detection_redaction_spark.core.entities import (
        PERSON_TYPES,
        expand_entities,
    )

    for req in (["all_au"], ["personal"], ["PERSON"]):
        assert PERSON_TYPES <= expand_entities(req), req
    # literal split types stay type-precise; non-person groups unchanged
    assert expand_entities(["PERSON_WITH_TITLE"]) == {"PERSON_WITH_TITLE"}
    assert "PERSON" not in expand_entities(["financial"])
    # end-to-end: the titled name is detected under the group request
    dets = R.analyze("Dear Mr Smith, your ref attached.", entities=["all_au"])
    assert any(d.entity_type in PERSON_TYPES for d in dets)
