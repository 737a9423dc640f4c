"""Compiled-regex PII recognizer bank — the detection specification.

Re-expresses (from scratch, public knowledge only) the recognizer surface of
the reference repo:

- 12 Australian recognizers with their exact patterns, per-pattern scores,
  context word lists, and the ABN mod-89 checksum
  (reference ``entity_mapping/au_recognizers.py:8-410``);
- the presidio-builtin recognizer *class* the reference enables implicitly via
  ``AnalyzerEngine`` defaults (``common/common.py:31-51``): EMAIL_ADDRESS,
  PHONE_NUMBER, CREDIT_CARD (Luhn), IP_ADDRESS, URL, IBAN_CODE (mod-97),
  DATE_TIME — reimplemented with our own documented patterns;
- deterministic person heuristics replacing spaCy NER (which is an
  uninstallable, non-deterministic dependency), emitted as the reference's
  distinct person entity types (``entity_mapping/entity_config.py:20-23``):
  PERSON_WITH_TITLE (title regexes modeled on ``pdf_redactor/analyzer.py:
  78-81`` plus the role-word titles of the COMMON_TITLE matcher,
  ``analyzer.py:226-268``), PERSON_AFTER_GREETING (``analyzer.py:83-86``),
  and gazetteer PERSON. These ARE the spec — golden fixtures pin them.
- person-span hygiene and repeated-name propagation from the reference's
  strongest recall machinery: span trimming (label-prefix colon rule +
  trailing punctuation, ``analyzer.py:186-198``), name normalization and
  variants ("Last, First" swap, dot-stripping, ``analyzer.py:105-125``), and
  case-insensitive word-bounded find-all of every known name variant
  (``analyzer.py:128-136``) emitting REPEATED_NAME detections — so a name
  detected once with a title also masks each later bare occurrence.

Presidio internals (context enhancement, conflict removal) are external code
we must not depend on; the constants used here (CONTEXT_BOOST, window sizes,
containment rules) are OUR documented spec, frozen by fixtures:

- context boost: if any context phrase for the recognizer occurs
  case-insensitively within ``CONTEXT_WINDOW_BEFORE`` chars before the span
  start or ``CONTEXT_WINDOW_AFTER`` chars after the span end, the score is
  raised by ``CONTEXT_BOOST`` and capped at 1.0 (modeled on presidio's
  documented LemmaContextAwareEnhancer defaults: factor 0.35, cap 1.0).
- conflict resolution (modeled on presidio's ``__remove_conflicts``):
  (1) identical (start, end, entity_type) keeps the max score;
  (2) identical (start, end) across types keeps the highest score,
      tie-broken by ascending entity_type;
  (3) a detection strictly contained in a longer detection with >= score
      is dropped. Partial overlaps survive analysis (scrub-time selection
      resolves them — see ``scrub.select_nonoverlapping``).
"""

from __future__ import annotations

import re
from collections import OrderedDict
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

from .entities import PERSON_TYPES, expand_entities
from .spans import Detection

CONTEXT_BOOST = 0.35
CONTEXT_WINDOW_BEFORE = 50
CONTEXT_WINDOW_AFTER = 20

# score of a propagated bare-name occurrence (our pinned spec; the reference
# Matcher path carries no score for REPEATED_NAME)
REPEATED_NAME_SCORE = 0.6


@dataclass(frozen=True)
class PatternSpec:
    name: str
    regex: str
    score: float
    flags: int = 0
    # Per-pattern NECESSARY condition, same encoding as
    # RecognizerSpec.precondition (r"\d" = needs a digit; a tuple = any-of
    # literal substrings; other str = literal substring). Lets a mostly-
    # numeric spec gate its numeric patterns while one alphanumeric pattern
    # stays ungated (AU_DRIVER_LICENSE). None = no per-pattern gate.
    precondition: Optional[Union[str, Tuple[str, ...]]] = None
    # Gazetteer fast path: when set, every possible match of this pattern
    # starts at a maximal ``[A-Z][a-z]+`` token whose text is IN this set
    # (sound for the gazetteer alternations: each alternative is exactly
    # such a token and the regex continuation after it cannot consume
    # further ``[a-z]``, so a match can neither start inside a capitalized
    # token nor extend the leading token — pinned by
    # test_anchor_prefilters_are_lossless). analyze() then scans the
    # document's capitalized tokens ONCE (shared across prefiltered
    # patterns) and anchors the full regex only at set members, instead of
    # running each big-alternation scan over the whole text (~2x detect
    # throughput on gazetteer-heavy web text).
    token_prefilter: Optional[frozenset] = None
    # Digit-anchor fast path: every possible match starts at the first digit
    # of a maximal digit run (sound whenever the regex's first consumed char
    # is a digit behind a \b — the predecessor is then a non-word char,
    # hence a non-digit, so the start digit cannot be run-interior).
    # None = infer from the regex source (prefix \b\d or \b(?:\d); the ipv4
    # pattern opts in explicitly — its digit-first alternation defeats the
    # prefix check). analyze() scans the document's digit runs ONCE and
    # anchors all such patterns there instead of ~24 full-text scans.
    digit_anchor: Optional[bool] = None
    # Upper-alnum-run anchor (driver_license_general): every possible match
    # of \b[A-Z0-9]{6,10}\b starts at a maximal [A-Z0-9] run of length >= 6
    # (the \b predecessor is a non-word char, hence outside the class, so
    # the start is run-initial; the match consumes >= 6 class chars). Only
    # used when the caller supplies a precomputed ScanBundle (core.scanvec)
    # — there is no per-document shortcut worth taking otherwise.
    upper_run_anchor: bool = False


@dataclass
class RecognizerSpec:
    """One entity recognizer: patterns + context words + optional validator.

    Extension point mirroring the reference's
    ``analyzer.registry.add_recognizer(...)`` (``common/common.py:46-49``):
    append a spec to the bank, no engine change needed.
    """

    entity_type: str
    patterns: List[PatternSpec]
    context: List[str] = field(default_factory=list)
    # validator(matched_text) -> bool; False drops the match entirely
    # (reference AbnRecognizer.validate_result, au_recognizers.py:47-49).
    validator: Optional[Callable[[str], bool]] = None
    # Cheap NECESSARY condition for any pattern of this spec to match:
    # r"\d" = text must contain a digit; a tuple = at least ONE of the
    # literal substrings must be present (any-of); any other str = that
    # literal substring must be present. Sound by construction (every
    # pattern literally requires it), so gating cannot change output —
    # verified by test_precondition_gating_is_lossless. None = always run.
    precondition: Optional[Union[str, Tuple[str, ...]]] = None

    def compiled(self):
        return [(p, re.compile(p.regex, p.flags), _digit_anchored(p))
                for p in self.patterns]


# ---------------------------------------------------------------------------
# Checksums / validators
# ---------------------------------------------------------------------------

_ABN_WEIGHTS = (10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19)


def is_valid_abn(text: str) -> bool:
    """ABN modulo-89 checksum (reference ``au_recognizers.py:36-49``)."""
    digits = [int(c) for c in text if c.isdigit()]
    if len(digits) != 11:
        return False
    digits[0] -= 1
    return sum(d * w for d, w in zip(digits, _ABN_WEIGHTS)) % 89 == 0


def luhn_ok(text: str) -> bool:
    """Luhn mod-10 check over the digits of a candidate card number."""
    digits = [int(c) for c in text if c.isdigit()]
    if not 13 <= len(digits) <= 19:
        return False
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def iban_ok(text: str) -> bool:
    """IBAN mod-97 == 1 check (ISO 13616)."""
    s = re.sub(r"\s+", "", text).upper()
    if not re.fullmatch(r"[A-Z]{2}\d{2}[A-Z0-9]{11,30}", s):
        return False
    rearranged = s[4:] + s[:4]
    num = "".join(str(ord(c) - 55) if c.isalpha() else c for c in rearranged)
    return int(num) % 97 == 1


# ---------------------------------------------------------------------------
# AU recognizers — patterns/scores/context transcribed as behavior from
# reference au_recognizers.py (file:line cited per spec)
# ---------------------------------------------------------------------------


def _au_specs() -> List[RecognizerSpec]:
    return [
        # au_recognizers.py:74-98
        RecognizerSpec(
            "AU_TFN",
            [
                PatternSpec("tfn_spaced", r"\b\d{3}\s?\d{3}\s?\d{3}\b", 0.5),
                PatternSpec("tfn_dashed", r"\b\d{3}-\d{3}-\d{3}\b", 0.6),
                PatternSpec("tfn_plain", r"\b\d{9}\b", 0.4),
            ],
            ["tfn", "tax file number", "tax file no", "tax file"],
        ),
        # au_recognizers.py:101-120
        RecognizerSpec(
            "AU_MEDICARE",
            [
                PatternSpec("medicare_spaced", r"\b\d{4}\s?\d{5}\s?\d{1}\b", 0.6),
                PatternSpec("medicare_plain", r"\b\d{10}\s?\d{1}\b", 0.55),
            ],
            ["medicare", "medicare number", "medicare card", "medicare no"],
        ),
        # au_recognizers.py:123-153
        RecognizerSpec(
            "AU_CENTRELINK_CRN",
            [
                PatternSpec("crn_10_digit", r"\b\d{10}\b", 0.4),
                PatternSpec("crn_9_digit", r"\b\d{9}\b", 0.35),
                PatternSpec("crn_spaced", r"\b\d{3}\s?\d{3}\s?\d{3,4}\b", 0.45),
            ],
            [
                "crn",
                "customer reference number",
                "centrelink",
                "centrelink number",
                "reference number",
            ],
        ),
        # au_recognizers.py:183-236
        RecognizerSpec(
            "AU_DRIVER_LICENSE",
            [
                # the five numeric formats carry per-pattern digit gates;
                # only the alphanumeric general pattern (which can match a
                # digit-free uppercase run) scans digit-free text
                PatternSpec("driver_license_nsw", r"\b\d{8}\b", 0.4,
                            precondition=r"\d"),
                PatternSpec("driver_license_vic", r"\b\d{10}\b", 0.4,
                            precondition=r"\d"),
                PatternSpec("driver_license_qld", r"\b\d{8,9}\b", 0.35,
                            precondition=r"\d"),
                PatternSpec("driver_license_sa_alpha", r"\b\d{6}[A-Z]\b", 0.5,
                            precondition=r"\d"),
                PatternSpec("driver_license_wa", r"\b\d{7}\b", 0.4,
                            precondition=r"\d"),
                PatternSpec("driver_license_general", r"\b[A-Z0-9]{6,10}\b", 0.3,
                            upper_run_anchor=True),
            ],
            [
                "driver license",
                "driver licence",
                "drivers license",
                "driving licence",
                "dl number",
                "license number",
                "licence number",
                "dl no",
            ],
        ),
        # au_recognizers.py:239-264
        RecognizerSpec(
            "AU_PASSPORT",
            [
                PatternSpec("passport_new_format", r"\b[A-Z]{1,2}\d{7}\b", 0.6),
                PatternSpec("passport_spaced", r"\b[A-Z]{1,2}\s?\d{7}\b", 0.55),
            ],
            [
                "passport",
                "passport number",
                "passport no",
                "australian passport",
                "travel document",
            ],
        ),
        # au_recognizers.py:8-49 (+ mod-89 validator)
        RecognizerSpec(
            "AU_ABN",
            [
                PatternSpec("abn_spaced", r"\b(?:\d[ ]?){11}\b", 0.5),
                PatternSpec("abn_grouped", r"\b\d{2}\s?\d{3}\s?\d{3}\s?\d{3}\b", 0.6),
                PatternSpec("abn_plain", r"\b\d{11}\b", 0.45),
            ],
            ["abn", "australian business number", "business number", "abn number"],
            validator=lambda t: is_valid_abn("".join(c for c in t if c.isdigit())),
        ),
        # au_recognizers.py:52-71
        RecognizerSpec(
            "AU_ACN",
            [
                PatternSpec("acn_spaced", r"\b\d{3}\s?\d{3}\s?\d{3}\b", 0.5),
                PatternSpec("acn_plain", r"\b\d{9}\b", 0.4),
            ],
            ["acn", "australian company number", "company number", "acn number"],
        ),
        # au_recognizers.py:156-180
        RecognizerSpec(
            "AU_BSB",
            [
                PatternSpec("bsb_dashed", r"\b\d{3}-\d{3}\b", 0.7),
                PatternSpec("bsb_spaced", r"\b\d{3}\s\d{3}\b", 0.65),
                PatternSpec("bsb_plain", r"\b\d{6}\b", 0.4),
            ],
            ["bsb", "bank state branch", "branch code", "bsb code"],
        ),
        # au_recognizers.py:267-309
        RecognizerSpec(
            "AU_PHONE_NUMBER",
            [
                PatternSpec("phone_mobile_intl", r"\+61\s?4\d{2}\s?\d{3}\s?\d{3}", 0.7),
                PatternSpec("phone_mobile_domestic", r"\b04\d{2}\s?\d{3}\s?\d{3}\b", 0.65,
                            digit_anchor=True),
                PatternSpec("phone_landline_brackets", r"\(0[2-8]\)\s?\d{4}\s?\d{4}", 0.6),
                PatternSpec("phone_landline_intl", r"\+61\s?[2-8]\s?\d{4}\s?\d{4}", 0.7),
                # bracket-free domestic landline (02 9876 5432) — recall gap
                # vs the reference's bank, added as our documented extension
                PatternSpec("phone_landline_domestic", r"\b0[2-8]\s?\d{4}\s?\d{4}\b", 0.55,
                            digit_anchor=True),
                PatternSpec("phone_tollfree", r"\b1[38]00\s?\d{3}\s?\d{3}\b", 0.6,
                            digit_anchor=True),
            ],
            ["phone", "telephone", "mobile", "contact", "call", "tel", "ph"],
        ),
        # au_recognizers.py:327-359
        RecognizerSpec(
            "AU_BANK_ACCOUNT",
            [
                PatternSpec("bank_account_typical", r"\b\d{6}[- ]?\d{6,10}\b", 0.45),
                PatternSpec("bank_account_long", r"\b\d{8,12}\b", 0.3),
                PatternSpec("bank_account_short", r"\b\d{6,7}\b", 0.25),
            ],
            [
                "bank account",
                "account number",
                "acct no",
                "account no",
                "acc no",
                "bsb",
                "account",
            ],
        ),
        # au_recognizers.py:361-383 — deny-list; presidio deny-lists compile to
        # word-bounded alternation with default score 0.5 (our pinned spec).
        RecognizerSpec(
            "AU_STATE",
            [
                PatternSpec(
                    "au_state_deny_list",
                    r"\b(?:New South Wales|Victoria|Queensland|South Australia"
                    r"|Western Australia|Tasmania|Australian Capital Territory"
                    r"|Northern Territory|NSW|VIC|QLD|SA|WA|TAS|ACT|NT)\b",
                    0.5,
                )
            ],
        ),
        # au_recognizers.py:385-408
        RecognizerSpec(
            "AU_POSTCODE",
            [PatternSpec("postcode_4digit", r"\b\d{4}\b", 0.35)],
            [
                "postcode",
                "postal code",
                "post code",
                "delivery address",
                "suburb",
                "address",
                "postcode:",
                "post:",
            ],
        ),
    ]


# ---------------------------------------------------------------------------
# Builtin-class recognizers (presidio defaults in the reference; OUR patterns)
# ---------------------------------------------------------------------------

_MONTHS = (
    r"(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?"
    r"|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?"
    r"|Dec(?:ember)?)"
)
# any-of gate for the textual-month date patterns: every _MONTHS alternative
# literally requires its case-stable 3-letter prefix (one shared tuple so
# analyze() memoizes a single scan per document)
_MONTH_LITERALS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
                   "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

# Deterministic first-name gazetteer replacing spaCy PERSON (seeded spec —
# spaCy en_core_web_lg is unavailable and non-deterministic; SURVEY.md §2.8 C5).
FIRST_NAMES = (
    "james john robert michael william david richard joseph thomas charles "
    "christopher daniel matthew anthony mark donald steven paul andrew joshua "
    "kenneth kevin brian george timothy ronald edward jason jeffrey ryan "
    "mary patricia jennifer linda elizabeth barbara susan jessica sarah karen "
    "lisa nancy betty margaret sandra ashley kimberly emily donna michelle "
    "carol amanda dorothy melissa deborah stephanie rebecca sharon laura "
    "cynthia amy anna ruth oliver charlotte amelia olivia isla noah jack "
    "leo henry mia grace sophie harper lucas liam emma ava ethan"
).split()

# name sequence: optional leading initials ("J. Smith" — the reference's
# Matcher allows initials in the given-name position, analyzer.py:279-284),
# then 1 + up to 3 capitalized tokens / initials
_NAME_SEQ = (
    r"(?:[A-Z]\.\s+){0,2}"
    r"[A-Z][a-z]+(?:[-'][A-Z][a-z]+)?(?:\s+(?:[A-Z]\.|[A-Z][a-z]+(?:[-'][A-Z][a-z]+)?)){0,3}"
)

# Deterministic city gazetteer for LOCATION (reference's spaCy LOC/GPE is
# replaced per SURVEY §2.8 C5 — this pinned list is our spec; AU capitals
# first, then common world cities appearing in web text).
CITY_NAMES = (
    "Sydney Melbourne Brisbane Perth Adelaide Canberra Hobart Darwin "
    "Auckland Wellington London Manchester Edinburgh Dublin Paris Berlin "
    "Munich Madrid Barcelona Rome Milan Amsterdam Brussels Zurich Geneva "
    "Vienna Stockholm Oslo Copenhagen Helsinki Lisbon Athens Warsaw Prague "
    "Budapest Tokyo Osaka Seoul Beijing Shanghai Singapore Mumbai Delhi "
    "Bangkok Jakarta Manila Toronto Vancouver Montreal Chicago Boston "
    "Seattle Austin Denver Houston Dallas Atlanta Miami Phoenix"
).split()

_ORG_SUFFIX = (
    r"(?:Pty\.?\s+Ltd\.?|Ltd\.?|Limited|Inc\.?|Incorporated|Corp\.?"
    r"|Corporation|LLC|PLC|Group|Holdings|Partners|Bank|University)"
)
_STREET_SUFFIX = (
    r"(?:Street|St|Road|Rd|Avenue|Ave|Boulevard|Blvd|Lane|Ln|Drive|Dr"
    r"|Court|Ct|Place|Pl|Parade|Pde|Highway|Hwy|Crescent|Cres|Terrace|Tce"
    r"|Way|Close|Circuit|Cct|Esplanade)"
)


# --- RE2-subset recount patterns (semantic constants, CLAUDE.md one-spec
# rule) -----------------------------------------------------------------
# Deliberately SIMPLIFIED spellings of four builtin detectors for the
# SQL-checkable recount queries (severity_rollup): no lookaround, ASCII
# classes only, so Java regex and RE2/DuckDB match identically. They are
# NOT the bank's detection patterns (email_basic above carries \b anchors,
# phone/date have context machinery) — the recount is a cross-engine
# arithmetic check over a simpler census, and keeping its patterns HERE
# next to the bank keeps any future bank edit in the same diff as its
# recount approximation.
RE2_SUBSET_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
RE2_SUBSET_IP_RE = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
)
RE2_SUBSET_URL_RE = r"https?://[A-Za-z0-9./_-]+"
RE2_SUBSET_DATE_RE = r"\b[0-9]{4}-[0-9]{2}-[0-9]{2}\b"


def _builtin_specs() -> List[RecognizerSpec]:
    return [
        RecognizerSpec(
            "EMAIL_ADDRESS",
            [
                PatternSpec(
                    "email_basic",
                    r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b",
                    0.85,
                )
            ],
            ["email", "e-mail", "mail", "contact"],
        ),
        RecognizerSpec(
            "PHONE_NUMBER",
            [
                PatternSpec(
                    "phone_intl_generic",
                    # international numbers other than +61 (AU recognizer owns those)
                    r"\+(?!61)\d{1,3}[ \-]?\d{2,4}[ \-]?\d{3,4}[ \-]?\d{3,4}\b",
                    0.5,
                ),
            ],
            ["phone", "telephone", "mobile", "call", "tel"],
        ),
        RecognizerSpec(
            "CREDIT_CARD",
            [
                PatternSpec(
                    "credit_card_16",
                    r"\b\d{4}[ \-]?\d{4}[ \-]?\d{4}[ \-]?\d{3,4}\b",
                    0.75,
                ),
            ],
            ["credit card", "card number", "visa", "mastercard", "amex", "cc"],
            validator=luhn_ok,
        ),
        RecognizerSpec(
            "IP_ADDRESS",
            [
                PatternSpec(
                    "ipv4",
                    r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
                    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b",
                    0.6,
                    # every octet alternative consumes a digit first, so a
                    # match always starts \b-then-digit — digit-run sound
                    digit_anchor=True,
                )
            ],
            ["ip", "ip address", "ipv4", "host"],
        ),
        RecognizerSpec(
            "URL",
            [
                PatternSpec(
                    "url_http",
                    r"\bhttps?://[A-Za-z0-9.\-]+(?:/[A-Za-z0-9._~:/?#\[\]@!$&'()*+,;=%\-]*)?"
                    r"(?<![.,;:!?)'\"])",
                    0.6,
                )
            ],
        ),
        RecognizerSpec(
            "IBAN_CODE",
            [PatternSpec("iban", r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b", 0.8)],
            ["iban", "bank", "account"],
            validator=iban_ok,
        ),
        RecognizerSpec(
            "DATE_TIME",
            [
                PatternSpec("date_iso", r"\b\d{4}-\d{2}-\d{2}\b", 0.6),
                PatternSpec("date_slash", r"\b\d{1,2}/\d{1,2}/\d{2,4}\b", 0.5),
                PatternSpec("date_dashed", r"\b\d{1,2}-\d{1,2}-\d{4}\b", 0.5),
                PatternSpec("date_dmy_text", rf"\b\d{{1,2}}\s+{_MONTHS}\s+\d{{4}}\b", 0.6,
                            precondition=_MONTH_LITERALS),
                PatternSpec("date_mdy_text", rf"\b{_MONTHS}\s+\d{{1,2}},?\s+\d{{4}}\b", 0.6,
                            precondition=_MONTH_LITERALS),
                PatternSpec(
                    "time_of_day",
                    r"\b\d{1,2}:\d{2}(?::\d{2})?(?:\s?[AaPp][Mm])?\b",
                    0.4,
                ),
            ],
            ["date", "born", "dob", "birth"],
        ),
        # Person heuristics, emitted as the reference's distinct entity types
        # (entity_config.py:20-23). Title/greeting regexes modeled on
        # pdf_redactor/analyzer.py:78-86 (title_name_re / greeting_name_re),
        # scoped to the captured name sequence.
        RecognizerSpec(
            "PERSON_WITH_TITLE",
            [
                # scores sit ABOVE the 0.8 gazetteer pattern: a titled name
                # that is also a gazetteer name must resolve to the typed
                # entity (conflict rule 2 keeps the higher score per span)
                PatternSpec(
                    "person_with_title",
                    # Mx included: the reference's COMMON_TITLE list has it,
                    # and without it here the NAME_TITLE bare-title lookahead
                    # would suppress the title while nothing owned the name
                    r"(?:\b(?:Mrs|Mr|Ms|Mx|Dr|Prof)\.?\s+|\b(?:Miss|Professor|Sir|Madam|Ma'am)\s+)"
                    rf"({_NAME_SEQ})",
                    0.85,
                ),
                # role-word titles from the reference's COMMON_TITLE matcher
                # (analyzer.py:226-268: applicant/candidate/customer/patient/
                # client/employee/student/recipient/borrower), adapted to our
                # regex engine: the role word must be followed by a name
                # sequence, which is the captured span.
                PatternSpec(
                    "person_after_role_word",
                    r"\b(?:[Aa]pplicant|[Cc]andidate|[Cc]ustomer|[Pp]atient"
                    r"|[Cc]lient|[Ee]mployee|[Ss]tudent|[Rr]ecipient|[Bb]orrower)\s+"
                    rf"({_NAME_SEQ})",
                    0.85,
                ),
            ],
        ),
        RecognizerSpec(
            "PERSON_AFTER_GREETING",
            [
                PatternSpec(
                    "person_after_greeting",
                    r"\b(?:Hello|Hi|Hey|Dear|Good\s+(?:morning|afternoon|evening))[\s,:\-]+"
                    rf"({_NAME_SEQ})",
                    0.82,
                ),
            ],
        ),
        # Bare titles / role words NOT followed by a name sequence — the
        # reference's COMMON_TITLE single-token matcher (analyzer.py:226-250,
        # token lists transcribed) emitted as its NAME_TITLE severity row
        # (entity_config.py:35, severity low). When a name DOES follow, the
        # PERSON_WITH_TITLE patterns above own the span (they capture the
        # name; the negative lookahead here keeps the two types disjoint).
        # Score 0.4 is our pinned spec (the Matcher path carries no score).
        RecognizerSpec(
            "NAME_TITLE",
            [
                PatternSpec(
                    "bare_title_abbrev",
                    # (?!\.) stops backtracking from dropping the dot of
                    # "Mr." to sidestep the name lookahead ("Mr. Smith"
                    # must NOT yield a bare "Mr" match)
                    r"\b(?:Mrs|Mr|Ms|Mx|Dr|Prof)\b\.?(?!\.)"
                    r"(?!\s+(?:[A-Z][a-z]|[A-Z]\.))",
                    0.4,
                ),
                PatternSpec(
                    "bare_title_word",
                    r"\b(?:Miss|Professor|Sir|Madam|Ma'am)\b(?!\s+(?:[A-Z][a-z]|[A-Z]\.))",
                    0.4,
                ),
                PatternSpec(
                    "bare_role_word",
                    r"\b(?:[Aa]pplicant|[Cc]andidate|[Cc]ustomer|[Pp]atient"
                    r"|[Cc]lient|[Ee]mployee|[Ss]tudent|[Rr]ecipient|[Bb]orrower)\b"
                    r"(?!\s+(?:[A-Z][a-z]|[A-Z]\.))",
                    0.4,
                ),
            ],
        ),
        # Deterministic ORGANIZATION / address / LOCATION heuristics closing
        # the reference's spaCy ORG/LOC/GPE taxonomy (entity_config.py:71-72,
        # severity rows ORGANIZATION=medium, AU_ADDRESS=medium, LOCATION=low)
        # without the non-deterministic model — OUR pinned spec.
        RecognizerSpec(
            "ORGANIZATION",
            [
                PatternSpec(
                    "org_legal_suffix",
                    # 1-4 capitalized name tokens followed by a legal/entity
                    # suffix; suffix included in the span
                    rf"\b((?:[A-Z][A-Za-z&'\-]+\s+){{1,4}}{_ORG_SUFFIX})(?=[^A-Za-z]|$)",
                    0.55,
                ),
            ],
        ),
        RecognizerSpec(
            "AU_ADDRESS",
            [
                PatternSpec(
                    "street_address",
                    rf"\b(\d{{1,5}}[A-Za-z]?\s+(?:[A-Z][a-z]+\s+){{1,3}}{_STREET_SUFFIX})(?=[^A-Za-z]|$)",
                    0.6,
                ),
            ],
            ["address", "located", "deliver", "ship to", "office"],
        ),
        RecognizerSpec(
            "LOCATION",
            [
                PatternSpec(
                    "city_gazetteer",
                    r"\b(?:" + "|".join(sorted(CITY_NAMES, key=lambda s: (-len(s), s))) + r")\b",
                    0.4,
                    token_prefilter=frozenset(CITY_NAMES),
                ),
            ],
        ),
        RecognizerSpec(
            "PERSON",
            [
                PatternSpec(
                    "person_gazetteer",
                    r"\b((?:"
                    + "|".join(sorted((n.capitalize() for n in FIRST_NAMES), key=lambda s: (-len(s), s)))
                    + r")(?:\s+(?:[A-Z]\.|[A-Z][a-z]+(?:[-'][A-Z][a-z]+)?)){1,2})\b",
                    0.8,
                    token_prefilter=frozenset(n.capitalize() for n in FIRST_NAMES),
                ),
            ],
        ),
    ]


# Necessary-condition gates per entity type (audited against every pattern:
# all AU numeric ids / cards / IPs / IBANs / dates require a digit; email
# requires '@'; intl phone requires '+'; URL requires literal 'http').
# AU_DRIVER_LICENSE gates its five numeric patterns per-pattern instead
# (the [A-Z0-9]{6,10} general pattern can match digit-free text). AU_STATE
# gates on a 14-literal cover of its deny-list (below). LOCATION and PERSON
# (gazetteer alternations) have no cheap necessary substring — they use the
# capitalized-token prefilter instead (PatternSpec.token_prefilter).
#
# Any-of tuples: the title/role/greeting/org-suffix specs each require one
# of a small set of literals. Minimal covers, case-sensitive exactly as the
# patterns demand: "Mr" covers Mrs, "Prof" covers Professor, "Inc" covers
# Incorporated, "Corp" covers Corporation, "Ltd" covers "Pty. Ltd"; the
# role words match [Aa]pplicant-style either-case heads, so their
# case-stable tails ("pplicant", ...) are the necessary substrings.
# NAME_TITLE and PERSON_WITH_TITLE share ONE tuple object (the union is
# identical) so analyze() memoizes a single scan per document.
_TITLE_ROLE_LITERALS = (
    "Mr", "Ms", "Mx", "Dr", "Prof", "Miss", "Sir", "Madam", "Ma'am",
    "pplicant", "andidate", "ustomer", "atient", "lient", "mployee",
    "tudent", "ecipient", "orrower",
)
_GREETING_LITERALS = ("Hello", "Hi", "Hey", "Dear", "Good")
_ORG_SUFFIX_LITERALS = (
    "Ltd", "Limited", "Inc", "Corp", "LLC", "PLC", "Group", "Holdings",
    "Partners", "Bank", "University",
)
# AU_STATE deny-list cover (case-sensitive, one literal per alternative):
# "ustralia" covers South/Western Australia + Australian Capital Territory,
# "Territory" covers Northern Territory, "Wales" covers New South Wales; the
# abbreviations cover themselves. Short literals like "SA" false-hit (e.g.
# inside "USA") — that only costs the scan, never a miss.
_AU_STATE_LITERALS = (
    "NSW", "VIC", "QLD", "SA", "WA", "TAS", "ACT", "NT",
    "Wales", "Victoria", "Queensland", "ustralia", "Tasmania", "Territory",
)
_PRECONDITIONS = {
    "AU_TFN": r"\d", "AU_MEDICARE": r"\d", "AU_CENTRELINK_CRN": r"\d",
    "AU_PASSPORT": r"\d", "AU_ABN": r"\d", "AU_ACN": r"\d", "AU_BSB": r"\d",
    "AU_PHONE_NUMBER": r"\d", "AU_BANK_ACCOUNT": r"\d", "AU_POSTCODE": r"\d",
    "CREDIT_CARD": r"\d", "IP_ADDRESS": r"\d", "IBAN_CODE": r"\d",
    "DATE_TIME": r"\d", "EMAIL_ADDRESS": "@", "PHONE_NUMBER": "+",
    "URL": "http", "AU_ADDRESS": r"\d",
    "NAME_TITLE": _TITLE_ROLE_LITERALS,
    "PERSON_WITH_TITLE": _TITLE_ROLE_LITERALS,
    "PERSON_AFTER_GREETING": _GREETING_LITERALS,
    "ORGANIZATION": _ORG_SUFFIX_LITERALS,
    "AU_STATE": _AU_STATE_LITERALS,
}


def default_bank() -> List[RecognizerSpec]:
    """The full recognizer bank, in the reference's registration order
    (``au_recognizers.py:312-410`` build order, then builtins)."""
    bank = _au_specs() + _builtin_specs()
    for spec in bank:
        spec.precondition = _PRECONDITIONS.get(spec.entity_type)
    return bank


_DEFAULT_BANK: Optional[List[RecognizerSpec]] = None
# id(bank) -> (bank ref, flattened form). Bounded LRU: the strong bank ref
# (needed to defeat id() reuse) would otherwise make every custom bank ever
# passed immortal — a caller constructing transient per-request banks would
# leak both the banks and their compiled pattern tables for the process
# lifetime. The default bank is never evicted.
_COMPILED: "OrderedDict[int, tuple]" = OrderedDict()
_COMPILED_MAX = 8


def _get_compiled(bank: Optional[Sequence[RecognizerSpec]]):
    """Flattened, pre-extracted form of the bank for the analyze hot loop:
    one tuple per spec — (entity_type, precondition, context, validator,
    trimmed, pats) — with pats entries (rx.match, rx.finditer, kind,
    pat_precondition, token_prefilter, score, name); kind 0 = plain
    finditer, 1 = digit-run anchored, 2 = capword-prefiltered, 3 =
    upper-run anchored (ScanBundle only). Bound methods and precomputed
    flags keep the per-document loop free of attribute chasing — the loop
    runs ~60 pattern entries per document inside the Arrow UDF."""
    global _DEFAULT_BANK
    if bank is None:
        if _DEFAULT_BANK is None:
            _DEFAULT_BANK = default_bank()
        bank = _DEFAULT_BANK
    # key on id() for speed, but GUARD against CPython address reuse: a
    # dropped custom bank's id can be recycled by a brand-new list, which
    # would silently serve the old bank's compiled patterns. Keeping a
    # strong reference to the keyed bank in the cache entry (a) makes the
    # stored id immortal while cached, so a hit can only be the same
    # object, and (b) lets us verify identity explicitly.
    key = id(bank)
    hit = _COMPILED.get(key)
    if hit is not None and hit[0] is bank:
        _COMPILED.move_to_end(key)
        return hit[1]
    flat = []
    for spec in bank:
        pats = []
        for p, rx, danchor in spec.compiled():
            if p.token_prefilter is not None:
                kind = 2
            elif danchor:
                kind = 1
            elif p.upper_run_anchor:
                kind = 3
            else:
                kind = 0
            pats.append((rx.match, rx.finditer, kind, p.precondition,
                         p.token_prefilter, p.score, p.name))
        flat.append((spec.entity_type, spec.precondition, spec.context,
                     spec.validator, spec.entity_type in _TRIMMED_TYPES,
                     pats))
    _COMPILED[key] = (bank, flat)
    while len(_COMPILED) > _COMPILED_MAX:
        stale = next(
            (k for k, v in _COMPILED.items() if v[0] is not _DEFAULT_BANK),
            None,
        )
        if stale is None:
            break
        del _COMPILED[stale]
    return flat


_digit_search = re.compile(r"\d").search


@lru_cache(maxsize=256)
def _classified_gate(pre: tuple) -> tuple:
    """Classify an any-of literal tuple for ScanBundle-assisted evaluation.

    Each literal becomes (kind, head, lit): a literal whose first two chars
    are ASCII upper+lower can only occur in a text at a capword start (any
    interior char of a ``[A-Z][a-z]+`` match is lowercase, so an uppercase
    occurrence IS a match start), hence ``head in bundle.cw_prefixes`` is a
    sound O(1) prescreen — exact for 2-char literals ("Mr"), a prefilter
    before the full ``in text`` scan for longer ones. Upper+upper heads use
    ``bundle.uu_bigrams`` the same way (acronyms like "NSW"). Everything
    else ("pplicant", "@") keeps the plain substring scan."""
    gate = []
    for lit in pre:
        if len(lit) >= 2 and "A" <= lit[0] <= "Z":
            if "a" <= lit[1] <= "z":
                gate.append(("cw2" if len(lit) == 2 else "cw", lit[:2], lit))
                continue
            if "A" <= lit[1] <= "Z":
                gate.append(("uu2" if len(lit) == 2 else "uu", lit[:2], lit))
                continue
        gate.append(("plain", "", lit))
    return tuple(gate)


def _gate_hit(gate: tuple, text: str, scans) -> bool:
    """Evaluate a classified any-of gate against one document using the
    bundle's prescreen sets; semantics identical to
    ``any(lit in text for lit in pre)`` (pinned by test_scanvec)."""
    cwp = scans.cw_prefixes
    uub = scans.uu_bigrams
    for kind, head, lit in gate:
        if kind == "cw2":
            if head in cwp:
                return True
        elif kind == "cw":
            if head in cwp and lit in text:
                return True
        elif kind == "uu2":
            if head in uub:
                return True
        elif kind == "uu":
            if head in uub and lit in text:
                return True
        elif lit in text:
            return True
    return False

# maximal capitalized tokens — the shared candidate scan for
# PatternSpec.token_prefilter patterns. A finditer over this never starts a
# match inside another (everything after the first char is lowercase), so
# every possible gazetteer-match start position is emitted exactly once.
_CAPWORD = re.compile(r"[A-Z][a-z]+")


_DIGIT_RUN = re.compile(r"\d+")


def _digit_anchored(p: "PatternSpec") -> bool:
    """Effective digit-anchor decision for a pattern (see PatternSpec)."""
    if p.digit_anchor is not None:
        return p.digit_anchor
    return p.regex.startswith((r"\b\d", r"\b(?:\d"))


_PUNCT_TRIM = ".,;:"
# reference analyzer.py:186-193 trims PERSON and ORGANIZATION spans
_TRIMMED_TYPES = PERSON_TYPES | {"ORGANIZATION"}


def trim_person_span(text: str, start: int, end: int) -> tuple:
    """Person-span hygiene (reference ``pdf_redactor/analyzer.py:186-198``):
    if only whitespace separates the span from a preceding ``label:`` colon,
    re-anchor the start just past the colon (skipping whitespace), then strip
    trailing ``.,;:``. Returns (start, end); end <= start means drop.

    Implemented as backward index scans — no ``text[:start]`` copy; this
    runs per person/org match inside the Arrow UDF hot path. For regex-born
    spans (start at a non-space char) the colon branch re-derives the same
    start; it only moves spans whose callers pass a whitespace-leading
    start, matching the reference's rstrip/rfind arithmetic exactly."""
    i = start
    while i > 0 and text[i - 1].isspace():
        i -= 1
    if i > 0 and text[i - 1] == ":":
        while i < end and text[i].isspace():
            i += 1
        start = i
    while end > start and text[end - 1] in _PUNCT_TRIM:
        end -= 1
    return start, end


_DOT_BOUNDARY_RE = re.compile(r"\.(?=\b)")
_WS_RUN_RE = re.compile(r"\s+")


def normalize_person_name(name: str) -> str:
    """lowercased, dot-before-boundary-stripped, space-collapsed form
    (reference ``analyzer.py:105-110``)."""
    name = _DOT_BOUNDARY_RE.sub("", name.strip())
    return _WS_RUN_RE.sub(" ", name).lower()


def name_variants(name: str) -> List[str]:
    """Deterministic variant set of a detected person name (reference
    ``analyzer.py:113-125``): normalized base, all-dots-stripped form, and
    the "Last, First" -> "First Last" swap. Sorted longest-first so the
    combined find-all prefers the longest variant at each position."""
    variants = {normalize_person_name(name),
                normalize_person_name(name.replace(".", ""))}
    if "," in name:
        last, _, first = name.partition(",")
        last, first = last.strip(), first.strip()
        if last and first:
            variants.add(normalize_person_name(f"{first} {last}"))
    else:
        # reverse swap (our recall extension beyond analyzer.py:113-125): a
        # name detected as "First [Mid] Last" also matches "Last, First [Mid]"
        parts = normalize_person_name(name).split(" ")
        if len(parts) >= 2:
            variants.add(f"{parts[-1]}, {' '.join(parts[:-1])}")
    variants.discard("")
    return sorted(variants, key=lambda v: (-len(v), v))


@lru_cache(maxsize=4096)
def _variants_pattern(variants: tuple) -> "re.Pattern":
    """Compiled case-insensitive word-bounded alternation over a longest-first
    variant tuple. Cached per distinct variant SET (not per document): the
    same names recur across a corpus's documents and chunks, and Python's
    global 512-entry regex cache churns under the per-document alternations
    plus the bank's other dynamic lookups (measured ~7% of the analyze path
    as runtime re.compile before caching)."""
    return re.compile(
        r"(?i)(?<!\w)(?:" + "|".join(re.escape(v) for v in variants) + r")(?!\w)"
    )


def propagate_repeated_names(
    text: str, detections: List[Detection], min_score: float = 0.0
) -> List[Detection]:
    """REPEATED_NAME detections for every later/earlier bare occurrence of a
    known person name or its variants (reference ``analyzer.py:128-136``:
    case-insensitive ``(?<!\\w)name(?!\\w)`` find-all). One combined
    alternation pass (longest variant first), leftmost scan; a match is
    skipped when it overlaps an existing detection of score >=
    REPEATED_NAME_SCORE or an earlier propagated span — weaker overlapping
    detections (e.g. a 0.3 all-caps driver-license false positive on a bare
    surname) do NOT block propagation; scrub-time selection resolves the
    overlap in the repeated name's favor. Returns only the NEW detections."""
    if REPEATED_NAME_SCORE < min_score:
        return []
    names = {
        text[d.start : d.end]
        for d in detections
        if d.entity_type in PERSON_TYPES and d.entity_type != "REPEATED_NAME"
    }
    variants: List[str] = []
    seen = set()
    for nm in names:
        for v in name_variants(nm):
            if v not in seen:
                seen.add(v)
                variants.append(v)
    if not variants:
        return []
    variants.sort(key=lambda v: (-len(v), v))
    pat = _variants_pattern(tuple(variants))
    taken = [
        (d.start, d.end) for d in detections if d.score >= REPEATED_NAME_SCORE
    ]
    extra: List[Detection] = []
    for m in pat.finditer(text):
        s, e = m.span()
        # inlined spans_overlap (s < te and ts < e): this loop runs per
        # match x per taken span inside the Arrow UDF hot path, and the
        # generator + call frame were ~8% of the detect stage (profiled)
        if any(s < te and ts < e for ts, te in taken):
            continue
        extra.append(Detection("REPEATED_NAME", s, e, REPEATED_NAME_SCORE,
                               "repeated_name"))
        taken.append((s, e))
    return extra


def _context_hit(text_lower: str, start: int, end: int, context: List[str]) -> bool:
    if not context:
        return False
    lo = max(0, start - CONTEXT_WINDOW_BEFORE)
    hi = min(len(text_lower), end + CONTEXT_WINDOW_AFTER)
    window = text_lower[lo:start] + " " + text_lower[end:hi]
    # map(__contains__): no generator frame per context word (runs once per
    # raw detection inside the Arrow UDF hot path)
    return any(map(window.__contains__, context))


def analyze(
    text: str,
    entities: Optional[Sequence[str]] = None,
    min_score: float = 0.0,
    bank: Optional[Sequence[RecognizerSpec]] = None,
    scans=None,
) -> List[Detection]:
    """Run the recognizer bank over one text → resolved, sorted detections.

    Mirrors the reference's per-chunk ``analyzer.analyze(text, entities=...)``
    call (``text_detector/chunker.py:44``) with the conflict-resolution and
    context-boost spec documented in the module docstring. Entity subsetting
    (reference ``--entities`` plumbing, ``text_detector/cli.py:59-64``) skips
    whole recognizers before any regex work; group names (``financial``,
    ``personal``, ... — reference ``entity_config.py:77-125``) expand to
    their member types first.

    Person-class spans are trimmed per ``trim_person_span`` before conflict
    resolution. Repeated-name propagation is NOT applied here — it is a
    document-level pass (``chunker.analyze_long_text``), matching the
    reference where the find-all machinery lives in the long-document
    analyzer, not the per-cell path.

    ``scans`` (optional) is this document's ``core.scanvec.ScanBundle``,
    computed batch-side by the fused UDF: it supplies the capword /
    digit-run candidate lists precomputed, answers the digit gate for free,
    evaluates any-of literal gates via O(1) prescreen sets, and anchors the
    one upper-alnum pattern. Candidate supersets are re-verified by anchored
    ``rx.match``, so results are identical with or without a bundle (pinned
    by test_scanvec).
    """
    if not text:
        return []
    ents = expand_entities(entities)
    text_lower = text.lower()
    has_digit: Optional[bool] = None
    anyof_cache: Dict[int, bool] = {}

    def _passes(pre) -> bool:
        nonlocal has_digit
        if pre == r"\d":
            if has_digit is None:
                if scans is not None:
                    has_digit = bool(scans.digit_starts)
                else:
                    has_digit = _digit_search(text) is not None
            return has_digit
        if type(pre) is tuple:
            key = id(pre)  # shared tuple objects scan once per document
            hit = anyof_cache.get(key)
            if hit is None:
                if scans is not None:
                    hit = _gate_hit(_classified_gate(pre), text, scans)
                else:
                    # map(__contains__) avoids a generator frame per literal
                    # — this runs ~30 times per document across the bank
                    hit = any(map(text.__contains__, pre))
                anyof_cache[key] = hit
            return hit
        return pre in text

    # shared candidate scans for anchored patterns: from the batch bundle
    # when supplied, else computed lazily per document
    capwords: Optional[list] = None
    digit_starts: Optional[list] = None
    if scans is not None:
        capwords = scans.capwords
        digit_starts = scans.digit_starts

    raw: List[Detection] = []
    for et, spre, context, validator, trimmed, pats in _get_compiled(bank):
        if ents is not None and et not in ents:
            continue
        if spre is not None and not _passes(spre):
            continue
        for rx_match, rx_finditer, kind, ppre, prefilter, score0, pname in pats:
            if ppre is not None and not _passes(ppre):
                continue
            # anchored kinds inline the candidate loop (one generator frame
            # per (pattern, doc) measured ~1us each across ~20 danchored
            # patterns); all preserve finditer's leftmost non-overlapping
            # contract: skip candidates before the previous match's end, and
            # the anchored rx.match re-checks its own \b.
            if kind == 1:
                if digit_starts is None:
                    digit_starts = [m.start()
                                    for m in _DIGIT_RUN.finditer(text)]
                if not digit_starts:
                    continue
                ms = []
                last_end = 0
                for pos in digit_starts:
                    if pos >= last_end:
                        m = rx_match(text, pos)
                        if m is not None:
                            last_end = m.end()
                            ms.append(m)
            elif kind == 2:
                if capwords is None:
                    capwords = [(m.start(), m.group())
                                for m in _CAPWORD.finditer(text)]
                if not capwords:
                    continue
                ms = []
                last_end = 0
                for pos, word in capwords:
                    if pos >= last_end and word in prefilter:
                        m = rx_match(text, pos)
                        if m is not None:
                            last_end = m.end()
                            ms.append(m)
            elif kind == 3 and scans is not None:
                ups = scans.upper_run_starts
                if not ups:
                    continue
                ms = []
                last_end = 0
                for pos in ups:
                    if pos >= last_end:
                        m = rx_match(text, pos)
                        if m is not None:
                            last_end = m.end()
                            ms.append(m)
            else:
                ms = rx_finditer(text)
            for m in ms:
                # PERSON patterns capture the name in group 1; span = the name.
                if m.lastindex:
                    s, e = m.span(1)
                else:
                    s, e = m.span()
                if trimmed:
                    s, e = trim_person_span(text, s, e)
                if e <= s:
                    continue
                if validator is not None and not validator(m.group(0)):
                    continue
                score = score0
                if _context_hit(text_lower, s, e, context):
                    score = min(score + CONTEXT_BOOST, 1.0)
                if score < min_score:
                    continue
                raw.append(Detection(et, s, e, score, pname))

    return resolve_conflicts(raw)


def resolve_conflicts(raw: List[Detection]) -> List[Detection]:
    """Deterministic conflict resolution (spec rules 1-3, module docstring)."""
    # Rule 1+2: per exact span keep single best (score desc, type asc).
    by_span: Dict[tuple, Detection] = {}
    for d in raw:
        key = (d.start, d.end)
        cur = by_span.get(key)
        if cur is None or d.score > cur.score or (
            d.score == cur.score and d.entity_type < cur.entity_type
        ):
            by_span[key] = d
    kept = sorted(by_span.values(), key=lambda d: (d.start, -(d.end - d.start)))
    # Rule 3: drop strict containment under an equal-or-higher score.
    out: List[Detection] = []
    for d in kept:
        contained = False
        for e in out:
            if e.start <= d.start and d.end <= e.end and (e.end - e.start) > (d.end - d.start):
                if e.score >= d.score:
                    contained = True
                    break
        if not contained:
            out.append(d)
    out.sort(key=lambda d: d.sort_key())
    return out
