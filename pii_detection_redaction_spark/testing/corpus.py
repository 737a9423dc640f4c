"""Synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Schema matches the BASELINE.json input_hint exactly:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Every row is a pure function of ``(seed, i)`` — independent of corpus size, so
sf0.001 is a strict prefix of sf0.1 and goldens can be spot-checked across
scales. Hosts are Zipf-skewed (top-2 hosts ≈ 40% of rows) to exercise the
salting path. Per-1000-row edge-case quotas (FIXTURES.md §1) are met by the
``i % 20`` archetype wheel:

  0 empty/whitespace · 1 too-short · 2 symbol-soup · 3 duplicate-lines ·
  4 ellipsis-lines · 5 stopword-free English · 6 multi-person+owned entities
  (incl. repeated bare names, "Last, First" swaps, role-word persons, bare
  NAME_TITLE titles/role words, dd-mm-yyyy / time-of-day / domestic-landline
  formats) ·
  7 >5000-char doc with an entity planted across the 5000-char chunk boundary ·
  8 valid-checksum ABN · 9 invalid-checksum ABN · 11 near-dup family member
  (three docs per 60-index block share a base text, one marker token apart —
  near-dedup material) · 10-19 otherwise plain docs (mixed
  language, optional planted PII; English arch-10 docs additionally carry 3
  planted toxicity-lexicon hits → dropped, and other English plain docs have
  a 25% chance of 1 residual hit → kept and masked).
"""

from __future__ import annotations

import html as _html
import random
from datetime import datetime, timedelta, timezone
from typing import List, Tuple

import pandas as pd

from ..core.langprofiles import CHAR_BASED_LANGS, CONTENT_WORDS, STOPWORDS
from ..core.recognizers import FIRST_NAMES, is_valid_abn, luhn_ok
from ..core.toxicity import TOXICITY_LEXICON

# planted-toxicity vocabulary (subset of the pinned lexicon)
_TOX_WORDS = tuple(w for w in TOXICITY_LEXICON if w in
                   ("bullshit", "shitty", "pissed", "bollocks", "fucking", "crap"))

SEED = 42
EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)
# bump when an EXISTING generator's output changes — cache keys embed it;
# purely additive fixtures (version+param-keyed filenames) don't require it
CORPUS_VERSION = 8
# size of the fixed planted-PII oracle corpus the pii_* catalog queries and
# their DuckDB/golden oracles share (plans.queries._pages reads exactly this)
N_ORACLE_PAGES = 500

SURNAMES = (
    "Smith Johnson Williams Brown Jones Garcia Miller Davis Rodriguez "
    "Martinez Wilson Anderson Taylor Thomas Moore Jackson Martin Lee "
    "Thompson White Harris Clark Lewis Robinson Walker Young Allen King "
    "Wright Scott Green Baker Adams Nelson Hill Campbell Mitchell Carter"
).split()

HOSTS = [f"site{i:02d}.example.{tld}" for i, tld in enumerate(
    ["com", "org", "net", "com", "io", "com", "org", "net", "co", "com",
     "org", "net", "com", "io", "org", "com", "net", "org", "com", "io"]
)]
_HOST_WEIGHTS = [1.0 / (r + 1) for r in range(len(HOSTS))]
_HOST_CUM = []
_acc = 0.0
for w in _HOST_WEIGHTS:
    _acc += w
    _HOST_CUM.append(_acc)


def _pick_host(rng: random.Random) -> str:
    x = rng.random() * _HOST_CUM[-1]
    for host, c in zip(HOSTS, _HOST_CUM):
        if x <= c:
            return host
    return HOSTS[-1]


def _sentence(rng: random.Random, lang: str, n_words: int, stop_frac: float = 0.4) -> str:
    stop = STOPWORDS.get(lang, [])
    content = CONTENT_WORDS[lang]
    words = []
    for _ in range(n_words):
        if stop and rng.random() < stop_frac:
            words.append(rng.choice(stop))
        else:
            words.append(rng.choice(content))
    if lang in CHAR_BASED_LANGS:  # no word separators
        return "".join(words) + "。"
    sent = " ".join(words)
    return sent[0].upper() + sent[1:] + "."


def _paragraphs(rng: random.Random, lang: str, n_lines: int, stop_frac: float = 0.4) -> List[str]:
    lines = []
    for _ in range(n_lines):
        n_sent = rng.randint(1, 3)
        lines.append(" ".join(_sentence(rng, lang, rng.randint(6, 14), stop_frac)
                              for _ in range(n_sent)))
    return lines


def _person(rng: random.Random) -> str:
    return f"{rng.choice(FIRST_NAMES).capitalize()} {rng.choice(SURNAMES)}"


def _valid_abn(rng: random.Random) -> str:
    while True:
        digits = "".join(str(rng.randint(0, 9)) for _ in range(11))
        if digits[0] != "0" and is_valid_abn(digits):
            return f"{digits[:2]} {digits[2:5]} {digits[5:8]} {digits[8:]}"


def _invalid_abn(rng: random.Random) -> str:
    while True:
        digits = "".join(str(rng.randint(0, 9)) for _ in range(11))
        if digits[0] != "0" and not is_valid_abn(digits):
            return f"{digits[:2]} {digits[2:5]} {digits[5:8]} {digits[8:]}"


def _credit_card(rng: random.Random) -> str:
    while True:
        body = "4" + "".join(str(rng.randint(0, 9)) for _ in range(14))
        for check in "0123456789":
            if luhn_ok(body + check):
                d = body + check
                return f"{d[:4]} {d[4:8]} {d[8:12]} {d[12:]}"


def _au_mobile(rng: random.Random) -> str:
    return f"04{rng.randint(0,99):02d} {rng.randint(0,999):03d} {rng.randint(0,999):03d}"


def _email_for(name: str, rng: random.Random) -> str:
    first, last = name.lower().split()
    dom = rng.choice(["mail.example.com", "corp.example.org", "webmail.example.net"])
    return f"{first}.{last}@{dom}"


def _pii_snippets(rng: random.Random) -> List[str]:
    name = _person(rng)
    opts = [
        f"Contact {name} on {_au_mobile(rng)} for details.",
        f"Email {name} at {_email_for(name, rng)} regarding the invoice.",
        f"Dear {name}, your medicare number is "
        f"{rng.randint(1000,9999)} {rng.randint(10000,99999)} {rng.randint(1,9)}.",
        f"Payment to BSB {rng.randint(100,999)}-{rng.randint(100,999)} "
        f"account {rng.randint(100000,999999)}{rng.randint(10,99)}.",
        f"Card on file: {_credit_card(rng)}.",
        f"Mr. {name} visited on 2025-0{rng.randint(1,9)}-1{rng.randint(0,9)}.",
        f"Server logs show ip {rng.randint(10,250)}.{rng.randint(0,255)}"
        f".{rng.randint(0,255)}.{rng.randint(1,254)} accessed the portal.",
        f"Invoices go to {rng.choice(SURNAMES)} Consulting Pty Ltd each month.",
        f"Deliver to {rng.randint(1,250)} {rng.choice(SURNAMES)} Street, "
        f"{rng.choice(('Sydney', 'Melbourne', 'Brisbane', 'Perth'))}.",
    ]
    return [rng.choice(opts)]


def _doc_text(i: int, rng: random.Random) -> Tuple[str, str]:
    """Returns (text, lang) for row archetype ``i % 20``."""
    arch = i % 20
    if arch == 0:
        return (rng.choice(["", "   ", "\n\n", " \n "]), "en")
    if arch == 1:
        return (" ".join(rng.choice(CONTENT_WORDS["en"]) for _ in range(rng.randint(2, 8))), "en")
    if arch == 2:
        soup = "".join(rng.choice("#{}<>\\^~|…@%$") for _ in range(rng.randint(120, 400)))
        return (soup, "en")
    if arch == 3:
        line = _paragraphs(rng, "en", 1)[0]
        uniq = _paragraphs(rng, "en", 2)
        reps = [line] * rng.randint(6, 10)
        return ("\n".join(uniq + reps), "en")
    if arch == 4:
        lines = [ln + "..." for ln in _paragraphs(rng, "en", rng.randint(6, 10))]
        return ("\n".join(lines), "en")
    if arch == 5:
        lines = _paragraphs(rng, "en", rng.randint(4, 8), stop_frac=0.0)
        return ("\n".join(lines), "en")
    if arch == 6:
        p1, p2 = _person(rng), _person(rng)
        body = _paragraphs(rng, "en", 3)
        lines = [
            f"Hello {p1}, thanks for the update.",
            body[0],
            f"{p2} can be reached on {_au_mobile(rng)} or {_email_for(p2, rng)}.",
            body[1],
            f"Please send the contract to {_email_for(p1, rng)} by Friday.",
            body[2],
        ]
        # repeated-name propagation material (C7-C11): a later bare lowercase
        # occurrence, a "Last, First" swap, a role-word-introduced person, and
        # the round-2 recall formats (dd-mm-yyyy, time-of-day, bracket-free
        # domestic landline). Appended after all earlier draws.
        p3 = _person(rng)
        first2, last2 = p2.split()
        lines.append(f"Later, {p1.lower()} confirmed receipt of the file.")
        lines.append(f"{last2}, {first2} is the listed borrower of record.")
        lines.append(
            f"The applicant {p3} arrived at {rng.randint(1,12)}:"
            f"{rng.randint(0,59):02d} pm on {rng.randint(1,28)}-"
            f"{rng.randint(1,12)}-2025."
        )
        lines.append(
            f"Call 0{rng.randint(2,8)} {rng.randint(1000,9999)} "
            f"{rng.randint(1000,9999)} to confirm."
        )
        # bare titles / role words with no following name -> NAME_TITLE
        # (title+name occurrences above stay PERSON_WITH_TITLE)
        lines.append("Each applicant and patient must sign the form; thanks, Sir.")
        return ("\n".join(lines), "en")
    if arch == 7:
        lines = _paragraphs(rng, "en", 60)
        text = "\n".join(lines)
        head = text[:4985]
        tail = text[4985:]
        snippet = f" Contact number 04{rng.randint(10,99)} {rng.randint(100,999)} {rng.randint(100,999)} listed."
        return (head + snippet + tail, "en")
    if arch == 8:
        lines = _paragraphs(rng, "en", 4)
        lines.insert(2, f"Registered ABN {_valid_abn(rng)} for invoicing.")
        return ("\n".join(lines), "en")
    if arch == 9:
        lines = _paragraphs(rng, "en", 4)
        lines.insert(2, f"Registered ABN {_invalid_abn(rng)} for invoicing.")
        return ("\n".join(lines), "en")

    if arch == 11:
        # near-dup families (corpus v8): members (60f+11, 60f+31, 60f+51) of
        # each 60-index block share one base document drawn from a
        # family-seeded rng, each differing only by its own trailing marker
        # token — boilerplate-style near-dups (3-gram Jaccard ≈ 0.95 between
        # members, never byte-identical) that the near-dedup pass must
        # collapse to one keeper per family. English, quality-passing, no
        # PII/toxicity plants, so the family is kept intact until dedup.
        family, member = i // 60, (i % 60) // 20
        frng = random.Random(SEED * 7919 + family)
        lines = _paragraphs(frng, "en", 8)
        lines.append(f"Mirror copy ref{family}x{member}.")
        return ("\n".join(lines), "en")

    # plain docs 10-19 (minus 11): language mix en-heavy; non-en slots split
    # evenly across the widened language set (corpus v5: + it/nl/pt/ja/ko)
    r = rng.random()
    if r < 0.5:
        lang = "en"
    else:
        others = ("de", "fr", "es", "zh", "it", "nl", "pt", "ja", "ko")
        lang = others[min(int((r - 0.5) / (0.5 / len(others))), len(others) - 1)]
    n_lines = rng.randint(3, 18)
    lines = _paragraphs(rng, lang, n_lines)
    if lang == "en" and rng.random() < 0.5:
        pos = rng.randint(0, len(lines))
        for sn in _pii_snippets(rng):
            lines.insert(pos, sn)
    # toxicity plants (appended last so earlier rng draws are unperturbed):
    # arch 10 → above-threshold hits (dropped, reason 'toxicity');
    # other en docs → 25% chance of 1-2 residual hits (kept, masked).
    if lang == "en":
        if arch == 10:
            t = [_TOX_WORDS[rng.randrange(len(_TOX_WORDS))] for _ in range(3)]
            lines.append(
                f"This {t[0]} release is {t[1]} broken and the docs are {t[2]} useless."
            )
        elif rng.random() < 0.25:
            w = _TOX_WORDS[rng.randrange(len(_TOX_WORDS))]
            lines.append(f"Honestly the old parser was {w} slow.")
    return ("\n".join(lines), lang)


def render_html(text: str) -> bytes:
    """Wrap text lines in escaped ``<p>`` tags; exact inverse of
    ``core.extract.extract_text``."""
    body = "".join(f"<p>{_html.escape(ln, quote=False)}</p>" for ln in text.split("\n"))
    return (
        "<html><head><title>page</title></head><body>" + body + "</body></html>"
    ).encode("utf-8")


def page_row(i: int, seed: int = SEED) -> dict:
    rng = random.Random(seed * 1_000_003 + i)
    host = _pick_host(rng)
    text, lang = _doc_text(i, rng)
    return {
        "url": f"https://{host}/page-{i}",
        "warc_ts": EPOCH + timedelta(seconds=i),
        "html": render_html(text),
        "text": text,
        "lang": lang,
    }


def pages_df(n: int, seed: int = SEED) -> pd.DataFrame:
    rows = [page_row(i, seed) for i in range(n)]
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], utc=True).dt.tz_localize(None)
    return df


SF_ROWS = {"0.001": 500, "0.01": 5_000, "0.1": 50_000}


def write_pages_parquet(path: str, n: int, seed: int = SEED, n_files: int = 1) -> str:
    """Write the corpus as one parquet file (n_files=1) or a directory of
    n_files equal slices — multi-file layout gives Spark a parallel scan
    (a single-row-group file is one scan task no matter the cluster size)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pages_df(n, seed)
    table = pa.Table.from_pandas(df, schema=_pages_schema(), preserve_index=False)
    if n_files <= 1:
        pq.write_table(table, path)
        return path
    import os

    os.makedirs(path, exist_ok=True)
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        sl = table.slice(i * step, step)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(path, f"part-{i:04d}.parquet"))
    return path


def _data_dir() -> str:
    """The repo-level _data/ fixture cache (shared by every ensure_*)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    d = os.path.join(repo, "_data")
    os.makedirs(d, exist_ok=True)
    return d


def _pages_schema():
    """The one pages interchange schema every fixture writes."""
    import pyarrow as pa

    return pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )


# ---------------------------------------------------------------------------
# crawl table: pages + messy re-crawl records (URL-canonicalization material).
# Kept SEPARATE from the pages corpus so the 47 existing golden/oracle gates
# are untouched; same input_hint schema. Every decoration canonicalizes back
# to the base URL under core.urlnorm EXCEPT the real-params case, which must
# survive as a distinct canonical URL.

N_ORACLE_CRAWL = 500  # base pages; re-crawls add ~1/7 more rows

_RECRAWL_DECOR = (
    "?utm_source=feed&utm_campaign=rss",  # tracking-only query
    "__UPPER_HOST_443__",                 # mixed-case host + explicit :443
    "/?ref=rss#frag",                     # trailing slash + ref + fragment
    "#section-2",                         # fragment only
    "?gclid=abc123&fbclid=xyz&utm_medium=email",  # all tracking families
)


def _decorate(url: str, variant: int) -> str:
    d = _RECRAWL_DECOR[variant % len(_RECRAWL_DECOR)]
    if d == "__UPPER_HOST_443__":
        scheme, rest = url.split("://", 1)
        host, path = rest.split("/", 1)
        return f"{scheme}://{host.upper()}:443/{path}"
    return url + d


def crawl_df(n: int, seed: int = SEED) -> pd.DataFrame:
    """Base record per page i; every i%7==3 page additionally gets a
    re-crawl one day later under a decorated URL spelling (same content).
    Every i%11==5 BASE record carries real query params (+ one tracking
    param) — its canonical URL keeps ``?id=..&page=2`` and stays distinct."""
    rows = []
    for i in range(n):
        base = page_row(i, seed)
        if i % 11 == 5:
            base["url"] = f"{base['url']}?id={i}&utm_medium=email&page=2"
        rows.append(base)
        if i % 7 == 3:
            re_crawl = dict(base)
            re_crawl["url"] = _decorate(base["url"], i)
            re_crawl["warc_ts"] = base["warc_ts"] + timedelta(days=1)
            rows.append(re_crawl)
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], utc=True).dt.tz_localize(None)
    return df


def ensure_crawl_parquet(n: int = N_ORACLE_CRAWL) -> str:
    """Deterministic crawl parquet under _data/ — both the Spark url_dedup
    query and its DuckDB oracle read THIS file."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(_data_dir(), f"crawl_oracle_v{CORPUS_VERSION}_{n}.parquet")
    if not os.path.exists(path):
        df = crawl_df(n)
        pq.write_table(
            pa.Table.from_pandas(df, schema=_pages_schema(), preserve_index=False),
            path,
        )
    return path


# ---------------------------------------------------------------------------
# incremental-ingestion batch: a later crawl slice that OVERLAPS the crawl
# table's canonical URLs (pages lo..500 re-crawled, some under re-spelled
# URLs) and extends past it (500..hi genuinely new) — the history/batch
# material for the Bloom-gated `incremental_new` query.

N_BATCH_LO, N_BATCH_HI = 450, 550


def batch_df(lo: int = N_BATCH_LO, hi: int = N_BATCH_HI, seed: int = SEED) -> pd.DataFrame:
    rows = []
    for i in range(lo, hi):
        r = page_row(i, seed)
        if i % 11 == 5:  # same real-params rule as crawl_df -> same canonical
            r["url"] = f"{r['url']}?id={i}&utm_medium=email&page=2"
        if i % 5 == 2:  # re-spelled fetch: canonicalizes back to the page
            sep = "&" if "?" in r["url"] else "?"
            r["url"] = r["url"] + sep + "utm_source=newsletter"
        r["warc_ts"] = r["warc_ts"] + timedelta(days=30)
        rows.append(r)
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], utc=True).dt.tz_localize(None)
    return df


def ensure_batch_parquet(lo: int = N_BATCH_LO, hi: int = N_BATCH_HI) -> str:
    """Deterministic ingestion-batch parquet under _data/ — the Spark
    incremental_new query and its DuckDB oracle read THIS file."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(
        _data_dir(), f"batch_oracle_v{CORPUS_VERSION}_{lo}_{hi}.parquet"
    )
    if not os.path.exists(path):
        df = batch_df(lo, hi)
        pq.write_table(
            pa.Table.from_pandas(df, schema=_pages_schema(), preserve_index=False),
            path,
        )
    return path


def ensure_warc_dir(n: int = N_ORACLE_PAGES, n_files: int = 8) -> str:
    """The pages corpus re-encoded as per-record-gzipped WARC files (the
    Common Crawl layout, core.warc writer) — the fixture for the WARC
    source. The DuckDB oracle reads the PAGES parquet and re-derives every
    field, so the differential proves the writer->bytes->reader round trip
    against the source of truth, not the parser against itself."""
    import os

    from ..core.warc import build_response_record, write_warc

    path = os.path.join(_data_dir(), f"warc_oracle_v{CORPUS_VERSION}_{n}_{n_files}")
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        os.makedirs(path, exist_ok=True)
        step = (n + n_files - 1) // n_files
        for f in range(n_files):
            recs = []
            for i in range(f * step, min((f + 1) * step, n)):
                r = page_row(i)
                date_iso = r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
                recs.append(build_response_record(r["url"], date_iso, r["html"]))
            if recs:
                write_warc(recs, os.path.join(path, f"part-{f:04d}.warc.gz"))
        open(done, "w").close()
    return path


def ensure_jsonl_dir(n: int = N_ORACLE_PAGES, n_files: int = 8) -> str:
    """The pages corpus as gzipped JSONL (stdlib writer — Spark-free), the
    fixture for sources.jsonl: binary html rides as base64. The reader's
    oracle re-derives fields from the pages PARQUET, so the differential is
    writer->bytes->reader vs the source of truth (same move as the WARC
    fixture)."""
    import base64
    import gzip as _gzip
    import json as _json
    import os

    path = os.path.join(_data_dir(), f"jsonl_oracle_v{CORPUS_VERSION}_{n}_{n_files}")
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        os.makedirs(path, exist_ok=True)
        step = (n + n_files - 1) // n_files
        for f in range(n_files):
            lines = []
            for i in range(f * step, min((f + 1) * step, n)):
                r = page_row(i)
                lines.append(_json.dumps({
                    "url": r["url"],
                    "warc_ts": r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
                    "html_b64": base64.b64encode(r["html"]).decode("ascii"),
                    "text": r["text"],
                    "lang": r["lang"],
                }, ensure_ascii=False))
            if lines:
                with _gzip.open(os.path.join(path, f"part-{f:04d}.jsonl.gz"),
                                "wt", encoding="utf-8") as fh:
                    fh.write("\n".join(lines) + "\n")
        open(done, "w").close()
    return path


def ensure_pages_parquet(n: int = 500) -> str:
    """Deterministic single-file pages parquet under the repo's _data/ cache,
    written on first use (pandas/pyarrow only — no Spark needed). Both the
    Spark catalog queries and the DuckDB oracle SQL (via read_parquet) read
    THIS file, so the differential runs over byte-identical input."""
    import os

    path = os.path.join(_data_dir(), f"pages_oracle_v{CORPUS_VERSION}_{n}.parquet")
    if not os.path.exists(path):
        write_pages_parquet(path, n)
    return path


def write_host_variant_pages_parquet(
    path: str,
    n: int,
    hosts: str = "hot",
    hot_frac: float = 0.4,
    seed: int = SEED,
    n_files: int = 1,
) -> str:
    """The pages corpus with a CONTROLLED host distribution (additive
    fixture — bench skew evidence, see bench.py run_skew_bench):

    - ``hosts='uniform'``: round-robin over the 20 corpus hosts (max host
      share 5% — the no-skew baseline);
    - ``hosts='hot'``: one planted host owns ``hot_frac`` of the rows (the
      Zipf-head stress case; deterministic — rows i < n*hot_frac move).

    Only the url's authority changes; text/html payloads are byte-identical
    to ``write_pages_parquet`` of the same (n, seed), so timing differences
    between the two variants isolate the host-distribution effect."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pages_df(n, seed)
    if hosts == "uniform":
        urls = [f"https://{HOSTS[i % len(HOSTS)]}/page-{i}" for i in range(n)]
    elif hosts == "hot":
        k = int(n * hot_frac)
        urls = [
            f"https://hot00.example.com/page-{i}" if i < k
            else f"https://{HOSTS[i % len(HOSTS)]}/page-{i}"
            for i in range(n)
        ]
    else:
        raise ValueError(f"unknown hosts variant {hosts!r}")
    df = df.assign(url=urls)
    schema = _pages_schema()
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    if n_files == 1:
        pq.write_table(table, path)
        return path
    os.makedirs(path, exist_ok=True)
    step = (n + n_files - 1) // n_files
    for f in range(n_files):
        pq.write_table(
            table.slice(f * step, step),
            os.path.join(path, f"part-{f:04d}.parquet"),
        )
    return path


def write_wide_csv(path: str, n_rows: int, n_files: int = 8, seed: int = SEED) -> str:
    """A 10-column PII-bearing CSV at bench scale (additive fixture — the
    csv_redactor surface's scale evidence): person/contact/account fields
    drawn from the same deterministic generators as the pages corpus, plus
    a free-text notes cell. Written as n_files shards so the scan (and the
    one-Exchange reassembly) actually parallelizes."""
    import csv as _csv
    import os

    os.makedirs(path, exist_ok=True)
    cols = ["record_id", "name", "email", "phone", "tfn", "address",
            "company", "signup_date", "ip", "notes"]
    step = (n_rows + n_files - 1) // n_files
    for f in range(n_files):
        rows = []
        for i in range(f * step, min((f + 1) * step, n_rows)):
            rng = random.Random(seed * 7_000_003 + i)
            first = rng.choice(FIRST_NAMES)
            last = rng.choice(SURNAMES)
            host = _pick_host(rng)
            rows.append([
                str(i),
                f"{first} {last}",
                f"{first.lower()}.{last.lower()}{i}@{host}",
                f"04{rng.randrange(10**8):08d}",
                f"{rng.randrange(10**9):09d}" if i % 3 == 0 else "",
                f"{rng.randrange(1, 400)} {rng.choice(SURNAMES)} St",
                f"{rng.choice(SURNAMES)} Pty Ltd",
                f"202{rng.randrange(0, 6)}-{rng.randrange(1, 13):02d}-"
                f"{rng.randrange(1, 29):02d}",
                f"10.{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}",
                f"met with {rng.choice(FIRST_NAMES)} about the contract"
                if i % 2 else "no follow-up needed",
            ])
        with open(os.path.join(path, f"part-{f:04d}.csv"), "w", newline="") as fh:
            w = _csv.writer(fh)
            w.writerow(cols)
            w.writerows(rows)
    return path
