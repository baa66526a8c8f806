"""Text-analysis column expressions for large-scale training-data pipelines:
tokenization, token counting, language-ID, quality scoring, document
fingerprinting, n-gram shingling.

All pure ``pyspark.sql.functions`` compositions (JVM-side, codegen'd).
These extend the reference's surface (its vector/text family is the seed:
awswrangler/s3/_vectors/) toward the LLM-pipeline operators; formulas are
deliberately simple and SQL-portable so the DuckDB oracle can mirror them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# small multilingual stopword profiles for the n-gram/stopword language
# heuristic (public, common knowledge lists; intentionally tiny)
_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(tokens(col)).cast(T.LongType())


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token-count estimate: word/number/punctuation pieces via a
    GPT-2-style regex split plus a chars/4 correction for long words —
    cheap, deterministic, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    # split into word / digit-run / punct pieces
    pieces = F.split(F.trim(c), r"(?=[^\w\s])|(?<=[^\w\s])|\s+")
    non_empty = F.filter(pieces, lambda p: F.length(p) > 0)
    # long words cost ~len/4 subword tokens
    return F.aggregate(
        non_empty,
        F.lit(0).cast(T.LongType()),
        lambda acc, p: acc + F.greatest(F.lit(1), F.ceil(F.length(p) / F.lit(4))).cast(T.LongType()),
    )


def language_id(col: Column | str) -> Column:
    """Stopword-profile language heuristic: picks the language whose
    stopword list has the most hits among the document's tokens; 'und'
    (undetermined) when no profile hits."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    scores = []
    for lang, words in _LANG_STOPWORDS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(words)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def punctuation_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"\p{Punct}", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    words = stopwords or _LANG_STOPWORDS["en"]
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def mean_word_length(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: rewards reasonable length,
    low punctuation density, presence of stopwords, and sane mean word
    length (the classic C4/Gopher-style cheap filters, composed from
    built-ins)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    length_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punctuation_ratio(c) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    mwl = mean_word_length(c)
    word_len_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(
        length_score * 0.3 + punct_score * 0.2 + stop_score * 0.3 + word_len_score * 0.2, 6
    )


def document_fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint over normalized text
    (lower-cased, whitespace-collapsed) — md5 hex, portable to any SQL
    oracle engine."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized)


def rolling_hash(
    col: Column | str, base: int = 31, mod: int = 297528130221121781
) -> Column:
    """Polynomial rolling hash of the normalized text (JVM-side aggregate
    over the char array) — the integer fingerprint variant.

    The accumulator stays in ``[0, mod)`` and each step computes
    ``acc*base + char`` BEFORE reducing, so ``(mod-1)*base + 255`` must
    fit in int64 or ANSI mode raises ARITHMETIC_OVERFLOW mid-corpus on
    ordinary text.  The default is the largest 59-bit prime that is safe
    for base 31; custom (base, mod) pairs are validated up front."""
    if (mod - 1) * base + 255 >= (1 << 63):
        raise ValueError(
            f"rolling_hash(base={base}, mod={mod}) would overflow int64: "
            f"need (mod-1)*base + 255 < 2^63 — use a smaller modulus"
        )
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    chars = F.split(normalized, "")
    return F.aggregate(
        chars,
        F.lit(0).cast(T.LongType()),
        lambda acc, ch: F.pmod(acc * F.lit(base) + F.ascii(ch), F.lit(mod)),
    )


# PII / entity patterns — deliberately RE2-and-Java-compatible (no
# backreferences, no lookbehind) so the same pattern text runs on Spark
# (java.util.regex) and any RE2-based SQL oracle engine.
PII_PATTERNS: dict[str, str] = {
    # URLs first: an email-looking token inside a URL must be consumed as
    # part of the URL, not double-redacted
    "url": r"https?://[^\s]+",
    # RFC-bounded quantifiers (local <= 64, domain <= 255): an
    # UNBOUNDED local-part class rescans every position of a long
    # letter run that never reaches an '@' — O(n^2), measured 45s on
    # one 200 KB token; the bound caps the per-position probe at 64
    # chars, making the scrub linear on adversarial text
    "email": r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,}",
    # 13-16 digits with optional single space/dash separators (the
    # written card forms), BEFORE the shorter digit patterns so a card
    # is never half-eaten as a phone; no Luhn (regex-only scrub — a few
    # long id numbers over-redact, which is the safe direction)
    "credit_card": r"\b\d(?:[ -]?\d){12,15}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # dotted/dashed and the parenthesized-area-code written form; bare
    # space-separated digit triples are NOT matched (too many false
    # positives in numeric text)
    "phone": r"(?:\(\d{3}\)[ ]?|\b\d{3}[-.])\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(col: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace PII-ish spans with ``<KIND>`` placeholders — the standard
    pre-training scrub pass, kept entirely JVM-side as a chain of
    ``regexp_replace`` (one codegen'd pass per pattern, no Python UDF).

    Order matters and is fixed: URLs before emails (so ``http://a@b.com``
    is one ``<URL>``), phones before IPv4 (``555-123-4567`` must not be
    half-eaten by the IP rule after digit runs are replaced).
    """
    c = F.col(col) if isinstance(col, str) else col
    for kind in kinds or list(PII_PATTERNS):
        if kind not in PII_PATTERNS:
            raise ValueError(f"unknown PII kind {kind!r}")
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return c


def extract_emails(col: Column | str) -> Column:
    """All email addresses in the text, in order (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(PII_PATTERNS["email"]), 0)


def extract_urls(col: Column | str) -> Column:
    """All http(s) URLs in the text, in order (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(PII_PATTERNS["url"]), 0)


def ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-grams as an array<string> (space-joined).

    Built from n shifted slices zipped together, so the tokenization
    subtree is evaluated n times per row — not once per position, as the
    ``transform(sequence(...), i -> slice(toks, i, n))`` formulation
    would (that re-runs the regex split len(toks) times per row)."""
    toks = tokens(col)
    m = F.size(toks) - n + 1
    shifted = [F.slice(toks, i + 1, F.greatest(m, F.lit(0))) for i in range(n)]
    zipped = F.arrays_zip(*shifted)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
        )
    )


def shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-shingles of normalized text (for MinHash).

    One regex pass: overlapping k-grams via a lookahead capture group.
    (A ``transform(sequence(...), i -> substring(norm, i, k))`` formulation
    re-evaluates the normalization subtree per element — the regex ran
    len(text) times per row.)"""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    grams = F.regexp_extract_all(normalized, F.lit(f"(?=(.{{{k}}}))"), 1)
    return F.when(F.length(normalized) < k, F.array(normalized)).otherwise(
        F.array_distinct(grams)
    )


# &amp; decodes LAST (standard single-decode): doing it first would
# over-decode double-encoded text ('&amp;lt;' must yield the literal
# '&lt;' the author wrote, not '<')
_HTML_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
]


def strip_html(col: Column | str) -> Column:
    """Crawl-cleaning scrub: drop ``<script>``/``<style>`` blocks with
    their content, strip remaining tags and HTML comments, decode the
    common entities, collapse whitespace.  Pure JVM regexp chain — runs
    in whole-stage codegen on the raw-crawl scan, no UDF.

    A heuristic text extractor (the CCNet/C4 preprocessing step), not an
    HTML parser: pathological markup (unclosed scripts, CDATA) degrades
    to over-stripping, never to leaking script bodies.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    for ent, rep in _HTML_ENTITIES:
        out = F.regexp_replace(out, ent, rep)
    # remaining numeric refs (decimal AND hex) -> separator
    out = F.regexp_replace(out, r"&#[xX]?[0-9a-fA-F]+;", " ")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


# explicit latin accent fold — the SAME map rides the SQL oracle, so the
# normalization is engine-rederivable (builtin strip_accents functions
# differ across engines in their long tail)
_ACCENTED = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
_PLAIN = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"


def normalize_text(
    col: Column | str,
    *,
    lowercase: bool = True,
    strip_accents: bool = True,
    collapse_whitespace: bool = True,
) -> Column:
    """Canonical text form for cross-variant matching: lowercase,
    latin-accent fold (explicit translate map — portable), whitespace
    collapse.  'Café  RÉSUMÉ' and 'cafe resume' fingerprint identically;
    feed the result to ``document_fingerprint``/``dedup_fingerprint``
    for accent-insensitive dedup of multilingual corpora.  Pure JVM
    expression chain."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.trim(c)
    if strip_accents:
        out = F.translate(out, _ACCENTED, _PLAIN)
    if lowercase:
        out = F.lower(out)
    if collapse_whitespace:
        out = F.regexp_replace(out, r"\s+", " ")
    return out


def collapse_repeated_lines(col: Column | str) -> Column:
    """Collapse CONSECUTIVE duplicate lines within a document (keep the
    first) — the within-doc counterpart of corpus-wide
    `remove_repeated_passages`: boilerplate navigation blocks, scraped
    pagination spam, and terminal echo all repeat adjacently.  Pure
    JVM array expression (split → index-aware filter → rejoin); exact
    line equality, no normalization (compose with `normalize_text`
    upstream if wanted).
    """
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    kept = F.filter(
        lines, lambda x, i: (i == 0) | (x != F.get(lines, i - 1))
    )
    return F.array_join(kept, "\n")


def encoding_issues(col: Column | str) -> Column:
    """Encoding-damage signals as a struct ``(n_replacement, n_control,
    n_mojibake, suspect)`` — the mojibake screen for crawled text:
    U+FFFD replacement characters (decode already failed), C0 control
    characters other than tab/newline/CR (binary junk), and the
    classic UTF-8-read-as-Latin-1 artifacts (Ã/Â/â€ sequences).
    ``suspect`` fires when any counter is positive.  Pure codegen
    regexp counts — scan-speed; filter on it before tokenization
    (mojibake inflates vocabulary and poisons n-gram stats).
    """
    c = F.col(col) if isinstance(col, str) else col
    n_rep = F.regexp_count(c, F.lit("�"))
    n_ctl = F.regexp_count(c, F.lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"))
    n_moj = F.regexp_count(c, F.lit("Ã.|Â.|â€"))
    return F.struct(
        n_rep.alias("n_replacement"),
        n_ctl.alias("n_control"),
        n_moj.alias("n_mojibake"),
        ((n_rep > 0) | (n_ctl > 0) | (n_moj > 0)).alias("suspect"),
    )


def token_jaccard(col_a: Column | str, col_b: Column | str) -> Column:
    """Token-set Jaccard between two text columns of the SAME row —
    the title-vs-body / query-vs-doc coherence signal (a title sharing
    no vocabulary with its body is boilerplate or mislabeled).  Pure
    JVM: lowered whitespace token sets, |∩|/|∪|; both empty → NULL
    (no evidence either way), one empty → 0.0.
    """
    ta = F.array_distinct(F.transform(tokens(col_a), lambda t: F.lower(t)))
    tb = F.array_distinct(F.transform(tokens(col_b), lambda t: F.lower(t)))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.when(union > 0, inter / union)
