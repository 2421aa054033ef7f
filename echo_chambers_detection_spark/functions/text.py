"""Text-analysis expressions for large-scale training-data pipelines
(BASELINE.json north star: dedup / quality / language-id / fingerprinting
over the documents table).

Everything is a native Catalyst expression (split/filter/transform/
aggregate over arrays) — no Python in the row path, so these run at
whole-stage-codegen speed over 100 TB of text.

Cross-engine determinism: every hash is md5 (hex string), the one hash
both Spark and DuckDB implement identically; minhash 'permutations' are
md5(i:shingle) string minima, so oracle SQL reproduces signatures
byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language stopword sets for the n-gram/stopword language-ID
# heuristic. Deliberately small and overlapping (de/la/en appear in
# multiple languages) — the classifier is a heuristic, not a model.
# 10 languages (VERDICT r3 #8 breadth); all entries ASCII so Spark and
# DuckDB tokenize identically.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "dans", "est"],
    "it": ["il", "di", "che", "e", "la", "per", "non", "una", "sono", "con"],
    "pt": ["o", "de", "que", "e", "do", "da", "em", "um", "para", "com"],
    "nl": ["de", "het", "een", "van", "en", "in", "is", "dat", "op", "te"],
    "sv": ["och", "att", "det", "som", "en", "av", "den", "till", "med", "har"],
    "pl": ["nie", "to", "sie", "na", "jest", "do", "ze", "jak", "ale", "po"],
    "tr": ["bir", "bu", "ve", "da", "ne", "icin", "ile", "mi", "gibi", "en"],
}

# Tie-break order IS the CASE-chain order: earlier language wins ties.
LANG_ORDER = ("en", "es", "de", "fr", "it", "pt", "nl", "sv", "pl", "tr")

# Character-level profiles for the trigram language-ID variant: counts
# of these substrings in the raw lowercased text (so scripts the word
# tokenizer cannot segment — zh — still classify). Latin profiles are
# space-padded trigrams of high-frequency function-word shapes; the zh
# profile is the highest-frequency hanzi. Shared substrings across
# languages are fine — the deterministic chain resolves ties.
TRIGRAM_PROFILES = {
    "en": [" th", "the", "he ", " an", "nd ", "ing"],
    "es": [" de", " la", "os ", " qu", "ion", " es"],
    "de": ["er ", "ein", "ich", "sch", "die", "und"],
    "fr": [" le", "es ", " la", "ent", "que", " et"],
    "it": [" di", "re ", "che", " co", "la ", "to "],
    "pt": [" de", " co", "os ", " pa", "ao ", " um"],
    "nl": [" de", "en ", "een", "van", "het", "aar"],
    "sv": ["och", " at", "en ", "det", "som", "ar "],
    "pl": ["nie", "prz", "ie ", "na ", " po", "ych"],
    "tr": ["bir", "lar", "ler", " ve", " bi", "in "],
    "zh": ["的", "是", "了", "在", "我", "一"],
}

TRIGRAM_ORDER = LANG_ORDER + ("zh",)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str) -> Column:
    """Lowercase word tokens: split on non-alphanumeric runs."""
    return F.filter(
        F.split(F.lower(_c(col)), "[^a-z0-9]+"), lambda x: x != ""
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def word_ngrams(tokens: Column | str, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array when the doc has
    fewer than n tokens.

    The short-doc branch must be an explicit WHEN guard: Spark's
    sequence(1, 0) evaluates DESCENDING to [1, 0], and slice(t, 0, n)
    then raises INVALID_PARAMETER_VALUE.START — so a greatest(.., 0)
    upper bound alone crashes on <n-token docs (empty / punctuation-only
    text, exactly what quality filters see)."""
    t = _c(tokens)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio(tokens: Column | str, lang: str = "en") -> Column:
    t = _c(tokens)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, punct / F.length(c)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0, 1]:
    length saturation x stopword plausibility x punctuation sanity.
    Same closed form is written in the oracle SQL."""
    t = tokenize(col)
    n = F.size(t)
    length_term = F.least(n / F.lit(20.0), F.lit(1.0))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_ratio = F.when(
        n > 0, F.size(F.filter(t, lambda x: F.array_contains(sw, x))) / n
    ).otherwise(F.lit(0.0))
    sw_term = 0.5 + 0.5 * F.least(sw_ratio * 5, F.lit(1.0))
    p_term = 1 - punct_ratio(col)
    return length_term * sw_term * p_term


def _lang_case_chain(hits: dict, order: tuple[str, ...]) -> Column:
    """CASE chain over per-language scores: language L wins if its score
    is >= every LATER language's score — so on full ties the earliest
    language in `order` wins. The oracle SQL builds the identical chain
    from the same tables (catalog._sw_hits_sql / catalog._trigram_hits_sql
    generate the per-language scores, catalog._lang_case_sql the CASE
    chain)."""
    expr = F.lit(order[-1])
    for idx in range(len(order) - 2, -1, -1):
        lang = order[idx]
        cond = None
        for other in order[idx + 1 :]:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def language_id(col: Column | str) -> Column:
    """Stopword-hit language ID over LANG_ORDER (10 languages) with the
    deterministic CASE-chain tie-break — the same chain the oracle SQL
    uses."""
    t = tokenize(col)
    hits = {}
    for lang in LANG_ORDER:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits[lang] = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return _lang_case_chain(hits, LANG_ORDER)


def language_id_trigram(col: Column | str) -> Column:
    """Character-profile language ID over TRIGRAM_ORDER (11 languages
    incl. zh): score = total occurrences of the language's profile
    substrings in the lowercased text (each counted as
    (len - len(remove(sub))) / len(sub) — pure codegen string ops, no
    Python, identical closed form in DuckDB). Scripts the word
    tokenizer cannot segment still classify, which is why this variant
    exists next to the stopword one."""
    t = F.concat(F.lit(" "), F.lower(_c(col)), F.lit(" "))
    hits = {}
    for lang in TRIGRAM_ORDER:
        score = F.lit(0)
        for sub in TRIGRAM_PROFILES[lang]:
            occ = (
                F.length(t) - F.length(F.replace(t, F.lit(sub), F.lit("")))
            ) / F.lit(len(sub))
            score = score + occ.cast("int")
        hits[lang] = score
    return _lang_case_chain(hits, TRIGRAM_ORDER)


# GPT-2-style pre-tokenizer shape, restricted to the regex subset Java
# (Spark) and RE2 (DuckDB) treat identically: a token is an optional
# leading space plus a letter run, digit run, or punctuation run.
BPE_PRETOKEN_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

URL_PATTERN = r"https?://[^ ]+"
EMAIL_PATTERN = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenization (the GPT-2 pre-token split, ASCII
    form): leading-space-attached letter/digit/punct runs — the token
    count a curation pipeline budgets against, as opposed to the
    whitespace word count. Pure regexp_extract_all; the identical
    pattern runs in the DuckDB oracle."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(BPE_PRETOKEN_PATTERN), 0)


def scrub_urls_and_emails(col: Column | str) -> Column:
    """PII/noise scrub: URLs then e-mail addresses replaced with a
    space (standard pre-training curation step). Global replace in both
    engines (Spark regexp_replace is global; the oracle passes 'g')."""
    c = F.regexp_replace(F.lower(_c(col)), URL_PATTERN, " ")
    return F.regexp_replace(c, EMAIL_PATTERN, " ")


def minhash_fingerprint(col: Column | str, ngram: int = 3) -> Column:
    """Single-permutation minhash document fingerprint: the lexicographic
    minimum of md5(shingle) over word n-grams. Deterministic, identical in
    DuckDB (list_min over list_transform). NULL for docs shorter than n
    tokens."""
    shingles = word_ngrams(tokenize(col), ngram)
    return F.array_min(F.transform(shingles, lambda s: F.md5(s)))
