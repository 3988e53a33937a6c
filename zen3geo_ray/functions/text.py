"""Pure, deterministic HTML→text extraction + text-analysis kernels.

``extract_text`` is the per-row invariant of the whole engine
(BASELINE.json input_hint: "byte-identical extracted text per url"): it is
a pure function of the ``html`` bytes — no wall clock, no RNG, no library
whose minor version changes output — so Ray task retries and any
partitioning produce byte-identical results.  The corpus synthesizer
(zen3geo_ray.sources.corpus) writes ``text = extract_text(html)`` and the
parity test re-derives it per url.

Analysis kernels (token_count, quality metrics, lang-id, fingerprints) are
the text-side operator extensions a training-data pipeline needs; their
definitions are deliberately simple enough to restate in DuckDB SQL where
the correctness oracle checks them.
"""

from __future__ import annotations

import html as _htmlmod
import re

import numpy as np

_RE_SCRIPT = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_RE_COMMENT = re.compile(rb"(?s)<!--.*?-->")
_RE_BLOCK_TAG = re.compile(
    rb"(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|"
    rb"footer|blockquote|pre|title|body|html|head)\b[^>]*>"
)
_RE_ANY_TAG = re.compile(rb"<[^>]*>")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")
_RE_NL = re.compile(r" ?\n ?")
_RE_MULTI_NL = re.compile(r"\n{2,}")


def extract_text(html: bytes) -> str:
    """Deterministic html bytes -> visible text.

    Pipeline: drop script/style/comments -> block tags become newlines ->
    remaining tags become nothing -> entity unescape -> whitespace
    normalization (runs of spaces collapse, lines stripped, >=2 blank
    lines collapse to one newline, outer strip).
    """
    if html is None:
        return ""
    if isinstance(html, str):
        html = html.encode("utf-8")
    b = _RE_SCRIPT.sub(b"", html)
    b = _RE_COMMENT.sub(b"", b)
    b = _RE_BLOCK_TAG.sub(b"\n", b)
    b = _RE_ANY_TAG.sub(b"", b)
    s = b.decode("utf-8", errors="replace")
    s = _htmlmod.unescape(s)
    s = _RE_SPACES.sub(" ", s)
    s = _RE_NL.sub("\n", s)
    s = _RE_MULTI_NL.sub("\n", s)
    return s.strip()


def extract_text_array(htmls) -> list[str]:
    """Per-row extraction over a batch column (regexes precompiled above)."""
    return [extract_text(h) for h in htmls]


# --- analysis kernels -----------------------------------------------------

_RE_TOKEN = re.compile(r"\S+")


def _as_string_array(texts):
    import pyarrow as pa

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        return texts
    return pa.array(list(texts), pa.string())


def token_count(texts) -> np.ndarray:
    """Whitespace token count — one vectorized RE2 kernel over the whole
    column (``pyarrow.compute.count_substring_regex``), no per-doc loop.
    Same RE2 semantics the DuckDB oracle's regexp_extract_all uses."""
    import pyarrow.compute as pc

    arr = _as_string_array(texts)
    out = pc.fill_null(pc.count_substring_regex(arr, pattern=r"\S+"), 0)
    return out.to_numpy(zero_copy_only=False).astype(np.int64)


# BPE-ish pre-tokenizer pattern (GPT-2 flavor, RE2-compatible: the
# original's \s+(?!\S) lookahead is dropped — trailing whitespace runs
# count as one token).  Identical RE2 semantics in pyarrow and DuckDB.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(texts) -> np.ndarray:
    """BPE-style pre-token count (word/number/punct splits + contraction
    suffixes) — the closer proxy for LLM token budgeting than whitespace
    counting; one vectorized RE2 kernel."""
    import pyarrow.compute as pc

    arr = _as_string_array(texts)
    out = pc.fill_null(pc.count_substring_regex(arr, pattern=BPE_PATTERN), 0)
    return out.to_numpy(zero_copy_only=False).astype(np.int64)


_PUNCT = ".,;:!?"


def quality_metrics(texts) -> dict[str, np.ndarray]:
    """Simple quality-scoring signals (n_chars, n_tokens, punct_ratio,
    upper_ratio, mean_token_len) — all pyarrow.compute kernels over the
    column (utf8_length + count_substring/_regex), zero per-doc Python.
    Definitions restated in the SQL oracle."""
    import pyarrow.compute as pc

    arr = _as_string_array(texts)
    n_chars = pc.fill_null(pc.utf8_length(arr), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_tokens = pc.fill_null(
        pc.count_substring_regex(arr, pattern=r"\S+"), 0
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    n_punct = np.zeros(len(n_chars), dtype=np.int64)
    for c in _PUNCT:
        n_punct += pc.fill_null(pc.count_substring(arr, pattern=c), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
    n_upper = pc.fill_null(
        pc.count_substring_regex(arr, pattern=r"\p{Lu}"), 0
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    denom = np.maximum(n_chars, 1).astype(np.float64)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / denom,
        "upper_ratio": n_upper / denom,
        "mean_token_len": n_chars / np.maximum(n_tokens, 1),
    }


# tiny per-language character/stopword profiles for the n-gram heuristic
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset({"the", "and", "of", "to", "in", "is", "you", "that"}),
    "de": frozenset({"der", "die", "und", "das", "ist", "nicht", "ein", "zu"}),
    "pt": frozenset({"que", "não", "uma", "para", "com", "os", "de", "em"}),
    "id": frozenset({"yang", "dan", "di", "itu", "dengan", "untuk", "ini"}),
    "ms": frozenset({"yang", "dan", "di", "itu", "dengan", "untuk", "adalah"}),
    "fr": frozenset({"le", "la", "et", "les", "des", "est", "pas", "une"}),
    "es": frozenset({"el", "la", "que", "los", "una", "es", "por", "con"}),
}


def detect_lang(texts) -> list[str]:
    """Stopword-overlap language heuristic; CJK via unicode ranges.

    Vectorized: one lowered column, one CJK regex pass each, then one
    presence regex per (lang, stopword) — 50-odd RE2 kernels over the
    whole column instead of a Python loop per document.  Presence of a
    stopword as a standalone ``\\S+`` token == bounded-by-whitespace
    match.  Best score > 0 wins; ties break to the smallest lang code
    (argmax over lang-sorted score matrix).
    """
    import pyarrow.compute as pc

    arr = _as_string_array(texts)
    low = pc.utf8_lower(arr)
    n = len(arr)
    ja = pc.fill_null(
        pc.match_substring_regex(low, pattern="[぀-ヿ]"), False
    ).to_numpy(zero_copy_only=False)
    zh = pc.fill_null(
        pc.match_substring_regex(low, pattern="[一-鿿]"), False
    ).to_numpy(zero_copy_only=False)
    langs = sorted(_LANG_PROFILES)
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    for li, lang in enumerate(langs):
        for w in _LANG_PROFILES[lang]:
            pat = f"(^|\\s){re.escape(w)}(\\s|$)"
            hit = pc.fill_null(
                pc.match_substring_regex(low, pattern=pat), False
            ).to_numpy(zero_copy_only=False)
            scores[:, li] += hit
    best_idx = np.argmax(scores, axis=1)  # first max = smallest lang code
    best_score = scores[np.arange(n), best_idx]
    lang_arr = np.asarray(langs, dtype=object)
    out = np.where(best_score > 0, lang_arr[best_idx], "und")
    out = np.where(zh, "zh", out)
    out = np.where(ja, "ja", out)
    return out.tolist()


def rolling_fingerprint(texts, window: int = 8) -> np.ndarray:
    """Document fingerprint: min of rolling polynomial hashes (winnowing
    flavor) — stable under small appends, used for near-dup prefilters."""
    B = np.uint64(257)
    out = np.empty(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            data = (t or "").encode("utf-8")
            if len(data) < window:
                from .hashing import fnv1a_bytes

                out[i] = np.uint64(fnv1a_bytes(data))
                continue
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
            acc = np.zeros(len(arr) - window + 1, dtype=np.uint64)
            for j in range(window):
                acc = acc * B + arr[j : j + len(acc)]
            out[i] = acc.min()
    return out


def redact(texts, rules: list[tuple[str, str]]):
    """Vectorized regex redaction (PII-scrub mechanism) — each rule is a
    (RE2 pattern, replacement) pair applied IN ORDER over the whole
    column with ``pyarrow.compute.replace_substring_regex`` (global, all
    occurrences); per-rule match counts are taken on the text as it
    stands BEFORE that rule runs (i.e. after all earlier rules).

    RE2 on both sides makes this oracle-mirrorable: DuckDB
    ``regexp_replace(t, pat, rep, 'g')`` + ``len(regexp_extract_all)``
    compute the identical result.  Real deployments swap in email/
    phone/SSN patterns; the mechanism (vectorized kernel, no per-row
    Python) is what matters at 100 TB.

    Returns ``(redacted_array, [per-rule int64 counts])``.
    """
    import pyarrow.compute as pc

    arr = _as_string_array(texts)
    counts = []
    for pat, rep in rules:
        c = pc.fill_null(pc.count_substring_regex(arr, pattern=pat), 0)
        counts.append(c.to_numpy(zero_copy_only=False).astype(np.int64))
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=rep)
    return arr, counts


def split_url(urls):
    """Vectorized URL decomposition with pyarrow RE2 kernels: returns a
    dict of StringArrays ``scheme / host / path / query`` (missing parts
    = empty string).  The host is the per-domain key for quota caps
    (stages/partition.py:quota_per_key), domain-level aggregation and
    politeness bucketing in a crawl pipeline.

    Pure compute — no Python per row; reference surface: zen3geo reads
    remote ``/vsicurl/`` URLs (zen3geo/datapipes/pyogrio.py:15-92) but
    never parses them; a web-corpus engine needs the decomposition.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = urls if isinstance(urls, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(urls), pa.string())
    ex = pc.extract_regex(
        arr, pattern=r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://)?"
                     r"(?P<host>[^/?#]*)"
                     r"(?P<path>[^?#]*)"
                     r"(?:\?(?P<query>[^#]*))?")
    out = {}
    for f in ("scheme", "host", "path", "query"):
        col = pc.struct_field(ex, f)
        out[f] = pc.coalesce(col, pa.scalar("", pa.string()))
    return out


def registered_domain(hosts):
    """Heuristic registered domain: the last two dot-labels of the host
    (``a.b.en.host-1.example`` -> ``host-1.example``); hosts with fewer
    than two labels pass through.  Vectorized RE2 extraction."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = hosts if isinstance(hosts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(hosts), pa.string())
    ex = pc.extract_regex(arr, pattern=r"(?P<d>[^.]+\.[^.]+)$")
    return pc.coalesce(pc.struct_field(ex, "d"), arr)


def normalize_ascii(col):
    """Canonical ASCII text normalization for dedup: lowercase, every
    non-[a-z0-9] run -> one space, trim.  Both pyarrow and DuckDB run
    RE2 + UTF-8-aware lower(), so the SQL mirror
    ``trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+',
    ' ', 'g'), ' +', ' ', 'g'))`` is byte-identical (verified over the
    corpus — non-ASCII letters are swept into the separator class, so
    case-mapping divergence beyond ASCII cannot surface)."""
    import pyarrow.compute as pc

    x = pc.utf8_lower(col)
    x = pc.replace_substring_regex(x, "[^a-z0-9]+", " ")
    x = pc.replace_substring_regex(x, " +", " ")
    return pc.utf8_trim_whitespace(x)


READ_SENT_RE = r"[.!?]+"
READ_SYL_RE = "[aeiouyAEIOUY]+"


def readability_metrics(col: "pa.ChunkedArray | pa.Array"):
    """Flesch-reading-ease ingredients via RE2 counts (pyarrow and
    DuckDB share RE2, so counts mirror bit-exactly): words = \\S+ runs
    (the pinned tokenizer convention), sentences = [.!?]+ runs
    (floored at 1), syllable proxy = vowel-group runs.  Returns
    (n_words, n_sents, n_syl, flesch) numpy arrays; flesch =
    206.835 - 1.015*(W/S) - 84.6*(Y/W), NaN-free: None when W = 0."""
    import pyarrow.compute as pc

    w = pc.count_substring_regex(col, r"\S+").to_numpy(
        zero_copy_only=False).astype(np.int64)
    s = pc.count_substring_regex(col, READ_SENT_RE).to_numpy(
        zero_copy_only=False).astype(np.int64)
    y = pc.count_substring_regex(col, READ_SYL_RE).to_numpy(
        zero_copy_only=False).astype(np.int64)
    s1 = np.maximum(s, 1)
    flesch = [206.835 - 1.015 * (float(wi) / float(si))
              - 84.6 * (float(yi) / float(wi)) if wi else None
              for wi, si, yi in zip(w.tolist(), s1.tolist(), y.tolist())]
    return w, s1, y, flesch
