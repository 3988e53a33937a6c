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


def token_count(texts) -> np.ndarray:
    """Whitespace token count.  SQL oracle: counting space-runs + 1."""
    return np.fromiter(
        (len(_RE_TOKEN.findall(t)) if t else 0 for t in texts),
        dtype=np.int64,
        count=len(texts),
    )


_PUNCT = ".,;:!?"


def quality_metrics(texts) -> dict[str, np.ndarray]:
    """Simple quality-scoring signals (n_chars, n_tokens, punct_ratio,
    upper_ratio, mean_token_len).  Definitions restated in the SQL oracle.
    """
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_tokens = np.empty(n, dtype=np.int64)
    n_punct = np.empty(n, dtype=np.int64)
    n_upper = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        n_tokens[i] = len(_RE_TOKEN.findall(t))
        n_punct[i] = sum(t.count(c) for c in _PUNCT)
        n_upper[i] = sum(c.isupper() for c in t)
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

    Returns best-scoring lang code or 'und'.  Deterministic; ties broken
    by sorted lang code.
    """
    out = []
    for t in texts:
        t = (t or "").lower()
        if any("぀" <= c <= "ヿ" for c in t):
            out.append("ja")
            continue
        if any("一" <= c <= "鿿" for c in t):
            out.append("zh")
            continue
        words = set(_RE_TOKEN.findall(t))
        best, best_score = "und", 0
        for lang in sorted(_LANG_PROFILES):
            score = len(words & _LANG_PROFILES[lang])
            if score > best_score:
                best, best_score = lang, score
        out.append(best)
    return out


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
            h = np.zeros(len(arr) - window + 1, dtype=np.uint64)
            acc = np.zeros_like(h)
            for j in range(window):
                acc = acc * B + arr[j : j + len(h)]
            h = acc
            out[i] = h.min()
    return out
