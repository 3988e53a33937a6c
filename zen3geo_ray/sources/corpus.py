"""Deterministic synthetic Common-Crawl-style corpus (input_hint shape).

Generates the ``pages`` table — ``(url:string, warc_ts:timestamp[us,UTC],
html:binary, text:large_string, lang:string)`` — fully determined by
(seed, n_rows, row index):

* hosts follow a Zipf(s≈1.2) distribution so host-anchored geocoding
  produces genuinely hot cells (the URL-geography power law the north
  star requires skew handling for);
* ~2% duplicate urls with distinct ``warc_ts`` (dedup / first-valid
  ordering fixtures);
* html rendered from a template with entities, nested tags, comments,
  script blocks and whitespace edge cases so extraction is non-trivial;
* ``text`` = ``extract_text(html)`` — the byte-identity oracle column.

Generation itself is a Ray Data pipeline (``range(n) -> map_batches``),
so bench-scale corpora (millions of rows) are synthesized in parallel and
written as partitioned parquet without ever materializing on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64
from ..functions.text import extract_text

LANGS = np.array(["en", "de", "ja", "ms", "id", "zh", "pt"])
LANG_CUM = np.cumsum(np.array([0.42, 0.10, 0.10, 0.06, 0.10, 0.12, 0.10]))
EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z
ZIPF_S = 1.2

_TOPIC_WORDS = [
    "zen", "garden", "raster", "vector", "tile", "chip", "cloud", "river",
    "mountain", "sensor", "ocean", "forest", "city", "market", "story",
    "journal", "notes", "guide", "atlas", "archive",
]


def _u(seed_stream: np.ndarray) -> np.ndarray:
    """uint64 hash stream -> uniform [0,1) doubles."""
    return (seed_stream >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _streams(idx: np.ndarray, seed: int, tag: int) -> np.ndarray:
    return splitmix64(idx.astype(np.uint64) + np.uint64(seed * 1_000_003 + tag))


def n_hosts_for(n_rows: int) -> int:
    return max(16, int(np.sqrt(n_rows)))


def pages_batch(idx: np.ndarray, n_rows: int, seed: int = 42) -> pa.Table:
    """Render the pages rows for the given global row indices (vectorized
    where possible; html rendering is a per-row join of precomputed parts).
    """
    idx = np.asarray(idx, dtype=np.int64)
    n = len(idx)
    n_hosts = n_hosts_for(n_rows)

    # ~2% duplicate urls: rows with u_dup<0.02 reuse the url of (idx - step)
    u_dup = _u(_streams(idx, seed, 7))
    src = np.where((u_dup < 0.02) & (idx >= 13), idx - 13, idx)

    # Zipf-ish host rank: log-uniform draw => P(rank) ~ 1/(rank+1), a
    # genuine hot-head power law (host 0 gets ~1/ln(n_hosts) of all pages)
    u_host = _u(_streams(src, seed, 1))
    ranks = (np.exp(u_host * np.log(n_hosts + 1.0)) - 1.0).astype(np.int64)
    np.clip(ranks, 0, n_hosts - 1, out=ranks)

    lang_u = _u(_streams(ranks, seed, 2))  # lang is a host property
    lang_i = np.searchsorted(LANG_CUM, lang_u, side="right")
    np.clip(lang_i, 0, len(LANGS) - 1, out=lang_i)
    langs = LANGS[lang_i]

    urls = [
        f"https://{langs[i]}.host-{ranks[i]:05d}.example/p/{src[i]}"
        for i in range(n)
    ]
    ts = EPOCH_US + idx * 1_000_037 + (_streams(idx, seed, 3) % np.uint64(997)).astype(np.int64)

    w1 = _streams(src, seed, 4) % np.uint64(len(_TOPIC_WORDS))
    w2 = _streams(src, seed, 5) % np.uint64(len(_TOPIC_WORDS))
    npar = 1 + (_streams(src, seed, 6) % np.uint64(4)).astype(np.int64)

    htmls: list[bytes] = []
    texts: list[str] = []
    for i in range(n):
        t1 = _TOPIC_WORDS[int(w1[i])]
        t2 = _TOPIC_WORDS[int(w2[i])]
        k = int(src[i])
        paras = "".join(
            f"<p>Paragraph {j} about {t1} &amp; {t2} — item #{k} "
            f"<b>bold{j}</b>\t<i>ital</i>&nbsp;end.</p>\n"
            for j in range(int(npar[i]))
        )
        html = (
            f"<html><head><title>{t1.title()} {t2} {k}</title>"
            f"<style>p {{color: red}}</style>"
            f"<script>var x = {k}; if (x > 1) {{ x += 2; }}</script></head>\n"
            f"<body><!-- comment {k} --><h1>{t1} &lt;{t2}&gt;</h1>\n{paras}"
            f"<div>footer   of  host {int(ranks[i])}</div></body></html>"
        ).encode("utf-8")
        htmls.append(html)
        texts.append(extract_text(html))

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.large_string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        }
    )


def pages_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Whole corpus in memory — tests / small scales only."""
    return pages_batch(np.arange(n_rows), n_rows, seed)


def pages_dataset(n_rows: int, seed: int = 42, parallelism: int = -1):
    """Corpus as a streaming Ray Dataset (bench scale)."""
    import ray.data as rd

    ds = rd.range(n_rows, override_num_blocks=parallelism if parallelism > 0 else None)

    def render(batch: pa.Table) -> pa.Table:
        return pages_batch(batch.column("id").to_numpy(), n_rows, seed)

    return ds.map_batches(render, batch_format="pyarrow", batch_size=4096)


def write_pages_parquet(path: str, n_rows: int, seed: int = 42, parallelism: int = -1):
    pages_dataset(n_rows, seed, parallelism).write_parquet(path)
