"""Deterministic synthetic Common-Crawl-style webpages generator.

Schema per BASELINE.json ``input_hint`` / FIXTURES.md §1:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Every field is a pure function of (row index, seed): per-row randomness
comes from splitmix64 streams keyed on the absolute row index, so any
sharding/parallelism produces byte-identical rows — the property the
distributed-vs-sequential extraction invariant is tested against. No
global RNG state; no external data.

Host pool is Zipf-ish (quadratic inverse-CDF over 1000 hosts), html byte
length is log-normal (FIXTURES.md: ln-space mu/sigma; scaled down by
default for test speed), lang is drawn from the skewed CDF
(en .62, zh .10, es .07, de .05, fr .04, ru .03, ja .03, pt .02,
it/nl/ko/ar .01 each).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ray.extract import extract_text_series
from ddsketch_ray.hashing import splitmix64

_EPOCH_2025_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds
_90_DAYS_US = 90 * 86400 * 1_000_000

_LANGS = ["en", "zh", "es", "de", "fr", "ru", "ja", "pt", "it", "nl", "ko", "ar"]
_LANG_CDF = np.cumsum([0.62, 0.10, 0.07, 0.05, 0.04, 0.03, 0.03, 0.02, 0.01, 0.01, 0.01, 0.01])

# deterministic pseudo-word pool: 256 words over a fixed alphabet
_CONS = "bcdfghklmnprstvz"
_VOWS = "aeiou"
_WORDS = [
    _CONS[(w * 7) % 16] + _VOWS[(w * 3) % 5] + _CONS[(w * 11) % 16] + _VOWS[(w * 13) % 5] + (_CONS[(w * 5) % 16] if w % 3 else "")
    for w in range(256)
]


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _stream(i: np.ndarray, seed: int, lane: int) -> np.ndarray:
    return splitmix64(i ^ splitmix64(np.uint64((seed * 1000003 + lane) & 0xFFFFFFFFFFFFFFFF)))


def webpages_table(
    start: int,
    n: int,
    seed: int = 42,
    ln_mu: float = 6.5,
    ln_sigma: float = 1.2,
    max_bytes: int = 4 * 1024 * 1024,
) -> pa.Table:
    """Rows [start, start+n) of the infinite deterministic page stream.

    ln_mu/ln_sigma control the log-normal html byte length (FIXTURES.md
    specifies mu≈9.5 for the full-scale table; the default 6.5 keeps test
    fixtures small). Raising n/seed/mu never changes earlier rows.
    """
    return webpages_table_for_indices(
        np.arange(start, start + n, dtype=np.uint64),
        seed=seed,
        ln_mu=ln_mu,
        ln_sigma=ln_sigma,
        max_bytes=max_bytes,
    )


def webpages_table_for_indices(
    indices: np.ndarray,
    seed: int = 42,
    ln_mu: float = 6.5,
    ln_sigma: float = 1.2,
    max_bytes: int = 4 * 1024 * 1024,
) -> pa.Table:
    """Rows for an arbitrary set of absolute row indices (order preserved).
    Content of a row depends only on (index, seed) — never on the batch."""
    i = np.asarray(indices, dtype=np.uint64)
    h_host = _stream(i, seed, 1)
    h_ts = _stream(i, seed, 2)
    h_norm1 = _stream(i, seed, 3)
    h_norm2 = _stream(i, seed, 4)
    h_lang = _stream(i, seed, 5)
    h_body = _stream(i, seed, 6)

    host_rank = np.minimum((1000 * _u01(h_host) ** 2).astype(np.int64), 999)
    urls = [
        f"https://host{r:04d}.example.com/p/{idx:012d}"
        for r, idx in zip(host_rank.tolist(), i.tolist())
    ]
    ts = (_EPOCH_2025_US + (h_ts % np.uint64(_90_DAYS_US)).astype(np.int64)).astype(
        "datetime64[us]"
    )
    # Box-Muller from two uniform lanes (deterministic normal)
    u1 = np.clip(_u01(h_norm1), 1e-12, 1.0)
    u2 = _u01(h_norm2)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    target_len = np.clip(np.exp(ln_mu + ln_sigma * z), 256, max_bytes).astype(np.int64)
    lang_idx = np.searchsorted(_LANG_CDF, _u01(h_lang), side="right")
    lang_idx = np.minimum(lang_idx, len(_LANGS) - 1)
    langs = [_LANGS[k] for k in lang_idx.tolist()]

    htmls = [
        _build_html(int(hb), int(tl), u, lg)
        for hb, tl, u, lg in zip(h_body.tolist(), target_len.tolist(), urls, langs)
    ]
    # vectorized extractor — byte-identical to extract_text (tested)
    texts = extract_text_series(pa.array(htmls, type=pa.binary()))

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": texts,
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def _build_html(h: int, target_len: int, url: str, lang: str) -> bytes:
    """Assemble one page deterministically from integer h. Template per
    FIXTURES.md: title + nav/script/style boilerplate + hash-derived
    paragraphs + occasional malformed tags."""
    rng = h
    words = _WORDS

    def nxt() -> int:
        nonlocal rng
        rng = (rng * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        return rng >> 33

    title = " ".join(words[nxt() % 256] for _ in range(3 + nxt() % 4))
    parts = [
        "<html><head><title>",
        title,
        '</title><script type="text/javascript">var t=',
        str(nxt() % 100000),
        ';function f(){return t*2;}</script><style>.nav{color:#333;} p{margin:4px;}</style></head>',
        '<body><nav class="nav"><a href="/">Home</a> | <a href="/about">About</a> | <a href="/contact">Contact</a></nav>',
        "<!-- generated page ",
        lang,
        " -->",
    ]
    size = sum(len(p) for p in parts)
    malformed = (h % 17) == 0
    while size < target_len:
        n_words = 8 + nxt() % 25
        para = " ".join(words[nxt() % 256] for _ in range(n_words))
        amp = " &amp; " + words[nxt() % 256] if nxt() % 5 == 0 else ""
        if malformed and nxt() % 7 == 0:
            block = "<p class='x'>" + para + amp  # unclosed tag on purpose
        else:
            block = "<p>" + para + amp + "</p>"
        parts.append(block)
        size += len(block)
    parts.append('<footer>&copy; ' + url.split("/")[2] + "</footer></body></html>")
    return "".join(parts).encode("utf-8")


def generate_webpages(
    n: int,
    seed: int = 42,
    ln_mu: float = 6.5,
    ln_sigma: float = 1.2,
    override_num_blocks: int | None = None,
):
    """Distributed deterministic generation as a Ray Dataset.

    ray.data.range(n) → map_batches over index batches; each batch derives
    its rows purely from absolute indices, so block layout cannot change
    content. Returns a Dataset with the webpages schema.
    """
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        return webpages_table_for_indices(ids, seed=seed, ln_mu=ln_mu, ln_sigma=ln_sigma)

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)


def write_webpages_fixture(
    path: str, n: int, seed: int = 42, ln_mu: float = 6.5, ln_sigma: float = 1.2
) -> str:
    """Single-process fixture writer (tests); one parquet file at `path`."""
    import pyarrow.parquet as pq

    pq.write_table(webpages_table(0, n, seed=seed, ln_mu=ln_mu, ln_sigma=ln_sigma), path)
    return path


def generate_page_features(
    n: int,
    seed: int = 42,
    ln_mu: float = 6.5,
    ln_sigma: float = 1.2,
    override_num_blocks: int | None = None,
):
    """Fused generate→derive: one map_batches producing the small feature
    columns (url, lang, text_len, html_len, extract_ok) directly, so the
    wide html/text bytes never enter the object store. This is the
    shape a read-from-storage pipeline has after column pruning."""
    import ray.data as rd

    from ddsketch_ray.pipelines.webpages import derive_page_features

    def gen(batch):
        pages = webpages_table_for_indices(
            batch["id"], seed=seed, ln_mu=ln_mu, ln_sigma=ln_sigma
        )
        return derive_page_features(pages)

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)
