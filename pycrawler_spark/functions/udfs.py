"""Vectorized pandas/Arrow UDFs wrapping the pure-Python cores.

BASELINE.json input_hint mandates "vectorized pandas/Arrow UDFs (no
per-row Python) throughout": every UDF here is a ``pandas_udf``
operating on whole Series per Arrow batch. Anything expressible with
JVM built-ins (md5/sha2, concat, rlike, ...) is NOT here — use
``pyspark.sql.functions`` directly so it stays in whole-stage codegen.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from pycrawler_spark import htmlkit, textkit, urlkit

# --- URL struct type (X2/X3 accessors as one struct column) --------------

URL_STRUCT = T.StructType(
    [
        T.StructField("scheme", T.StringType()),
        T.StructField("netloc", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("query", T.StringType()),
        T.StructField("fragment", T.StringType()),
        T.StructField("fld", T.StringType()),
        T.StructField("suffix", T.StringType()),
        T.StructField("origin", T.StringType()),
        T.StructField("url_full", T.StringType()),
    ]
)

_URL_FIELDS = [f.name for f in URL_STRUCT.fields]


def _parse_one(u: Optional[str]):
    p = urlkit.parse_url(u) if u is not None else None
    if p is None:
        return (None,) * len(_URL_FIELDS)
    return (
        p.scheme, p.netloc, p.host, p.path, p.query, p.fragment, p.fld,
        p.suffix, urlkit.url_origin(p), urlkit.url_str_with_query_fragment(p),
    )


@pandas_udf(URL_STRUCT)
def parse_url_udf(urls: pd.Series) -> pd.DataFrame:
    """X2 get_tld_object + X3 accessors (utils.py:37-41, 68-87)."""
    rows = [_parse_one(u) for u in urls]
    return pd.DataFrame(rows, columns=_URL_FIELDS)


@pandas_udf(T.StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    """X1 normalize_url with defaults (query=True, fragment=False) —
    the URL-seen key (utils.py:43-66, database.py:287-291)."""
    return urls.map(lambda u: urlkit.normalize_url(u) if u is not None else None)


@pandas_udf(URL_STRUCT)
def join_href_udf(base_urls: pd.Series, hrefs: pd.Series) -> pd.DataFrame:
    """X4 get_url_from_href (utils.py:89-94): urljoin against the page
    URL (with query+fragment), then parse/PSL-validate."""
    rows = []
    for base, href in zip(base_urls, hrefs):
        p = urlkit.parse_url(base) if base is not None else None
        r = urlkit.url_from_href(href, p) if p is not None else None
        if r is None:
            rows.append((None,) * len(_URL_FIELDS))
        else:
            rows.append(
                (
                    r.scheme, r.netloc, r.host, r.path, r.query, r.fragment,
                    r.fld, r.suffix, urlkit.url_origin(r),
                    urlkit.url_str_with_query_fragment(r),
                )
            )
    return pd.DataFrame(rows, columns=_URL_FIELDS)


# --- fused link resolution (X4 + X1 in one Arrow pass) --------------------

RESOLVED_LINK_STRUCT = T.StructType(
    URL_STRUCT.fields + [T.StructField("norm", T.StringType())]
)
_RESOLVED_FIELDS = [f.name for f in RESOLVED_LINK_STRUCT.fields]


@pandas_udf(RESOLVED_LINK_STRUCT)
def resolve_href_udf(base_urls: pd.Series, hrefs: pd.Series) -> pd.DataFrame:
    """X4 urljoin + X2 parse + X1 normalize fused into ONE pass over
    the exploded links (each as a separate UDF costs an extra Arrow
    round-trip over the biggest intermediate of the wave). The base
    page URL repeats for every link of a page — parse it once per
    distinct base per batch."""
    base_cache: dict = {}
    rows = []
    for base, href in zip(base_urls, hrefs):
        p = base_cache.get(base)
        if p is None and base is not None:
            p = urlkit.parse_url(base)
            base_cache[base] = p
        r = urlkit.url_from_href(href, p) if p is not None else None
        if r is None:
            rows.append((None,) * len(_RESOLVED_FIELDS))
        else:
            full = urlkit.url_str_with_query_fragment(r)
            rows.append(
                (
                    r.scheme, r.netloc, r.host, r.path, r.query, r.fragment,
                    r.fld, r.suffix, urlkit.url_origin(r), full,
                    urlkit.normalize_url(full),
                )
            )
    return pd.DataFrame(rows, columns=_RESOLVED_FIELDS)


# --- HTML extraction UDFs (F1, X9, M4, M5) -------------------------------

PAGE_FEATURES_STRUCT = T.StructType(
    [
        T.StructField("extracted_text", T.StringType()),
        T.StructField("meta_headers", T.ArrayType(T.StringType())),
        T.StructField("has_login_form", T.BooleanType()),
        T.StructField("has_cookie_banner", T.BooleanType()),
        T.StructField("hrefs", T.ArrayType(T.StringType())),
    ]
)


@pandas_udf(PAGE_FEATURES_STRUCT)
def page_features_udf(html: pd.Series) -> pd.DataFrame:
    """Fused per-page extraction (M1/M2/M4/M5): html is the fat column;
    each separate UDF ships it through Arrow again, so one fused pass
    (one decode + one comment/script strip, htmlkit.page_features)
    replaces five."""
    return _pf_frame(html, True)


@pandas_udf(PAGE_FEATURES_STRUCT)
def page_features_nolinks_udf(html: pd.Series) -> pd.DataFrame:
    """page_features without href extraction — for waves at the final
    crawl depth (no link collection; the leaf wave is the largest one
    in a BFS crawl). Same schema; hrefs column is null."""
    return _pf_frame(html, False)


def _pf_frame(html: pd.Series, with_hrefs: bool) -> pd.DataFrame:
    # column-wise assembly: pd.DataFrame from a dict of lists skips the
    # per-row tuple transpose (measurable at 10^5 rows/batch-set)
    texts, metas, logins, cookies, hrefss = [], [], [], [], []
    for h in html:
        t, m, lg, ck, hr = htmlkit.page_features(h, with_hrefs)
        texts.append(t)
        metas.append(m)
        logins.append(lg)
        cookies.append(ck)
        hrefss.append(hr)
    return pd.DataFrame(
        {
            "extracted_text": texts,
            "meta_headers": metas,
            "has_login_form": logins,
            "has_cookie_banner": cookies,
            "hrefs": hrefss,
        }
    )

PAGE_FEATURES_LINKS_STRUCT = T.StructType(
    [
        T.StructField("extracted_text", T.StringType()),
        T.StructField("meta_headers", T.ArrayType(T.StringType())),
        T.StructField("has_login_form", T.BooleanType()),
        T.StructField("has_cookie_banner", T.BooleanType()),
        T.StructField("links", T.ArrayType(RESOLVED_LINK_STRUCT)),
    ]
)

_NULL_LINK = (None,) * len(_RESOLVED_FIELDS)


def _full_link_tuple(r, full: str):
    return (
        r.scheme, r.netloc, r.host, r.path, r.query, r.fragment,
        r.fld, r.suffix, urlkit.url_origin(r), full,
        urlkit.normalize_url(full),
    )


def _slim_link_tuple(r, full: str):
    return (
        r.scheme, r.host, r.fld, urlkit.url_origin(r),
        full, urlkit.normalize_url(full),
    )


def _resolve_frame(html, base_urls, build_link, null_link) -> pd.DataFrame:
    """The ONE fused extraction+resolution loop shared by the full and
    slim struct UDFs — the positional parity invariant (all-null
    placeholder for unresolvable hrefs, base-None handling) lives in
    exactly one place."""
    texts, metas, logins, cookies, linkss = [], [], [], [], []
    for h, base in zip(html, base_urls):
        t, m, lg, ck, hr = htmlkit.page_features(h, True)
        texts.append(t)
        metas.append(m)
        logins.append(lg)
        cookies.append(ck)
        p = urlkit.parse_url(base) if base is not None else None
        links = []
        for href in hr or []:
            r = urlkit.url_from_href(href, p) if p is not None else None
            if r is None:
                links.append(null_link)
            else:
                full = urlkit.url_str_with_query_fragment(r)
                links.append(build_link(r, full))
        linkss.append(links)
    return pd.DataFrame(
        {
            "extracted_text": texts,
            "meta_headers": metas,
            "has_login_form": logins,
            "has_cookie_banner": cookies,
            "links": linkss,
        }
    )


@pandas_udf(PAGE_FEATURES_LINKS_STRUCT)
def page_features_resolve_udf(
    html: pd.Series, base_urls: pd.Series
) -> pd.DataFrame:
    """page_features + href resolution fused into ONE Python pass.

    The split pipeline (page_features -> ship hrefs to JVM -> explode
    -> resolve_href_udf) pays a second Arrow round-trip over the
    wave's biggest intermediate (every discovered link) plus a second
    Python stage spin-up; here the hrefs never leave Python unresolved
    — the page's base URL is parsed once and every href resolves in
    the same batch that extracted it. The JVM side then only explodes
    already-resolved structs.

    Parity invariant: entry i of ``links`` corresponds to href i in
    document order (F1, modules/CollectUrls.py:60-77) — unresolvable
    hrefs yield an all-null struct rather than being dropped, so
    ``posexplode`` downstream assigns the SAME pos numbering as the
    unfused path (which filters after explode) and crawl-order parity
    is preserved byte-for-byte."""
    return _resolve_frame(html, base_urls, _full_link_tuple, _NULL_LINK)


# Slim variant: the candidate pipeline (operators/links.py) touches
# exactly these six fields — scheme/origin/fld for F3-F5, url_full/
# norm/host for the frontier row. netloc/path/query/fragment/suffix
# are substrings of url_full (or derivable), so shipping them through
# Arrow and the explode doubles the per-link payload for nothing. The
# full struct is kept for jobs with F6 url_filters registered (a
# pluggable predicate may reference any field).
SLIM_LINK_STRUCT = T.StructType(
    [
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("fld", T.StringType()),
        T.StructField("origin", T.StringType()),
        T.StructField("url_full", T.StringType()),
        T.StructField("norm", T.StringType()),
    ]
)

PAGE_FEATURES_LINKS_SLIM_STRUCT = T.StructType(
    [
        T.StructField("extracted_text", T.StringType()),
        T.StructField("meta_headers", T.ArrayType(T.StringType())),
        T.StructField("has_login_form", T.BooleanType()),
        T.StructField("has_cookie_banner", T.BooleanType()),
        T.StructField("links", T.ArrayType(SLIM_LINK_STRUCT)),
    ]
)

_NULL_SLIM_LINK = (None,) * len(SLIM_LINK_STRUCT.fields)


@pandas_udf(PAGE_FEATURES_LINKS_SLIM_STRUCT)
def page_features_resolve_slim_udf(
    html: pd.Series, base_urls: pd.Series
) -> pd.DataFrame:
    """page_features_resolve_udf with the slim link struct. Same fused
    single Python pass, same positional parity invariant (unresolvable
    hrefs stay as all-null entries)."""
    return _resolve_frame(html, base_urls, _slim_link_tuple, _NULL_SLIM_LINK)


@pandas_udf(T.ArrayType(T.StringType()))
def extract_hrefs_udf(html: pd.Series) -> pd.Series:
    """F1 link extraction: a[href] values in document order
    (modules/CollectUrls.py:60-77)."""
    return html.map(htmlkit.extract_hrefs)


@pandas_udf(T.ArrayType(T.StringType()))
def extract_meta_udf(html: pd.Series) -> pd.Series:
    """X9 meta http-equiv tags (modules/SaveURL.py:35-38)."""
    return html.map(htmlkit.extract_meta_http_equiv)


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Visible-text extraction — byte-identical invariant surface."""
    return html.map(htmlkit.extract_text)


@pandas_udf(T.BooleanType())
def login_form_udf(html: pd.Series) -> pd.Series:
    """M4 FindLoginForms static detection (FindLoginForms.py:88-181)."""
    return html.map(htmlkit.detect_login_form)


@pandas_udf(T.StringType())
def refresh_target_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """K2/J5 redirect hop: zero-delay meta-refresh target, absolute
    (corpus-mode stand-in for the Playwright redirect chain,
    crawler.py:145-150)."""
    return pd.Series(
        [
            htmlkit.meta_refresh_target(h, b)
            for h, b in zip(html, base_url)
        ]
    )


@pandas_udf(T.BooleanType())
def cookie_banner_udf(html: pd.Series) -> pd.Series:
    """M5 AcceptCookies keyword detection (AcceptCookies.py:19-25,86-110)."""
    return html.map(htmlkit.detect_cookie_banner)


# --- text UDFs (X5, X6, training-data ops) --------------------------------

@pandas_udf(T.StringType())
def tokenize_udf(text: pd.Series) -> pd.Series:
    """X5 tokenize (utils.py:230-251)."""
    return text.map(lambda t: textkit.tokenize(t) if t is not None else None)


@pandas_udf(T.MapType(T.StringType(), T.StringType()))
def decode_udf(text: pd.Series) -> pd.Series:
    """X6 multi-codec decode (utils.py:253-314)."""
    return text.map(lambda t: textkit.decode(t) if t is not None else None)


@pandas_udf(T.StringType())
def detect_lang_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: textkit.detect_lang(t) if t is not None else None)


@pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    # two's-complement into signed int64 for a Spark LongType column
    def f(t):
        if t is None:
            return None
        v = textkit.simhash64(t.split())
        return v - (1 << 64) if v >= (1 << 63) else v

    return text.map(f)


@pandas_udf(T.ArrayType(T.LongType()))
def winnow_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: textkit.winnow_fingerprint(t) if t is not None else None)


@pandas_udf(T.BinaryType())
def decompress_udf(data: pd.Series) -> pd.Series:
    """X8 decompress — the reference stubs this (utils.py:337-339);
    ours handles zlib/gzip/raw-deflate."""
    return data.map(lambda b: textkit.decompress(bytes(b)) if b is not None else None)


@pandas_udf(T.BinaryType())
def zlib_compress_udf(data: pd.Series) -> pd.Series:
    """Deterministic zlib compress (level 6) — test/fixture helper for
    the decompress path."""
    import zlib

    return data.map(lambda b: zlib.compress(bytes(b), 6) if b is not None else None)


# --- JVM-side helpers (kept out of Python on purpose) ----------------------

def det_shuffle_key(col, seed: str):
    """Deterministic pseudo-shuffle key: md5(seed || url) hex prefix.

    Replaces the reference's unseeded random.shuffle
    (modules/CollectUrls.py:122-127) with a seeded, reproducible order
    (SURVEY.md §7). JVM built-in md5 — no Python roundtrip; identical
    value computable in DuckDB (md5()) and in the parity simulator
    (hashlib.md5)."""
    return F.substring(F.md5(F.concat(F.lit(seed), col)), 1, 16)


def host_bucket(col, buckets: int):
    """Stable host -> bucket id for host-hash partitioning (north rule).
    xxhash64 is a JVM built-in; pmod keeps it non-negative."""
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")
