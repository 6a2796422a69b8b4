"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2).

Replaces live Playwright navigation (reference crawler.py:157-187)
with a ``pages(url, warc_ts, html, text, lang)`` table the engine
joins fetch waves against. Generation is fully seeded — same seed,
same bytes — because crawl-order parity tests replay the corpus in
both the Spark engine and the pure-Python reference simulator.

Corpus properties (FIXTURES.md synthesis requirements):
* a link graph >= 3 depths per seed host (binary-tree children),
* cross-host / cross-scheme links (exercise F3-F5 filters),
* duplicate links in multiple normalized spellings (trailing slash,
  default port, fragment, ``//`` path runs — exercise X1/J1),
* one mega-host with ~mega_factor x the pages of median hosts (skew),
* dead links + a seed absent from the corpus (code -1 path,
  config-example.py:63),
* pages with login forms / cookie banners / meta http-equiv tags so
  every extraction operator is exercisable.

The ``text`` column is built *independently* of the extraction UDF:
the generator tracks which fragments are visible while it emits
markup, so ``extract_text(html) == text`` is a real invariant test.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from typing import Dict, List, Tuple

_VOCAB = (
    "spark crawl frontier wave shuffle partition bloom filter host url page "
    "link depth budget seed rank fetch parse token index batch merge scan "
    "column row join window agg sort hash key value stream state lineage "
    "metric robot polite skew salt broadcast executor core memory disk"
).split()

_VOCAB_DE = (
    "seite netz verbindung tiefe knoten pfad suche daten wert gruppe "
    "zeile spalte schlüssel speicher kern platte"
).split()

_TLDS = ["com", "org", "net", "de", "co.uk", "io"]

BASE_TS = datetime(2025, 1, 1, 0, 0, 0)


def host_name(i: int) -> str:
    return f"site{i}.{_TLDS[i % len(_TLDS)]}"


def page_url(host: str, j: int) -> str:
    return f"https://{host}" if j == 0 else f"https://{host}/p{j}"


def _text_body(rng: random.Random, lang: str) -> str:
    vocab = _VOCAB_DE if lang == "de" else _VOCAB
    n = rng.randint(20, 60)
    return " ".join(rng.choice(vocab) for _ in range(n))


def _page_html(
    rng: random.Random,
    host: str,
    j: int,
    n_pages: int,
    hosts: List[str],
    lang: str,
    branching: int = 2,
) -> Tuple[bytes, str]:
    """Build one page; returns (html_bytes, visible_text)."""
    visible: List[str] = []
    parts: List[str] = ["<!DOCTYPE html><html><head>"]

    title = f"{host} page {j}"
    parts.append(f"<title>{title}</title>")
    visible.append(title)  # <title> text is text-node content

    if j % 3 == 0:
        parts.append(
            '<meta http-equiv="content-type" content="text/html; charset=utf-8">'
        )
    if j % 9 == 0:
        parts.append('<meta http-equiv="refresh" content="3600">')
    parts.append("<style>body{margin:0}</style>")
    parts.append('<link rel="stylesheet" href="/static/site.css">')
    parts.append("</head><body>")
    parts.append(f'<img src="/img/banner{j % 4}.png" alt="">')
    if j % 2 == 0:
        parts.append('<script src="/static/app.js"></script>')
    parts.append("<script>var x = '<a href=\"/script-trap\">';</script>")
    parts.append('<!-- comment trap <a href="/comment-trap"> -->')

    body = _text_body(rng, lang)
    parts.append(f"<p>{body}</p>")
    visible.append(body)

    # --- deterministic link set -----------------------------------------
    links: List[str] = []
    children = [branching * j + i for i in range(1, branching + 1)]
    c1 = children[0]
    for ci, c in enumerate(children):
        if c < n_pages:
            # alternate relative / absolute spellings
            links.append(f"/p{c}" if ci % 2 == 0 else page_url(host, c))
    # duplicate spellings of child 1 (normalize to the same seen-key)
    if c1 < n_pages and j % 2 == 0:
        links.append(f"https://{host}:443/p{c1}/")
        links.append(f"/p{c1}#section")
        links.append(f"/x//p{c1}")  # path with // run (normalize collapses)
    # self link in a different spelling (dedup vs page self-seen)
    links.append(f"/p{j}/" if j else "/")
    # cross-host link (dropped by SAME_ETLDP1)
    links.append(page_url(hosts[(j + 1) % len(hosts)], 1))
    # cross-scheme link (dropped by SAME_SCHEME)
    links.append(f"http://{host}/p{c1 if c1 < n_pages else 0}")
    # deep-path page for robots fixtures (disallowed /p7 on even hosts)
    if j == 3:
        links.append("/p7")
    # redirect fixtures (K2/J5): stubs generated in generate_corpus
    if j % 6 == 5 and c1 < n_pages:
        links.append(f"/r{c1}")          # 1-hop meta-refresh -> /p{c1}
    if j == 2:
        links.append("/hop0")            # 2-hop chain -> /hop1 -> /p1
    if j == 6:
        links.append("/rxhost")          # cross-host redirect target
    if j % 10 == 4:
        links.append(f"/rdead{j}")       # chain dead-ends (target missing)
    # dead link (in-corpus-miss -> code -1) on every 4th page
    if j % 4 == 0:
        links.append(f"/dead{j}")
    # unparseable / blank hrefs (dropped by F2)
    links.append("")
    links.append("not a url ://")

    for href in links:
        parts.append(f'<a href="{href}"></a>')

    # --- extraction-operator fixtures ------------------------------------
    if j % 7 == 1:
        # login form: 1 password + 1 text field (FindLoginForms.py:111)
        parts.append(
            '<form action="/login" method="post">'
            '<input type="text" name="user">'
            '<input type="password" name="pass">'
            "</form>"
        )
    if j % 5 == 2:
        btn = "Accept all cookies" if lang != "de" else "Alle akzeptieren"
        parts.append(f'<div class="cookie-banner"><button>{btn}</button></div>')
        visible.append(btn)
    if j % 11 == 3:
        # a form that must NOT be detected (search; FindLoginForms IGNORE)
        parts.append(
            '<form action="/search"><input type="text" name="q">'
            "<button>Search</button></form>"
        )
        visible.append("Search")

    parts.append("</body></html>")
    html = "".join(parts)
    text = " ".join(" ".join(visible).split())
    return html.encode("utf-8"), text


def _stub_html(host: str, name: str, target: str) -> Tuple[bytes, str]:
    """Zero-delay meta-refresh redirect stub (K2/J5 fixture) — the
    in-band encoding of an HTTP redirect in a stored-page corpus."""
    title = f"{host} redirect {name}"
    html = (
        f"<!DOCTYPE html><html><head><title>{title}</title>"
        f'<meta http-equiv="refresh" content="0;url={target}">'
        f"</head><body><p>Redirecting to {target}</p></body></html>"
    )
    text = f"{title} Redirecting to {target}"
    return html.encode("utf-8"), text


def _host_redirect_stubs(
    host: str, n_pages: int, hosts: List[str], i: int, branching: int
) -> List[Tuple[str, str, str]]:
    """(stub_name, stub_url, target) triples matching the links
    emitted by _page_html's redirect fixtures."""
    stubs: List[Tuple[str, str, str]] = []
    seen_c = set()
    for j in range(n_pages):
        c1 = branching * j + 1
        if j % 6 == 5 and c1 < n_pages and c1 not in seen_c:
            seen_c.add(c1)
            stubs.append((f"r{c1}", f"https://{host}/r{c1}", f"/p{c1}"))
        if j % 10 == 4:
            stubs.append(
                (f"rdead{j}", f"https://{host}/rdead{j}", f"/missing{j}")
            )
    if n_pages > 2:
        # 2-hop chain; first hop absolute, second relative (both forms
        # of refresh targets exercised)
        stubs.append(("hop0", f"https://{host}/hop0", f"https://{host}/hop1"))
        stubs.append(("hop1", f"https://{host}/hop1", "/p1"))
    if n_pages > 6:
        other = hosts[(i + 1) % len(hosts)]
        stubs.append(("rxhost", f"https://{host}/rxhost", f"https://{other}/p1"))
    return stubs


def generate_corpus(
    seed: int = 42,
    n_hosts: int = 8,
    pages_per_host: int = 30,
    mega_factor: int = 10,
    branching: int = 2,
) -> Tuple[List[Dict], List[Dict], List[Dict]]:
    """Returns (pages, seeds, robots) record lists.

    Host 0 is the mega-host (skew fixture) with
    ``pages_per_host * mega_factor`` pages. ``branching`` is the
    per-page out-degree of same-host links (bench uses high values to
    create wide fetch waves).
    """
    import json as _json

    rng = random.Random(seed)
    hosts = [host_name(i) for i in range(n_hosts)]
    pages: List[Dict] = []
    ts = BASE_TS

    def _headers(host: str, j: int, n_bytes: int) -> str:
        """Deterministic synthetic response headers (JSON string — the
        shape the reference persists per fetch, SaveURL.py:71-72; real
        corpora carry these in WARC/WAT metadata)."""
        return _json.dumps(
            {
                "content-type": "text/html; charset=utf-8",
                "server": ["nginx", "apache", "caddy"][j % 3],
                "content-length": str(n_bytes),
                "x-host": host,
            },
            separators=(",", ":"),
        )

    for i, host in enumerate(hosts):
        n_pages = pages_per_host * (mega_factor if i == 0 else 1)
        lang = "de" if i % 3 == 2 else "en"
        for j in range(n_pages):
            html, text = _page_html(rng, host, j, n_pages, hosts, lang, branching)
            pages.append(
                {
                    "url": page_url(host, j),
                    "warc_ts": ts,
                    "html": html,
                    "text": text,
                    "lang": lang,
                    "headers": _headers(host, j, len(html)),
                }
            )
            ts += timedelta(seconds=1)
        for _name, stub_url, target in _host_redirect_stubs(
            host, n_pages, hosts, i, branching
        ):
            s_html, s_text = _stub_html(host, _name, target)
            pages.append(
                {
                    "url": stub_url,
                    "warc_ts": ts,
                    "html": s_html,
                    "text": s_text,
                    "lang": lang,
                }
            )
            ts += timedelta(seconds=1)

    seeds: List[Dict] = []
    for i, host in enumerate(hosts):
        # mix of spellings (add_tasks_tranco.py:19-20 scheme defaulting)
        url = host if i % 2 == 0 else f"https://{host}"
        seeds.append({"rank": i + 1, "url": url})
    # a seed whose landing page is NOT in the corpus -> code -1
    seeds.append({"rank": n_hosts + 1, "url": f"https://missing{seed}.com"})
    # an unparseable seed (unknown TLD -> skipped, add_tasks_tranco.py:22-24)
    seeds.append({"rank": n_hosts + 2, "url": "bogus.invalidtld"})

    robots: List[Dict] = []
    for i, host in enumerate(hosts):
        if i % 2 == 0:
            rules = "User-agent: *\nDisallow: /p7\nCrawl-delay: 2\n"
            robots.append(
                {"host": host, "rules": rules, "crawl_delay": 2.0}
            )
            # robots.txt is ALSO a page of the corpus (a real crawl
            # archive stores it like any other fetch): the engine can
            # derive the robots table from the corpus alone
            # (sources.robots.derive_robots) instead of a side table
            pages.append(
                {
                    "url": f"https://{host}/robots.txt",
                    "warc_ts": ts,
                    "html": rules.encode("utf-8"),
                    "text": " ".join(rules.split()),
                    "lang": "en",
                }
            )
            ts += timedelta(seconds=1)
    return pages, seeds, robots


# --- parquet writers (pyarrow; usable without a SparkSession) -------------

def write_corpus(
    out_dir: str,
    seed: int = 42,
    n_hosts: int = 8,
    pages_per_host: int = 30,
    mega_factor: int = 10,
    branching: int = 2,
) -> Tuple[str, str, str]:
    import pathlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pages, seeds, robots = generate_corpus(
        seed, n_hosts, pages_per_host, mega_factor, branching
    )

    pages_tbl = pa.Table.from_pylist(
        pages,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
                # nullable: redirect stubs / robots pages carry none —
                # the engine propagates whatever the corpus provides
                ("headers", pa.string()),
            ]
        ),
    )
    seeds_tbl = pa.Table.from_pylist(
        seeds, schema=pa.schema([("rank", pa.int32()), ("url", pa.string())])
    )
    robots_tbl = pa.Table.from_pylist(
        robots,
        schema=pa.schema(
            [("host", pa.string()), ("rules", pa.string()), ("crawl_delay", pa.float64())]
        ),
    )
    # many files + small row groups: Spark parallelizes parquet scans
    # at file/row-group granularity — a single 1M-row-group file would
    # serialize every downstream UDF stage onto one task. Real corpora
    # are thousands of WARC-derived files; mirror that layout.
    pages_dir = out / "pages.parquet"
    pages_dir.mkdir(exist_ok=True)
    n_files = max(1, min(64, len(pages) // 1500))
    step = -(-len(pages) // n_files)
    for i in range(n_files):
        chunk = pages_tbl.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(
                chunk, pages_dir / f"part-{i:04d}.parquet", row_group_size=512
            )
    pq.write_table(seeds_tbl, out / "seeds.parquet")
    pq.write_table(robots_tbl, out / "robots.parquet")
    return (
        str(out / "pages.parquet"),
        str(out / "seeds.parquet"),
        str(out / "robots.parquet"),
    )
