"""Minimal public-suffix handling.

The reference resolves eTLD+1 ("fld") via the ``tld`` PyPI package
(/root/reference/utils.py:37-41, 74-75), which embeds the Mozilla
Public Suffix List. That package is not available in this container,
so we ship a compact PSL subset sufficient for the test corpora plus
the common ICANN TLDs; a production deployment would load the full
``public_suffix_list.dat`` into :data:`SUFFIXES` at startup (it is a
plain set of strings — no code change needed).

Matching algorithm (same outcome as ``tld.get_tld``):
  * split the hostname into labels,
  * the public suffix is the *longest* suffix of labels present in
    :data:`SUFFIXES`,
  * the "fld" (first level domain, eTLD+1) is one label + the suffix,
  * a hostname that has no known suffix, or that *is* a bare suffix,
    has no fld (the reference raises TldDomainNotFound -> we return None).
"""

from __future__ import annotations

from typing import Optional

# ICANN gTLDs / ccTLDs + common multi-label suffixes + private suffixes
# that appear in crawl data. Extend by loading the full PSL.
SUFFIXES: set[str] = {
    # generic
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "pro", "io", "co", "ai", "app", "dev", "xyz", "site",
    "online", "shop", "store", "blog", "cloud", "tech", "news", "media",
    "agency", "travel", "museum", "aero", "jobs", "mobi", "tel", "asia",
    "cat", "eu",
    # country codes
    "de", "fr", "uk", "nl", "it", "es", "pt", "pl", "cz", "sk", "at",
    "ch", "be", "dk", "se", "no", "fi", "is", "ie", "ru", "ua", "by",
    "ro", "bg", "gr", "tr", "il", "sa", "ae", "in", "pk", "cn", "jp",
    "kr", "tw", "hk", "sg", "my", "th", "vn", "id", "ph", "au", "nz",
    "za", "ng", "ke", "eg", "ma", "br", "ar", "cl", "mx", "pe", "ve",
    "ca", "us", "cu", "gl", "ly", "me", "tv", "cc", "ws", "to", "fm",
    "am", "fo", "gg", "im", "je", "li", "lu", "lv", "lt", "ee", "hr",
    "hu", "si", "rs", "ba", "mk", "al", "md", "ge", "az", "kz", "uz",
    # multi-label (ICANN section)
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.hk", "com.sg", "com.tw", "com.my", "co.th", "co.in", "net.in",
    "org.in", "com.br", "net.br", "org.br", "com.ar", "com.mx",
    "com.tr", "com.sa", "co.za", "co.il", "com.eg", "com.ng",
    "com.pl", "net.pl", "org.pl", "com.ru", "com.ua", "com.de",
    # private-section suffixes common in crawl corpora
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
    "amazonaws.com", "wordpress.com", "tumblr.com", "fastly.net",
}

_MAX_SUFFIX_LABELS = max(s.count(".") for s in SUFFIXES) + 1


def public_suffix(host: str) -> Optional[str]:
    """Longest known public suffix of ``host``, or None."""
    labels = host.split(".")
    n = len(labels)
    for take in range(min(_MAX_SUFFIX_LABELS, n), 0, -1):
        cand = ".".join(labels[n - take:])
        if cand in SUFFIXES:
            return cand
    return None


def fld(host: str) -> Optional[str]:
    """eTLD+1 of ``host`` (e.g. ``sub.example.co.uk -> example.co.uk``).

    None when the host has no known suffix or is itself a bare suffix —
    mirroring ``tld.get_tld`` raising TldDomainNotFound
    (/root/reference/utils.py:37-41).
    """
    suffix = public_suffix(host)
    if suffix is None or suffix == host:
        return None
    prefix = host[: -(len(suffix) + 1)]
    if not prefix:
        return None
    return prefix.rsplit(".", 1)[-1] + "." + suffix
