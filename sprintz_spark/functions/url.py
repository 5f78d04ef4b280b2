"""URL column expressions for crawl-corpus analytics.

All pure Column expressions (JVM-side, whole-stage-codegen — no Python
in the hot path), designed for the pages/url surface of the input_hint
schema. Two users:

  * ``host_of`` — registrable host (eTLD+1) for per-site rollups:
    longest-suffix match against a bundled public-suffix-list snapshot
    (functions/psl_snapshot.py), so ``a.shop.co.uk`` rolls up to
    ``shop.co.uk``, not ``co.uk``. ``Column.isin`` over the rule set
    compiles to a JVM ``InSet`` — flat-cost hash lookup inside
    whole-stage codegen, which is why the full ~9k-rule PSL drops in
    with zero plan change.
  * ``canonicalize`` — crawl-frontier URL canonicalization: lowercase
    the scheme://host head, drop the fragment, strip tracking params
    (``utm_*``), drop an emptied ``?``. Frontier dedup and re-crawl
    scheduling key on this canonical form.

Reference parity: the reference engine has no URL surface; this belongs
to the webtext additions (SURVEY §2) next to lang-id/quality/tokens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def registrable_host(host: Column) -> Column:
    """eTLD+1 of a (possibly mixed-case) hostname: longest matching
    public suffix from the bundled PSL snapshot, plus one label. When no
    multi-label rule matches, the last two labels — the PSL's default
    ``*`` rule, which also subsumes the old ``www.``-strip heuristic
    (``www.example.org`` -> ``example.org``). ``substring_index`` with a
    negative count returns the whole string when the host has fewer
    labels than asked, so bare/short hosts fall through unharmed; the
    DuckDB oracle mirrors that with last-k-label regexes + coalesce."""
    from sprintz_spark.functions.psl_snapshot import (
        THREE_LABEL_SUFFIXES,
        TWO_LABEL_SUFFIXES,
    )

    h = F.lower(host)
    last2 = F.substring_index(h, ".", -2)
    last3 = F.substring_index(h, ".", -3)
    last4 = F.substring_index(h, ".", -4)
    return (
        F.when(last3.isin(*THREE_LABEL_SUFFIXES), last4)
        .when(last2.isin(*TWO_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )


def host_of(url: Column) -> Column:
    """Registrable host (eTLD+1) of a URL — see ``registrable_host``."""
    return registrable_host(F.parse_url(url, F.lit("HOST")))


def strip_query_fragment(url: Column) -> Column:
    """URL without query string or fragment (page identity for crawl
    counting)."""
    return F.regexp_extract(url, r"^[^?#]+", 0)


def canonicalize(url: Column) -> Column:
    """Crawl-frontier canonical form (see module docstring). Pure
    string-function pipeline so the oracle can mirror it exactly:
      1. drop '#fragment';
      2. remove every 'utm_*=...' QUERY PARAM — anchored at a '?'/'&'
         separator so path segments ('/utm_guide') and param values
         ('?ref=utm_email') are never touched.  Two RE2-compatible
         passes (no lookbehind, so DuckDB mirrors them verbatim): a
         run-of-utm-params followed by a kept param collapses onto its
         separator, then a trailing run drops with its separator;
      3. drop a trailing '?' or '&' left by step 2;
      4. lowercase the scheme://host head (path/query case preserved).
    """
    u = F.regexp_replace(url, r"#.*", "")
    u = F.regexp_replace(u, r"([?&])utm_[^&#]*(&utm_[^&#]*)*&", "$1")
    u = F.regexp_replace(u, r"[?&]utm_[^&#]*(&utm_[^&#]*)*$", "")
    u = F.regexp_replace(u, r"[?&]$", "")
    # (?i:) — schemes arrive in any case in real crawl data; the oracle
    # SQL mirrors the same flag (RE2 and Java regex both support it)
    head = F.regexp_extract(u, r"^((?i:https?)://[^/?#]+)", 1)
    return F.concat(F.lower(head), F.substr(u, F.length(head) + 1))
