"""URL / domain canonicalization (training-data pipeline ops).

Web-crawl corpora key almost everything on URLs — per-domain dedup
rates, domain-level mixture weights, URL-keyed incremental ingestion —
and raw crawl URLs arrive in dozens of spellings of the same resource.
Canonicalization folds those spellings together BEFORE any URL-keyed
join or groupBy, so 'HTTPS://WWW.Example.com:443/a?utm_source=x' and
'https://example.com/a' land on the same key.

Everything here is a pure narrow Column expression (regexp chains —
JVM-side, codegen-friendly, no UDF, no shuffle): canonicalization cost
is absorbed into whatever scan produces the column. The regex subset is
RE2-safe (no lookaround), so a DuckDB/RE2 oracle can replicate every
step; replacement backrefs are ``$1`` in Spark and ``\\1`` in DuckDB.

The rule set is the common core of public URL-normalization practice
(RFC 3986 §6 syntax-based normalization + the usual crawl-pipeline
extras): strip fragment, drop utm_* tracking params, lowercase scheme
and host, strip a leading ``www.``, drop scheme-default ports
(443/https, 80/http), and trim a trailing slash. Path case and
non-utm query params are preserved — they are semantically significant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL (see module docstring for the rule set).

    The URL is PARSED into (scheme, hostport, path, query) before any
    rule fires, so each rule touches only the component it belongs to:
    utm removal sees the query alone (a literal ``utm_x=v`` inside a
    path survives), case folding sees scheme+host alone (path case is
    significant), the trailing slash is trimmed from the path alone
    (so ``/a/?id=1`` canonicalizes like ``/a?id=1``). utm params are
    removed together with their leading ``?``/``&`` in one global pass
    — position-independent, any count, any case (``UTM_SOURCE`` folds
    like ``utm_source``; param VALUES keep their case) — then a leading
    ``&`` left by a removed first param is promoted back to ``?``.

    Idempotence is an invariant, not an accident: repeated prefixes and
    slashes collapse in ONE pass (``^(www\\.)+`` and ``/+$``), so
    ``www.www.example.com/a//`` lands on the same key whether it is
    canonicalized once or twice — required for canonical URLs used as
    JOIN/upsert keys (ADVICE r6: the single-strip form re-moved on a
    second pass). Property-tested in tests/test_properties.py."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    tail = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.regexp_replace(tail, r"^[^?]*", "")
    query = F.regexp_replace(query, r"[?&][uU][tT][mM]_[A-Za-z]+=[^&]*", "")
    query = F.regexp_replace(query, r"^&", "?")
    host = F.regexp_replace(F.lower(hostport), r"^(www\.)+", "")
    host = (
        F.when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .otherwise(host)
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.regexp_replace(path, r"/+$", ""),
        query,
    )


def url_domain(canon_url: Column) -> Column:
    """Host of an already-canonicalized URL, minus any remaining
    (non-default) port — the per-domain grouping key for dedup rates
    and mixture weighting."""
    host = F.regexp_extract(canon_url, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    return F.regexp_replace(host, r":[0-9]+$", "")
