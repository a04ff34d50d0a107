"""DomainResolver — resolve domains to IPs.

Reference: /root/reference/logprep/processor/domain_resolver/
processor.py:72-256 (URL/domain field -> ``resolved_ip``; per-process
TTL cache, reference ``util/cache.py:7-35``) with config knobs
``timeout``, ``max_cached_domains``, ``max_caching_days``.

Spark-first: real DNS is an external side effect a 100 TB job must not
do once per event row. The scale path resolves each DISTINCT domain
exactly once per batch:

    events --(extract host)--> distinct hosts   (one shuffle, cardinality
        = distinct domains, not events)
    distinct hosts --mapInPandas--> (domain, ip) via the injected
        ``resolver`` callable, memoized per executor in a TTL+LRU cache
        sized by ``max_cached_domains``/``max_caching_days`` (mirrors
        reference util/cache.py semantics)
    events ⋈ broadcast(resolved)                (resolved side is tiny
        relative to events — broadcast, no event shuffle)

A pre-resolved snapshot table (``resolution_table``) skips the resolve
stage entirely — the recommended production shape. Without either, a
clearly-marked DETERMINISTIC STUB (sha2-derived fake IPv4) keeps
plumbing, schema, and oracle real without network access.
"""

from __future__ import annotations

import time
from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

# executor-local memo: domain -> (ip, stored_at). Survives across
# batches within one python worker, like the reference's process cache.
_EXECUTOR_CACHE: OrderedDict = OrderedDict()


def _stub_ip(col):
    """Deterministic fake IP from the domain hash (STUB, not real DNS)."""
    h = F.sha2(col.cast("string"), 256)
    octet = lambda i: F.conv(F.substring(h, i, 2), 16, 10).cast("long") % 256  # noqa: E731
    return F.concat_ws(
        ".",
        (octet(1) % 223 + 1).cast("string"),
        octet(3).cast("string"),
        octet(5).cast("string"),
        octet(7).cast("string"),
    )


def _host_col(src):
    """Hostname from a URL or bare domain value."""
    return F.regexp_extract(src.cast("string"), r"^(?:[a-z][a-z0-9+.-]*://)?([^/:?#]+)", 1)


class DomainResolver(Processor):
    rule_type = "domain_resolver"

    def __init__(
        self,
        rules=None,
        resolution_table: DataFrame | None = None,
        resolver=None,
        max_cached_domains: int = 1_000_000,
        max_caching_days: int = 90,
        timeout: float = 0.5,
        **kw,
    ):
        """``resolution_table``: (domain string, ip string) snapshot DF —
        broadcast-joined, no resolve calls at all.
        ``resolver``: callable ``domain -> ip|None`` (e.g. a real DNS
        lookup honoring ``timeout``); invoked once per DISTINCT domain,
        memoized per executor with TTL/LRU parity to reference
        util/cache.py (``max_cached_domains`` items,
        ``max_caching_days`` freshness)."""
        super().__init__(rules, **kw)
        self.resolution_table = resolution_table
        self.resolver = resolver
        self.max_cached_domains = max_cached_domains
        self.max_caching_days = max_caching_days
        self.timeout = timeout

    def _resolved_frame(self, df: DataFrame, host) -> DataFrame:
        """(domain, ip) frame: one resolver call per distinct domain."""
        import pandas as pd  # noqa: F401 — worker-side dependency

        resolver = self.resolver
        max_items = self.max_cached_domains
        ttl_s = self.max_caching_days * 86400.0
        # cache entries are namespaced per resolver identity so two
        # resolvers in one worker never serve each other's results
        ns = f"{getattr(resolver, '__module__', '')}.{getattr(resolver, '__qualname__', 'resolver')}"

        def resolve_batches(iterator):
            import pandas as pd

            cache = _EXECUTOR_CACHE
            for pdf in iterator:
                ips = []
                for domain in pdf["__dr_domain"]:
                    key = (ns, domain)
                    now = time.monotonic()
                    hit = cache.get(key)
                    if hit is not None and now - hit[1] <= ttl_s:
                        cache.move_to_end(key)
                        ips.append(hit[0])
                        continue
                    try:
                        ip = resolver(domain)
                    except Exception:
                        ip = None  # reference: timeout/error -> no enrich
                    cache[key] = (ip, now)
                    cache.move_to_end(key)
                    while len(cache) > max_items:
                        cache.popitem(last=False)
                    ips.append(ip)
                yield pd.DataFrame({"__dr_domain": pdf["__dr_domain"], "__dr_ip": ips})

        distinct = df.select(host.alias("__dr_domain")).where(
            F.col("__dr_domain") != ""
        ).distinct()
        return distinct.mapInPandas(
            resolve_batches, "__dr_domain string, __dr_ip string"
        )

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        source = cfg["source_fields"][0]
        src = fld.get_field(df, source)
        if src is None:
            return df
        target = cfg.get("target_field", "resolved_ip")
        host = _host_col(src)
        lookup = None
        if self.resolution_table is not None:
            lookup = self.resolution_table.select(
                F.col("domain").alias("__dr_domain"), F.col("ip").alias("__dr_ip")
            )
        elif self.resolver is not None:
            lookup = self._resolved_frame(df, host)
        if lookup is not None:
            # resolved side is bounded by distinct-domain cardinality —
            # broadcast so the event stream never shuffles
            df = df.join(broadcast(lookup), on=host == F.col("__dr_domain"), how="left")
            df = self.set_when(df, target, cond, F.col("__dr_ip"))
            return df.drop("__dr_domain", "__dr_ip")
        return self.set_when(df, target, cond, _stub_ip(host))
