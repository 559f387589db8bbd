"""IP-pooled politeness admission.

Per-host politeness (operators/ordering.py, reference analogue:
CONCURRENT_REQUESTS_PER_DOMAIN in
/root/reference/newsplease/config/config.cfg:350-354) under-throttles
shared infrastructure: thousands of vhosts behind one CDN edge or one
shared-hosting box resolve to the SAME address, and a crawler that is
polite per-host still hammers that address with hosts × budget
requests. The standard remedy (per-IP connection caps) pools the
budget at the address: hosts sharing an IP share ONE admission quota.

This operator is pure composition: candidates join their resolved IP
(a host-grain map table — at 10^10 URLs it is the DNS-cache table the
fetch tier maintains anyway, keyed and joined on host, never URL
grain), then the skew-safe mark_top_k_per_key admits k per IP. CDN
IPs are the definitional skew case — one edge IP can carry a million
vhosts' candidates — so the salted two-phase ranking matters here
even more than per-host.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_please_spark.operators.ordering import mark_top_k_per_key


def ip_pooled_admission(
    candidates: DataFrame,
    host_ip: DataFrame,
    k: int,
    order_cols: Sequence[str] = ("prio", "url"),
    salt_buckets: int = 4,
) -> DataFrame:
    """Admit at most `k` candidates per resolved IP.

    `candidates`: host STRING + the order columns (the last one must
    be unique within an IP — the URL satisfies this). `host_ip`:
    (host, ip) — one IP per host (the resolver's choice for this
    cycle).

    Returns candidates + ip + is_admitted (0/1 BIGINT): a candidate is
    admitted iff it ranks in its IP's top-k by `order_cols`. Plan: one
    host-keyed join + the two-phase salted top-k (no full sort of a
    fat IP cell in one task).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    c = candidates.join(host_ip, "host")
    marked = mark_top_k_per_key(
        c,
        "ip",
        list(order_cols),
        k,
        salt_buckets=salt_buckets,
        salt_on=order_cols[-1],
    )
    return marked.withColumn(
        "is_admitted", F.col("_topk").cast("long")
    ).drop("_topk")
