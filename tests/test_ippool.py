"""operators/ippool: IP-pooled politeness admission — pooling semantics
vs per-host, salted-rank exactness, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_please_spark.operators.ippool import ip_pooled_admission


def _world(spark):
    # 3 hosts on one CDN IP, 1 host alone; 4 candidates per host
    cands = [
        (f"h{h}", f"https://h{h}/p/{i}", h * 10 + i)
        for h in range(4)
        for i in range(4)
    ]
    host_ip = [("h0", "ip-a"), ("h1", "ip-a"), ("h2", "ip-a"), ("h3", "ip-b")]
    return (
        spark.createDataFrame(cands, "host string, url string, prio long"),
        spark.createDataFrame(host_ip, "host string, ip string"),
    )


def test_pooled_admission_caps_the_address_not_the_host(spark):
    cands, host_ip = _world(spark)
    out = ip_pooled_admission(cands, host_ip, k=5).collect()
    admitted = sorted(r.url for r in out if r.is_admitted == 1 and r.ip == "ip-a")
    # ip-a carries 12 candidates from 3 hosts but admits only 5 —
    # the 5 lowest prio values live on h0 (prios 0-3) and h1 (prio 10)
    assert admitted == [
        "https://h0/p/0", "https://h0/p/1", "https://h0/p/2",
        "https://h0/p/3", "https://h1/p/0",
    ]
    # the lone host admits min(k, its 4 candidates)
    assert sum(1 for r in out if r.ip == "ip-b" and r.is_admitted == 1) == 4
    # every candidate appears exactly once, flagged either way
    assert len(out) == 16


def test_salted_rank_bit_identical_to_plain_window(spark):
    cands, host_ip = _world(spark)
    plain = {
        (r.url): r.is_admitted
        for r in ip_pooled_admission(cands, host_ip, 3, salt_buckets=1).collect()
    }
    salted = {
        (r.url): r.is_admitted
        for r in ip_pooled_admission(cands, host_ip, 3, salt_buckets=7).collect()
    }
    assert plain == salted


def test_k_validation(spark):
    cands, host_ip = _world(spark)
    with pytest.raises(ValueError):
        ip_pooled_admission(cands, host_ip, 0)
