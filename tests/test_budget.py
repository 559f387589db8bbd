"""allocate_budget: largest-remainder apportionment vs a pure-Python
oracle — exact-sum, within-1-of-proportion, zero/negative scores,
budget smaller than host count, determinism under repartition."""

from __future__ import annotations

from news_please_spark.operators.ordering import allocate_budget


def _py_allocate(scores: dict[str, int], budget: int) -> dict[str, int]:
    clamped = {h: max(0, s) for h, s in scores.items()}
    total = sum(clamped.values())
    if total == 0:
        return {h: 0 for h in scores}
    base = {h: budget * s // total for h, s in clamped.items()}
    rem = {h: budget * s % total for h, s in clamped.items()}
    leftover = budget - sum(base.values())
    order = sorted(
        (h for h in clamped if clamped[h] > 0), key=lambda h: (-rem[h], h)
    )
    for h in order[:leftover]:
        base[h] += 1
    return base


def _run(spark, scores, budget):
    df = spark.createDataFrame(list(scores.items()), "host string, score long")
    out = allocate_budget(df, budget)
    return {r.host: r.budget for r in out.collect()}


def test_allocate_budget_matches_oracle_and_sums_exactly(spark):
    scores = {f"h{i}": (i * 37 + 11) % 101 for i in range(25)}
    scores["h3"] = 0
    scores["h7"] = -5  # clamped, gets 0
    for budget in (1000, 17, 3):
        got = _run(spark, scores, budget)
        want = _py_allocate(scores, budget)
        assert got == want, budget
        assert sum(got.values()) == budget
        # every quota within 1 of the exact proportion
        total = sum(max(0, s) for s in scores.values())
        for h, b in got.items():
            exact = budget * max(0, scores[h]) / total
            assert abs(b - exact) <= 1, (h, b, exact)
    assert got["h3"] == 0 and got["h7"] == 0


def test_allocate_budget_partition_invariant(spark):
    scores = {f"s{i:02d}": i for i in range(40)}
    df = spark.createDataFrame(list(scores.items()), "host string, score long")
    a = {r.host: r.budget for r in allocate_budget(df, 101).collect()}
    b = {
        r.host: r.budget
        for r in allocate_budget(df.repartition(13), 101).collect()
    }
    assert a == b == _py_allocate(scores, 101)
