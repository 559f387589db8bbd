"""news_please_spark — a from-scratch PySpark-native crawl-scheduler +
extraction engine with the query/data-processing capabilities of
fhamborg/news-please (reference at /root/reference, studied for semantics
only; no code copied).

Architecture (see SURVEY.md §7):
  - the URL frontier is a table, a crawl wave is a Spark job,
  - extraction is a vectorized map (Arrow pandas UDFs),
  - storage/versioning is a set-oriented MERGE,
  - URL-seen is a partitioned bloom filter + exact anti-join confirm.
"""

__version__ = "0.1.0"
