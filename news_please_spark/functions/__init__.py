from news_please_spark.functions.urls import (  # noqa: F401
    canonical_host,
    canonical_url,
    url_host,
    url_path,
)
