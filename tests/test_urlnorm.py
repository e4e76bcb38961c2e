"""URL canonicalization rules (functions/urlnorm.py)."""

from pyspark.sql import functions as F

from connectors_spark.functions.urlnorm import canonical_url_col


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    rows = (df.select("i", canonical_url_col(F.col("url")).alias("c"))
            .orderBy("i").collect())
    return [(r.c.canonical_url, r.c.host) for r in rows]


def test_canonical_rules(spark):
    got = _canon(spark, [
        "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
        "https://example.com:443/",
        "http://example.com",
        "http://example.com/a?fbclid=1&gclid=2&ref=x&utm_campaign=y",
        "http://example.com/a?z=1&a=2&a=1",
        "https://example.com:8443/x",
        "not a url",
    ])
    assert got[0] == ("http://example.com/a/b?a=1&b=2", "example.com")
    assert got[1] == ("https://example.com", "example.com")
    assert got[2] == ("http://example.com", "example.com")
    # all params tracking -> no '?'
    assert got[3] == ("http://example.com/a", "example.com")
    # bytewise param sort, duplicates preserved
    assert got[4] == ("http://example.com/a?a=1&a=2&z=1", "example.com")
    # non-default port survives
    assert got[5] == ("https://example.com:8443/x", "example.com:8443")
    # no scheme -> NULLs
    assert got[6] == (None, None)


def test_canonical_idempotent(spark):
    urls = ["HTTP://WWW.Example.COM:80/a/?b=2&a=1&utm_x=1#f",
            "https://Sub.Example.com/p/q?x=1"]
    once = [c for c, _ in _canon(spark, urls)]
    twice = [c for c, _ in _canon(spark, once)]
    assert once == twice
