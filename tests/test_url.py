"""URL canonicalization (ops/url.py): every rule, plus the dedup
property the op exists for — variant spellings of one page collapse to
one canonical string."""

from pyspark.sql import functions as F

from graphraft_spark.ops.url import canonicalize_url, url_host


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in
            df.select(canonicalize_url(F.col("url")).alias("c")).collect()]


def test_rules(spark):
    cases = {
        "HTTP://Example.COM:80/a/": "http://example.com/a",
        "https://example.com:443/": "https://example.com/",
        "https://example.com:8443/x": "https://example.com:8443/x",
        "http://example.com": "http://example.com/",
        "http://example.com/p?b=2&a=1": "http://example.com/p?a=1&b=2",
        "http://example.com/p?utm_source=x&a=1&fbclid=z":
            "http://example.com/p?a=1",
        "http://example.com/p?utm_source=x": "http://example.com/p",
        "http://example.com/p#section": "http://example.com/p",
        "http://User@example.com/p": "http://User@example.com/p",
        "not a url": None,
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_variants_collapse(spark):
    variants = [
        "http://Example.com/page/?utm_campaign=spring",
        "HTTP://example.COM:80/page#top",
        "http://example.com/page",
    ]
    assert len(set(_canon(spark, variants))) == 1


def test_url_host(spark):
    df = spark.createDataFrame(
        [("https://User:pw@Sub.Example.COM:8443/x?y#z",),
         ("http://plain.org/a",)], "url string")
    got = [r["h"] for r in
           df.select(url_host(F.col("url")).alias("h")).collect()]
    assert got == ["sub.example.com", "plain.org"]
