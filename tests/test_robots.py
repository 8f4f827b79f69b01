

def test_crawl_delay_group_semantics():
    from soda_core_spark.operators.robots import parse_crawl_delay

    body = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
        "User-agent: databot\nCrawl-delay: 0.5\n"
    )
    assert parse_crawl_delay(body, "databot") == 0.5  # exact beats *
    assert parse_crawl_delay(body, "otherbot") == 2.0  # falls to *
    assert parse_crawl_delay("User-agent: *\nDisallow: /", "x") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: nope", "x") is None
    assert parse_crawl_delay(None, "x") is None


def test_crawl_delays_frame(spark):
    from soda_core_spark.operators.robots import crawl_delays

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 3"),
            ("b.com", "User-agent: *\nDisallow: /private"),
            ("c.com", None),
        ],
        ["host", "robots_txt"],
    )
    got = {r["host"]: r["crawl_delay_s"] for r in crawl_delays(robots).collect()}
    assert got == {"a.com": 3.0, "b.com": None, "c.com": None}
