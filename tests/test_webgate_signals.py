"""Robots meta directives, declared-lang mismatch, and mirror-host
detection: hand-value semantics + plan shape."""

from pyspark.sql import functions as F


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


# ---------------------------------------------------------------------------
# with_robots_directives / robots_meta_gate
# ---------------------------------------------------------------------------


def test_robots_directives_semantics(spark):
    from soda_core_spark.functions.html import with_robots_directives

    rows = [
        (1, '<html><head><meta name="robots" content="noindex"/></head></html>'),
        (2, '<html><head><meta name="robots" content="nofollow"/></head></html>'),
        (3, '<html><head><meta name="robots" content="none"/></head></html>'),
        (4, '<html><head><meta name="robots" content="index, follow"/></head></html>'),
        (5, "<html><head></head><body></body></html>"),  # no meta at all
        (6, '<html><head><meta name="ROBOTS" content=" NoIndex , NOFOLLOW "/></head></html>'),
        # substring must NOT fire: directive list matching is token-exact
        (7, '<html><head><meta name="robots" content="noindexing"/></head></html>'),
        (8, None),  # NULL html -> false (signal absent, not blocked)
    ]
    out = {
        r["doc_id"]: (r["meta_noindex"], r["meta_nofollow"])
        for r in with_robots_directives(_pages(spark, rows)).collect()
    }
    assert out[1] == (True, False)
    assert out[2] == (False, True)
    assert out[3] == (True, True)  # none => both
    assert out[4] == (False, False)
    assert out[5] == (False, False)
    assert out[6] == (True, True)  # case + whitespace insensitive
    assert out[7] == (False, False)  # token-exact, no substring match
    assert out[8] == (False, False)


def test_robots_meta_gate_filters_and_drops_flags(spark):
    from soda_core_spark.functions.html import robots_meta_gate

    rows = [
        (1, '<meta name="robots" content="noindex"/>'),
        (2, '<meta name="robots" content="nofollow"/>'),
        (3, "<p>plain</p>"),
    ]
    kept = robots_meta_gate(_pages(spark, rows))
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    assert set(kept.columns) == {"doc_id", "html"}


def test_robots_directives_plan_no_shuffle_no_python(spark):
    from soda_core_spark.functions.html import with_robots_directives

    plan = with_robots_directives(
        _pages(spark, [(1, "<p>x</p>")])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# html_lang_col / with_lang_mismatch
# ---------------------------------------------------------------------------


def test_lang_mismatch_semantics(spark):
    from soda_core_spark.functions.html import with_lang_mismatch

    df = spark.createDataFrame(
        [
            (1, '<html lang="en-US"><body/></html>', "en"),
            (2, '<html lang="FR"><body/></html>', "en"),
            (3, "<html><body/></html>", "en"),  # no declaration -> NULL
            (4, '<html lang="zh-Hans"><body/></html>', "zh"),
            (5, '<html lang="de"><body/></html>', None),  # no detection
            (6, '<html lang=""><body/></html>', "en"),  # empty attr -> NULL
        ],
        "doc_id long, html string, lang string",
    )
    out = {
        r["doc_id"]: (r["declared_lang"], r["lang_mismatch"])
        for r in with_lang_mismatch(df).collect()
    }
    assert out[1] == ("en", False)  # primary subtag, case-folded
    assert out[2] == ("fr", True)
    assert out[3] == (None, None)  # signal unavailable, never fake
    assert out[4] == ("zh", False)
    assert out[5] == ("de", None)
    assert out[6] == (None, None)


def test_lang_mismatch_plan_no_shuffle_no_python(spark):
    from soda_core_spark.functions.html import with_lang_mismatch

    df = spark.createDataFrame(
        [(1, "<html/>", "en")], "doc_id long, html string, lang string"
    )
    plan = with_lang_mismatch(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# mirror_hosts
# ---------------------------------------------------------------------------


def _mirror_input(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_mirror_hosts_hand_values(spark):
    from soda_core_spark.operators.dedup import mirror_hosts

    # a.com and b.com share 3 of a.com's 4 contents (containment 3/4);
    # c.com shares nothing.
    rows = [
        ("https://a.com/1", "shared one"),
        ("https://a.com/2", "shared two"),
        ("https://a.com/3", "shared three"),
        ("https://a.com/4", "only on a"),
        ("https://b.com/x", "shared one"),
        ("https://b.com/y", "shared two"),
        ("https://b.com/z", "shared three"),
        ("https://b.com/w", "only on b"),
        ("https://b.com/v", "also only b"),
        ("https://c.com/1", "independent"),
    ]
    out = mirror_hosts(
        _mirror_input(spark, rows), min_shared=2, min_containment=0.5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host_a"], r["host_b"]) == ("a.com", "b.com")
    assert r["shared_fps"] == 3
    assert (r["n_a"], r["n_b"]) == (4, 5)
    assert r["containment"] == 0.75


def test_mirror_hosts_normalizes_and_dedups_within_host(spark):
    from soda_core_spark.operators.dedup import mirror_hosts

    # same content twice on one host counts ONCE; normalization folds
    # whitespace/case so near-identical bytes share a fingerprint.
    rows = [
        ("https://a.com/1", "Hello   World"),
        ("https://a.com/2", "hello world"),
        ("https://a.com/3", "second page"),
        ("https://b.com/1", "HELLO\tWORLD"),
        ("https://b.com/2", "second  PAGE"),
    ]
    out = mirror_hosts(
        _mirror_input(spark, rows), min_shared=2, min_containment=0.5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["shared_fps"] == 2 and r["n_a"] == 2 and r["n_b"] == 2
    assert r["containment"] == 1.0


def test_mirror_hosts_host_cap_drops_boilerplate_fp(spark):
    from soda_core_spark.operators.dedup import mirror_hosts

    # one string present on 4 hosts is boilerplate under host_cap=3:
    # it must contribute no pair evidence at all.
    rows = [(f"https://h{i}.com/1", "cookie banner text") for i in range(4)]
    rows += [
        ("https://h0.com/2", "real shared"),
        ("https://h1.com/2", "real shared"),
    ]
    out = mirror_hosts(
        _mirror_input(spark, rows),
        min_shared=1,
        min_containment=0.0,
        host_cap=3,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host_a"], r["host_b"]) == ("h0.com", "h1.com")
    assert r["shared_fps"] == 1  # the banner fp never joined


def test_mirror_hosts_null_and_unparseable_urls_ignored(spark):
    from soda_core_spark.operators.dedup import mirror_hosts

    rows = [
        (None, "shared"),
        ("not a url", "shared"),
        ("https://a.com/1", "shared"),
        ("https://b.com/1", "shared"),
        ("https://a.com/2", None),  # NULL text contributes nothing
    ]
    out = mirror_hosts(
        _mirror_input(spark, rows), min_shared=1, min_containment=0.5
    ).collect()
    assert len(out) == 1
    assert out[0]["n_a"] == 1 and out[0]["n_b"] == 1


def test_mirror_hosts_text_never_shuffles(spark):
    from soda_core_spark.operators.dedup import mirror_hosts

    df = _mirror_input(spark, [("https://a.com/1", "x" * 100)])
    plan = (
        mirror_hosts(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    # text reduces to its md5 before any Exchange: the plan's exchanges
    # carry __host/__fp/count columns only.
    import re

    for m in re.finditer(r"Exchange[^\n]*", plan):
        assert "text" not in m.group(0)
