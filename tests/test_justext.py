"""jusText block classification (operators/justext.py)."""

import re

from soda_core_spark.operators.justext import (
    ANCHOR_PATTERN,
    BAD,
    BLOCK_BOUNDARY_PATTERN,
    FRAG_TAG_PATTERN,
    GOOD,
    HTML_ENTITIES,
    LENGTH_HIGH,
    LENGTH_LOW,
    MAX_LINK_DENSITY,
    NEARGOOD,
    PRE_RULES,
    SHORT,
    STOPWORDS_HIGH,
    STOPWORDS_LOW,
    justext_blocks,
    justext_extract,
)
from soda_core_spark.functions.text import EN_STOPWORDS

# ---------------------------------------------------------------------------
# sequential reference replay (independent formulation: explicit loops,
# per-block neighbour walks — the shape of the original justext code)
# ---------------------------------------------------------------------------


def _frag_to_text(fr: str) -> str:
    t = re.sub(FRAG_TAG_PATTERN, " ", fr)
    for ent, lit in HTML_ENTITIES:
        t = t.replace(ent, lit)
    return re.sub(r" +", " ", t).strip(" ")


def _classify_cf(text: str, anchor_len: int) -> str:
    length = len(text)
    words = [w for w in re.split(r"[ \t\n\r]+", text) if w]
    swd = (
        sum(w.lower() in EN_STOPWORDS for w in words) / len(words)
        if words
        else 0.0
    )
    ld = min(1.0, anchor_len / length) if length else 0.0
    if ld > MAX_LINK_DENSITY:
        return BAD
    if "©" in text:
        return BAD
    if length < LENGTH_LOW:
        return BAD if anchor_len > 0 else SHORT
    if swd >= STOPWORDS_HIGH:
        return GOOD if length > LENGTH_HIGH else NEARGOOD
    if swd >= STOPWORDS_LOW:
        return NEARGOOD
    return BAD


def _neighbour(cf, i, inc, decided):
    j = i + inc
    while 0 <= j < len(cf):
        if cf[j] in decided:
            return cf[j]
        j += inc
    return BAD


def _replay(html: str):
    s = html
    for pat, rep in PRE_RULES:
        s = re.sub(pat, rep, s)
    # re.split returns capture-group contents as extra fields; Java's
    # split does not — neutralize the group for the replay
    split_pat = re.sub(r"\((?!\?)", "(?:", BLOCK_BOUNDARY_PATTERN)
    blocks = []
    for fr in re.split(split_pat, s):
        t = _frag_to_text(fr)
        if not t:
            continue
        anchors = " ".join(re.findall(ANCHOR_PATTERN, fr))
        blocks.append((t, len(_frag_to_text(anchors))))
    cf = [_classify_cf(t, a) for t, a in blocks]
    fin = list(cf)
    gb = (GOOD, BAD)
    ngb = (GOOD, BAD, NEARGOOD)
    for i, c in enumerate(cf):
        if c == SHORT:
            prev, nxt = _neighbour(cf, i, -1, gb), _neighbour(cf, i, 1, gb)
            if {prev, nxt} == {GOOD}:
                fin[i] = GOOD
            elif {prev, nxt} == {BAD}:
                fin[i] = BAD
            elif (prev == BAD and _neighbour(cf, i, -1, ngb) == NEARGOOD) or (
                nxt == BAD and _neighbour(cf, i, 1, ngb) == NEARGOOD
            ):
                fin[i] = GOOD
            else:
                fin[i] = BAD
        elif c == NEARGOOD:
            prev, nxt = _neighbour(cf, i, -1, gb), _neighbour(cf, i, 1, gb)
            fin[i] = BAD if (prev, nxt) == (BAD, BAD) else GOOD
    return [(i, t, c, f) for i, ((t, _), c, f) in enumerate(zip(blocks, cf, fin))]


PROSE = (
    "It was the best of times and it was the worst of times and we had "
    "everything before us while we had nothing before us and all of us "
    "were going direct to heaven while all of us were going direct the "
    "other way in short the period was so far like the present period."
)

PAGES = [
    (
        1,
        "<html><body>"
        '<div><a href="/">Home</a> <a href="/a">About us</a> '
        '<a href="/c">Contact</a></div>'
        "<p>Read on below</p>"
        f"<p>{PROSE}</p>"
        "<p>The end</p>"
        "<div>© 2026 Example Corp</div>"
        "</body></html>",
    ),
    (
        2,
        # no good block anywhere: shorts between bads stay bad
        "<html><body><p>tiny one</p>"
        '<div><a href="/x">all links here totally</a></div>'
        "<p>tiny two</p></body></html>",
    ),
    (
        3,
        # the neargood-marker rescue: a short block between a good
        # island and a bad sea, with a neargood marker on the bad side
        f"<p>{PROSE}</p><p>snippet</p><p>{PROSE[:150]}</p>"
        '<div><a href="/y">nav nav nav</a></div>',
    ),
    (4, "<html><body><script>var x=1;</script></body></html>"),  # no blocks
]


def _frame(spark):
    return spark.createDataFrame(PAGES, ["doc_id", "html"])


def test_blocks_match_sequential_replay(spark):
    got = {
        (r["doc_id"], r["pos"]): (
            r["block_text"],
            r["cf_class"],
            r["block_class"],
        )
        for r in justext_blocks(_frame(spark)).collect()
    }
    want = {}
    for doc_id, html in PAGES:
        for i, t, c, f in _replay(html):
            want[(doc_id, i)] = (t, c, f)
    assert got == want
    # and the scenarios actually exercise what they claim
    assert want[(1, 0)][1:] == (BAD, BAD)  # nav: link density
    # mixed good/bad neighbours with no neargood marker stay bad
    assert want[(1, 1)][1:] == (SHORT, BAD)
    assert want[(1, 2)][1:] == (GOOD, GOOD)  # long stopword-dense prose
    assert want[(1, 3)][1:] == (SHORT, BAD)
    assert want[(1, 4)][1:] == (BAD, BAD)  # copyright
    assert want[(2, 0)][1:] == (SHORT, BAD)  # no good island anywhere
    assert want[(3, 1)][1:] == (SHORT, GOOD)  # neargood-marker rescue
    assert want[(3, 2)][1:] == (NEARGOOD, GOOD)  # good on one side
    assert (4, 0) not in want  # script-only page yields no blocks


def test_extract_joins_good_blocks_only(spark):
    rows = {
        r["doc_id"]: r["main_text"]
        for r in justext_extract(_frame(spark)).collect()
    }
    assert rows[1] == PROSE
    assert rows[2] is None
    assert rows[3] == PROSE + "\nsnippet\n" + PROSE[:150].rstrip()
    assert rows[4] is None


def test_extract_is_shuffle_free(spark):
    plan = (
        justext_extract(_frame(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_seeded_fuzz_blocks_match_replay(spark):
    """200 seeded-random pages assembled from prose/short/nav/copyright/
    entity/nested-tag fragments — Spark HOF pipeline vs the sequential
    replay, one job."""
    import random

    rng = random.Random(7)
    frags = [
        lambda: f"<p>{PROSE}</p>",
        lambda: f"<p>{PROSE[:rng.randint(30, 160)]}</p>",
        lambda: "<p>tiny {}</p>".format(rng.randint(0, 9)),
        lambda: '<div><a href="/x">one</a> <a href="/y">two links</a></div>',
        lambda: "<div>© 2026 Corp</div>",
        lambda: "<p>ents &amp; <b>bold</b> &lt;tag&gt;</p>",
        lambda: "<script>var x = '<p>not a block</p>';</script>",
        lambda: "<li>item {}</li>".format(rng.randint(0, 99)),
        lambda: "no tags at all {}".format(rng.randint(0, 99)),
    ]
    pages = []
    for i in range(200):
        body = "".join(rng.choice(frags)() for _ in range(rng.randint(1, 7)))
        pages.append((i, f"<html><body>{body}</body></html>"))
    df = spark.createDataFrame(pages, ["doc_id", "html"])
    got = sorted(
        (r["doc_id"], r["pos"], r["block_text"], r["cf_class"],
         r["block_class"])
        for r in justext_blocks(df).collect()
    )
    want = sorted(
        (doc_id, i, t, c, f)
        for doc_id, html in pages
        for i, t, c, f in _replay(html)
    )
    assert got == want
