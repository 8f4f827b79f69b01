"""Golden-decision regression pin: absolute keep/drop + scrubbed-text
bytes for a committed 60-doc corpus.

The oracle-parity and python-twin tests verify the ENGINE against
independent recomputations — but both sides would move together if the
rules or the generator drifted. This fixture pins the absolute
decisions as committed data: any future change to a rule threshold, the
scrub table, tokenization, or webtext_gen that flips one document's
keep bit or one scrubbed byte fails here and must be an explicit,
reviewed fixture update (the commit diff shows exactly which documents
flipped)."""

import hashlib
import json
import os

from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline
from soda_core_spark.sources.webtext_gen import write_web_pages_parquet

FIXTURE = os.path.join(os.path.dirname(__file__),
                       "fixtures_golden_decisions.json")


def test_golden_decisions(spark, tmp_path):
    with open(FIXTURE) as fh:
        golden = json.load(fh)
    path = write_web_pages_parquet(
        str(tmp_path / "golden"), golden["n"], seed=golden["seed"]
    )
    ann = QualityFilterPipeline().annotate(spark.read.parquet(path))
    got = {
        r["url"]: (bool(r["keep"]),
                   hashlib.md5((r["text_scrubbed"] or "").encode()).hexdigest())
        for r in ann.select("url", "keep", "text_scrubbed").collect()
    }
    assert len(got) == golden["n"]
    flips = [
        (g["url"], got[g["url"]], (g["keep"], g["scrubbed_md5"]))
        for g in golden["rows"]
        if got[g["url"]] != (g["keep"], g["scrubbed_md5"])
    ]
    assert not flips, f"{len(flips)} documents drifted; first: {flips[0]}"
    assert sum(k for k, _ in got.values()) == sum(
        g["keep"] for g in golden["rows"]
    )
