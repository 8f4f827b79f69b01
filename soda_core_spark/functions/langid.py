"""Language identification — a fastText-style classifier stand-in, run as a
vectorized (Arrow-batched) pandas UDF. No per-row Python UDFs: scoring is
pandas ``explode`` + ``isin`` + groupby over the whole Arrow batch
(BASELINE.json "no per-row Python").

The model: per-language stopword/function-word sets (public knowledge —
standard high-frequency word lists). Score(lang) = fraction of lowercased
tokens found in that language's set; prediction = argmax, confidence = the
winning score. Deterministic, dependency-free, and shared (as *model data*,
not inference code) with the plain-pandas oracle.

Executor lifecycle mirrors the real-fastText pattern: the model table is a
module-level constant loaded once per executor process at import, never
per batch — swap ``LANG_WORDS``/``score_batch`` for a real
``fasttext.load_model`` in production, the Spark plumbing is identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from soda_core_spark.functions.text import EN_STOPWORDS

#: frozen per-language function-word sets (model weights, in effect)
LANG_WORDS: dict[str, frozenset[str]] = {
    "en": frozenset(EN_STOPWORDS),
    "de": frozenset(
        "der die das und ist ich nicht mit ein eine zu den von sie er es im "
        "für auf des sich dem an als auch wie bei nach aus wenn aber nur "
        "noch werden wird sind war einen einem einer über so um hat haben "
        "kann man mehr schon durch ihre sein ohne".split()
    ),
    "fr": frozenset(
        "le la les de des un une et est que qui dans pour pas sur avec ne "
        "se ce il elle au aux du en par plus mais ou comme si nous vous ils "
        "sont être avoir fait tout cette ces son sa ses leur bien même "
        "aussi très".split()
    ),
    "es": frozenset(
        "el la los las de un una y es que en no se con por para su al lo "
        "como más pero sus le ya o este sí porque esta entre cuando muy sin "
        "sobre también me hasta hay donde quien desde todo nos durante "
        "todos uno les".split()
    ),
    "it": frozenset(
        "il la le di un una e che è in non si con per su come più ma lo "
        "gli del della dei delle al alla ai da nel nella questo questa "
        "sono era hanno ha anche molto dove quando perché tutto tutti "
        "loro suo sua".split()
    ),
    "nl": frozenset(
        "de het een en van in is dat op te zijn met voor niet aan er ook "
        "als bij maar om uit door over ze dit naar dan nog wel wat worden "
        "werd kan onder tussen tegen deze die heeft hebben hun meer al "
        "geen tot".split()
    ),
}

LANGS: tuple[str, ...] = tuple(sorted(LANG_WORDS))

LANGID_SCHEMA = T.StructType(
    [
        T.StructField("langid_pred", T.StringType()),
        T.StructField("langid_conf", T.DoubleType()),
    ]
)


#: token → language bitmask (bit i = membership in LANGS[i]'s set) — turns
#: per-language set probes into ONE dict map over the exploded tokens
_TOKEN_MASK: dict[str, int] = {}
for _i, _lang in enumerate(LANGS):
    for _w in LANG_WORDS[_lang]:
        _TOKEN_MASK[_w] = _TOKEN_MASK.get(_w, 0) | (1 << _i)


def score_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized batch scoring: one explode, one dict-map to language
    bitmasks, one grouped sum over all languages at once. Counts are
    exact integers — identical to per-language set membership."""
    import numpy as np

    s = texts.fillna("")
    tokens = s.str.lower().str.split()
    exploded = tokens.explode()
    valid = exploded.notna()
    masks = exploded.map(_TOKEN_MASK).fillna(0).astype(np.int64)
    per_lang = pd.DataFrame(
        {lang: (masks.values >> i) & 1 for i, lang in enumerate(LANGS)},
        index=exploded.index,
    )
    per_lang["__n"] = valid.astype(np.int64)
    agg = per_lang.groupby(level=0).sum().reindex(s.index, fill_value=0)
    n = agg.pop("__n")
    frac = agg.div(n.where(n > 0, 1.0), axis=0)
    pred = frac.idxmax(axis=1)
    conf = frac.max(axis=1)
    pred = pred.where(conf > 0.0, "und")  # no hits anywhere → undetermined
    return pd.DataFrame({"langid_pred": pred, "langid_conf": conf.astype(float)})


@pandas_udf(LANGID_SCHEMA)
def langid_udf(texts: pd.Series) -> pd.DataFrame:
    return score_batch(texts)


def with_langid(text: Column) -> dict[str, Column]:
    """Attach ``langid_pred`` / ``langid_conf`` columns for a text column —
    one struct-returning pandas UDF, split into two fields."""
    struct = langid_udf(text)
    return {
        "langid_pred": struct.getField("langid_pred"),
        "langid_conf": struct.getField("langid_conf"),
    }
