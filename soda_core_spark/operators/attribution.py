"""Per-rule drop attribution: which filter rule costs which documents.

Every published web-corpus pipeline reports this table (Gopher's rule
ablations, RefinedWeb's removal-rate breakdown, FineWeb's per-filter
stats): for each heuristic rule, how many documents fail it at all, how
many fail ONLY it (the docs you would win back by deleting the rule),
and how many hit it first in declared order (the cascade view a
short-circuiting filter would report). The reference's scan surfaces
per-check failed counts one check at a time (soda-core
contract_verification_result: each check carries its own metric);
attribution is the corpus-pipeline generalization — all rules, their
overlap structure, one pass.

Scale shape: the flags and the per-row fail total are pure codegen
column arithmetic; the whole table reduces through ONE partial
aggregation to a single row of 3·R+1 counters (R = rule count, a few
dozen at most), which is then unpivoted driver-free with
``inline(array(structs))``. No shuffle wider than the final 1-row
reduce, no per-rule re-scan — at 10^12 documents this costs exactly one
corpus read regardless of how many rules are audited.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rule_attribution(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Audit ``rules`` (name → TRUE-means-fail predicate, in declared
    order) over ``df``. Returns one row per rule::

        rule: string        -- rule name
        n_fail: bigint      -- documents failing the rule
        n_only_fail: bigint -- documents where it is the ONLY failing rule
        n_first_fail: bigint-- documents where it is the FIRST failing
                               rule in declared order (Σ over rules =
                               total dropped documents)
        fail_rate: double   -- n_fail / corpus size, 6dp

    ``n_only_fail`` is the marginal value of deleting the rule;
    ``n_fail - n_only_fail`` is its overlap with the rest of the pack.
    """
    if not rules:
        raise ValueError("rule_attribution needs at least one rule")
    names = list(rules)
    flags = [F.when(rules[n], 1).otherwise(0) for n in names]

    total = flags[0]
    for fl in flags[1:]:
        total = total + fl

    # sums coalesce to 0 so an EMPTY corpus reports zeros, not NULLs
    def _s(col: Column, alias: str) -> Column:
        return F.coalesce(F.sum(col), F.lit(0)).alias(alias)

    aggs = [F.count(F.lit(1)).alias("__n_docs")]
    running_earlier: Column = F.lit(0)
    for name, fl in zip(names, flags):
        aggs.append(_s(fl, f"__fail_{name}"))
        aggs.append(
            _s(F.when((fl == 1) & (total == 1), 1).otherwise(0),
               f"__only_{name}")
        )
        aggs.append(
            _s(F.when((fl == 1) & (running_earlier == 0), 1).otherwise(0),
               f"__first_{name}")
        )
        running_earlier = running_earlier + fl

    one = df.agg(*aggs)

    structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(f"__fail_{name}").cast("long").alias("n_fail"),
            F.col(f"__only_{name}").cast("long").alias("n_only_fail"),
            F.col(f"__first_{name}").cast("long").alias("n_first_fail"),
            F.round(
                F.col(f"__fail_{name}")
                / F.greatest(F.col("__n_docs"), F.lit(1)),
                6,
            ).alias("fail_rate"),
        )
        for name in names
    ]
    return one.select(F.inline(F.array(*structs)))


def rule_pack_diff(
    df: DataFrame,
    rules_a: dict[str, Column],
    rules_b: dict[str, Column],
) -> DataFrame:
    """A/B audit of two filter-rule packs over the same corpus — the
    table a pipeline upgrade review reads before v2 ships: per rule, how
    many documents fail under each version and how many FLIP
    (newly-failing = v2 regressions to re-review, newly-passing = docs
    won back). The synthetic rule ``__any__`` treats each pack's
    disjunction as one rule, so its flip columns are exactly the
    keep→drop / drop→keep document counts of the upgrade.

    Rules are matched by name; a rule absent from one pack counts as
    never-failing there (its diff row shows the full introduction /
    retirement cost). Same execution contract as
    :func:`rule_attribution`: flags are codegen arithmetic, ONE partial
    aggregation to a single counter row, ``inline`` unpivot — rule count
    never multiplies corpus passes.

    Returns one row per rule (union of pack names, declared order,
    ``__any__`` last)::

        rule, n_fail_a, n_fail_b, n_newly_fail, n_newly_pass
    """
    if not rules_a and not rules_b:
        raise ValueError("rule_pack_diff needs at least one rule")
    names = list(rules_a) + [n for n in rules_b if n not in rules_a]

    def flag(pack: dict[str, Column], n: str) -> Column:
        return F.when(pack[n], 1).otherwise(0) if n in pack else F.lit(0)

    fa = {n: flag(rules_a, n) for n in names}
    fb = {n: flag(rules_b, n) for n in names}
    any_a: Column = F.lit(0)
    for c in fa.values():
        any_a = F.greatest(any_a, c)
    any_b: Column = F.lit(0)
    for c in fb.values():
        any_b = F.greatest(any_b, c)
    fa["__any__"], fb["__any__"] = any_a, any_b

    def _s(col: Column, alias: str) -> Column:
        # empty corpus -> zeros, not NULLs
        return F.coalesce(F.sum(col), F.lit(0)).alias(alias)

    aggs = []
    for n in names + ["__any__"]:
        a, b = fa[n], fb[n]
        aggs += [
            _s(a, f"__a_{n}"),
            _s(b, f"__b_{n}"),
            _s(F.when((a == 0) & (b == 1), 1).otherwise(0), f"__nf_{n}"),
            _s(F.when((a == 1) & (b == 0), 1).otherwise(0), f"__np_{n}"),
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(n).alias("rule"),
            F.col(f"__a_{n}").cast("long").alias("n_fail_a"),
            F.col(f"__b_{n}").cast("long").alias("n_fail_b"),
            F.col(f"__nf_{n}").cast("long").alias("n_newly_fail"),
            F.col(f"__np_{n}").cast("long").alias("n_newly_pass"),
        )
        for n in names + ["__any__"]
    ]
    return one.select(F.inline(F.array(*structs)))


def decision_kappa(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Cohen's kappa between two boolean decision columns (e.g. two rule
    packs' keep flags) — chance-corrected agreement, the right summary
    when both packs keep most documents and raw agreement is inflated:
    κ = (p_o − p_e) / (1 − p_e) with p_o the observed agreement and p_e
    the agreement expected from the marginals.

    Complements :func:`rule_pack_diff` (which lists the flips): kappa is
    the one-number gate for "is pack B still measuring the same thing as
    pack A" in upgrade CI. One fused aggregate pass (count + 4 CASE
    sums — the soda fused-metrics shape), no shuffle wider than one row.
    Returns ``(n, po, pe, kappa)`` at 6 dp; NULL kappa when p_e = 1
    (both packs constant — agreement is undefined, not perfect).

    NULL policy: rows where EITHER decision column is NULL are excluded
    entirely — from ``n`` as well as the 2×2 cells — because an
    unscored document carries no agreement evidence; counting it in n
    but in no cell would deflate p_o and p_e and bias kappa."""
    a = F.col(col_a).cast("boolean")
    b = F.col(col_b).cast("boolean")
    one = F.lit(1)
    agg = df.where(a.isNotNull() & b.isNotNull()).agg(
        F.count(one).cast("long").alias("n"),
        F.sum(F.when(a & b, 1).otherwise(0)).cast("long").alias("n11"),
        F.sum(F.when(a & ~b, 1).otherwise(0)).cast("long").alias("n10"),
        F.sum(F.when(~a & b, 1).otherwise(0)).cast("long").alias("n01"),
        F.sum(F.when(~a & ~b, 1).otherwise(0)).cast("long").alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / n
    pa1 = (F.col("n11") + F.col("n10")) / n
    pb1 = (F.col("n11") + F.col("n01")) / n
    pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    kappa = F.when(pe < 1.0, (po - pe) / (1 - pe))
    return agg.select(
        F.col("n"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )


def fleiss_kappa(df: DataFrame, cols: list[str]) -> DataFrame:
    """Fleiss' kappa over m >= 2 boolean decision columns — the
    multi-rater generalization of :func:`decision_kappa`: when THREE or
    more rule packs / model versions / annotators each emit a keep flag,
    pairwise kappas don't summarize "do they measure the same thing";
    Fleiss' chance-corrected agreement over the full panel does
    (Fleiss 1971).

    Per document with votes k of m for "true":
    ``P_i = (k(k-1) + (m-k)(m-k-1)) / (m(m-1))``; κ = (P̄ − P̄_e)/(1 − P̄_e)
    with ``P̄_e = p² + (1−p)²`` from the pooled true-share p. Returns one
    row ``(n, m, p_true, p_bar, pe_bar, kappa)`` at 6 dp; NULL kappa
    when P̄_e = 1 (all raters constant — undefined, not perfect).

    NULL policy (same as :func:`decision_kappa`): a document where ANY
    rater abstains (NULL) is excluded from n and every sum — a partial
    panel carries no m-rater agreement evidence.

    One fused aggregate pass over the corpus (the soda fused-metrics
    shape): the per-row vote count k folds into Σk and ΣP_i, nothing
    wider than one row ever shuffles."""
    m = len(cols)
    if m < 2:
        raise ValueError(f"fleiss_kappa needs >= 2 columns, got {m}")
    bs = [F.col(c).cast("boolean") for c in cols]
    present = bs[0].isNotNull()
    for b in bs[1:]:
        present = present & b.isNotNull()
    k = bs[0].cast("int")
    for b in bs[1:]:
        k = k + b.cast("int")
    mm = float(m * (m - 1))
    p_i = (
        k.cast("double") * (k - 1).cast("double")
        + (F.lit(m) - k).cast("double") * (F.lit(m - 1) - k).cast("double")
    ) / F.lit(mm)
    agg = df.where(present).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(k), F.lit(0)).cast("double").alias("__sk"),
        F.coalesce(F.sum(p_i), F.lit(0.0)).alias("__sp"),
    )
    n = F.col("n").cast("double")
    p = F.col("__sk") / (n * m)
    p_bar = F.col("__sp") / n
    pe = p * p + (1 - p) * (1 - p)
    kappa = F.when(pe < 1.0, (p_bar - pe) / (1 - pe))
    return agg.select(
        "n",
        F.lit(m).alias("m"),
        F.round(p, 6).alias("p_true"),
        F.round(p_bar, 6).alias("p_bar"),
        F.round(pe, 6).alias("pe_bar"),
        F.round(kappa, 6).alias("kappa"),
    )


def rule_overlap(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Pairwise redundancy matrix for a rule pack: for every unordered
    rule pair, how much do their failure sets overlap? The
    prune-the-pack companion to :func:`rule_attribution` — that op says
    what each rule contributes ALONE (n_only_fail); this one says WHICH
    OTHER RULE eats it. Per pair::

        rule_a, rule_b: string  -- declared order, a before b
        n_a, n_b: bigint        -- each rule's failure count
        n_both: bigint          -- documents failing both
        jaccard: double         -- |A∩B| / |A∪B|, 6dp (0 when both empty)
        lift: double            -- P(both) / (P(a)·P(b)), 6dp, NULL when
                                   either rule never fires (no base rate)

    jaccard → 1 means the pair is interchangeable (delete one); lift ≫ 1
    with low jaccard means they co-fire on a shared pathology but each
    still covers distinct ground.

    Same execution contract as :func:`rule_attribution`: every flag is
    codegen integer arithmetic, ONE partial aggregation collapses the
    corpus to a single counter row (k + k(k-1)/2 + 1 sums), and
    ``inline`` unpivots pairs from that row — the pair count multiplies
    the aggregate width, never the corpus passes.
    """
    if len(rules) < 2:
        raise ValueError("rule_overlap needs at least two rules")
    names = list(rules)
    flags = {n: F.when(rules[n], 1).otherwise(0) for n in names}

    def _s(col: Column, alias: str) -> Column:
        return F.coalesce(F.sum(col), F.lit(0)).alias(alias)

    aggs = [F.count(F.lit(1)).alias("__n_docs")]
    for n in names:
        aggs.append(_s(flags[n], f"__f_{n}"))
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            aggs.append(_s(flags[a] * flags[b], f"__b_{a}__{b}"))
    one = df.agg(*aggs)

    nd = F.greatest(F.col("__n_docs"), F.lit(1)).cast("double")
    structs = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            na = F.col(f"__f_{a}").cast("long")
            nb = F.col(f"__f_{b}").cast("long")
            both = F.col(f"__b_{a}__{b}").cast("long")
            union = na + nb - both
            structs.append(
                F.struct(
                    F.lit(a).alias("rule_a"),
                    F.lit(b).alias("rule_b"),
                    na.alias("n_a"),
                    nb.alias("n_b"),
                    both.alias("n_both"),
                    F.round(
                        F.when(union > 0, both / union.cast("double"))
                        .otherwise(F.lit(0.0)),
                        6,
                    ).alias("jaccard"),
                    F.round(
                        F.when(
                            (na > 0) & (nb > 0),
                            (both.cast("double") / nd)
                            / ((na / nd) * (nb / nd)),
                        ),
                        6,
                    ).alias("lift"),
                )
            )
    return one.select(F.inline(F.array(*structs)))


#: Poisson(1) inverse-CDF thresholds c_k = P(X <= k), k = 0..7 — shared
#: verbatim with the SQL oracle so both engines draw identical weights.
#: u >= c_7 (p ~ 1e-7) clamps to weight 8.
POISSON1_CDF: tuple[float, ...] = tuple(
    __import__("math").exp(-1.0)
    * sum(1.0 / __import__("math").factorial(j) for j in range(k + 1))
    for k in range(8)
)


def _poisson1_inv(u: Column) -> Column:
    out = F.lit(8)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        out = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(out)
    return out


def poisson_bootstrap_rates(
    df: DataFrame,
    flags: dict[str, Column],
    id_col: str = "doc_id",
    replicates: int = 64,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Poisson-bootstrap standard errors and CIs for per-rule rates —
    the one-pass, any-scale bootstrap (Chamandy et al., Google 2012
    "Estimating Uncertainty for Massive Data Streams"; Kleiner et al.'s
    BLB is the heavier cousin): resampling n docs with replacement is
    approximated by giving doc i an independent Poisson(1) weight per
    replicate, so NO resample is ever materialized and the whole
    procedure is one aggregation.

    Weights are DETERMINISTIC: replicate r's weight for doc i inverts
    the Poisson(1) CDF at the md5 hash fraction of ``id:r`` — identical
    across engines, restarts and partitionings (``POISSON1_CDF`` is
    shared verbatim with the SQL twin). Replicate rates are ratio
    estimators sum(w·flag)/sum(w) (resample sizes vary by design).

    One row per flag::

        flag, n_docs: bigint
        rate: double            -- point estimate, 6 dp
        boot_se: double         -- stddev_samp over replicate rates, 6 dp
        ci_lo, ci_hi: double    -- normal-approx z-interval, clipped to
                                   [0, 1], 6 dp
        n_replicates: int

    Scale shape: the corpus scan explodes each row into ``replicates+1``
    (id, r) pairs — a generator feeding a map-side-combined aggregate,
    so the shuffle carries at most partitions × (replicates+1) partial
    rows of F+1 integer counters, never the corpus. The r = -1 row has
    weight 1 and yields the point estimate in the SAME pass (no second
    scan). All counter sums are exact integers; doubles appear only in
    the final (replicates+1)-row reduction. Cost is ``replicates`` md5
    calls per doc — sizing R trades CPU for CI resolution, 50-100 is
    standard.

    soda-core has no uncertainty surface (checks emit point metrics
    only, contract_verification_result); this is what turns a keep-rate
    into a defensible decision at 10^12 docs, where "did the rate move?"
    needs an SE, not a second full run.
    """
    if not flags:
        raise ValueError("flags must be non-empty")
    if replicates < 2:
        raise ValueError(f"replicates must be >= 2, got {replicates}")
    names = list(flags)
    base = df.select(
        F.col(id_col).cast("string").alias("__id"),
        *[
            F.when(c, F.lit(1)).otherwise(F.lit(0)).alias(f"__f_{n}")
            for n, c in flags.items()
        ],
    )
    reps = F.explode(
        F.array(*[F.lit(r) for r in range(-1, replicates)])
    ).alias("__r")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("__id"), F.col("__r"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    w = F.when(F.col("__r") < 0, F.lit(1)).otherwise(_poisson1_inv(u))
    per_rep = (
        base.select("__id", reps, *[f"__f_{n}" for n in names])
        .withColumn("__w", w)
        .groupBy("__r")
        .agg(
            F.sum("__w").cast("long").alias("__sw"),
            F.count(F.lit(1)).cast("long").alias("__n"),
            *[
                F.sum(F.col("__w") * F.col(f"__f_{n}"))
                .cast("long")
                .alias(f"__s_{n}")
                for n in names
            ],
        )
    )
    long = per_rep.select(
        "__r",
        "__sw",
        "__n",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("flag"),
                        F.col(f"__s_{n}").alias("__s"),
                    )
                    for n in names
                ]
            )
        ),
    ).withColumn(
        "__rate",
        F.when(
            F.col("__sw") > 0, F.col("__s") / F.col("__sw").cast("double")
        ),
    )
    point = long.where(F.col("__r") < 0).select(
        "flag", F.col("__n").alias("n_docs"), F.col("__rate").alias("__pt")
    )
    boots = (
        long.where(F.col("__r") >= 0)
        .groupBy("flag")
        .agg(
            F.stddev_samp("__rate").alias("__se"),
            F.count(F.lit(1)).cast("int").alias("n_replicates"),
        )
    )
    out = point.join(boots, "flag")
    lo = F.greatest(F.lit(0.0), F.col("__pt") - F.lit(z) * F.col("__se"))
    hi = F.least(F.lit(1.0), F.col("__pt") + F.lit(z) * F.col("__se"))
    return out.select(
        "flag",
        "n_docs",
        F.round("__pt", 6).alias("rate"),
        F.round("__se", 6).alias("boot_se"),
        F.round(lo, 6).alias("ci_lo"),
        F.round(hi, 6).alias("ci_hi"),
        "n_replicates",
    ).orderBy("flag")
